package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LogisticRegression, NaiveBayes}
import org.apache.spark.ml.feature.{CountVectorizer, StringIndexer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}
import graft.text.Text

/** MLlib classification pipelines (SURVEY §2 rows 41–42) — the trained
  * counterpart of the fixed-weight scorer (q38): the reference's
  * scikit-learn classifiers re-expressed as `spark.ml` estimators, which
  * train distributed (L-BFGS treeAggregate over partitions) and predict as
  * a map-side-only transform. Rows-checked (training is float-order
  * sensitive; exact-hash oracles don't apply).
  */
object MLOps {

  // --- 41. logistic regression on embeddings ----------------------------
  def q41(s: SparkSession, dir: String): DataFrame = {
    val data = Tables.embeddings(s, dir)
      .select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        array_to_vector(col("embedding")).as("features"))
    val lr = new LogisticRegression()
      .setLabelCol("y").setFeaturesCol("features")
      .setMaxIter(25).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(data)
    model.transform(data)
      .select(col("vec_id"), col("y").cast("int").as("label_bin"),
        col("prediction").cast("int").as("pred"),
        (col("y") === col("prediction")).cast("int").as("correct"))
      .orderBy(col("vec_id"))
  }

  // --- 42. naive bayes on token counts (lang classification) ------------
  def q42(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .withColumn("toks", Text.tokens(col("text")))
    val pipe = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("lang").setOutputCol("y")
        .setStringOrderType("alphabetAsc"),
      new CountVectorizer().setInputCol("toks").setOutputCol("features")
        .setVocabSize(1 << 16),
      new NaiveBayes().setLabelCol("y").setFeaturesCol("features")
        .setSmoothing(1.0)))
    val model = pipe.fit(docs)
    model.transform(docs)
      .select(col("doc_id"), col("lang"), col("y").cast("int").as("label_idx"),
        col("prediction").cast("int").as("pred_idx"),
        (col("y") === col("prediction")).cast("int").as("correct"))
      .orderBy(col("doc_id"))
  }

  val ops: Seq[Op] = Seq(
    Op("q41_mllib_logreg", q41, None),
    Op("q42_mllib_nb", q42, None),
  )
}
