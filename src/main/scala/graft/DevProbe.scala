package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch probe for stage-level timing. Not part of the
  * driver contract; contents change freely while iterating. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f  ($r)")
    }
    import graft.operators.TextOps
    // warm JIT
    TextOps.q40(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache(); SharedRelations.clear()

    val docs = Tables.documents(spark, sfDir)
    t("raw text scan+len") { docs.agg(sum(length(col("text")))).head().getLong(0) }
    t("tokenize+count toks (no cache)") {
      docs.select(size(graft.text.Text.tokens(col("text"))).as("n"))
        .agg(sum(col("n"))).head().getLong(0)
    }
    val d = docs.repartition(32)
      .withColumn("toks", graft.text.Text.tokens(col("text"))).cache()
    t("tok cache build") { d.count() }
    t("explode+tf groupBy (from cache)") {
      d.select(col("doc_id"), explode(col("toks")).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1))).count()
    }
    t("dfreq countDistinct (from cache)") {
      d.select(col("doc_id"), explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(countDistinct(col("doc_id"))).count()
    }
    t("q36 build#1 (materialize its cache)") { TextOps.q36(spark, sfDir).count() }
    t("q36 cached#2") { TextOps.q36(spark, sfDir).count() }
    t("q38 #1 (q36 cached)") { TextOps.q38(spark, sfDir).count() }
    t("q38 #2") { TextOps.q38(spark, sfDir).count() }
    for (i <- 1 to 3) t(s"q40 full #$i") { TextOps.q40(spark, sfDir).count() }
    for (i <- 1 to 2) t(s"q63 full #$i") { TextOps.q63(spark, sfDir).count() }
    spark.stop()
  }
}
