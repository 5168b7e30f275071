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
    import graft.operators.DedupOps
    DedupOps.q49(spark, "/root/testdata/sf0.001").count() // warm JIT
    spark.catalog.clearCache(); SharedRelations.clear()

    val kept = DedupOps.keptShingles(spark, sfDir)
    t("kept materialize+count") { kept.count() }
    val dfk = kept.groupBy(col("sh")).agg(count(lit(1)).as("dfk"))
    val keptSets = kept.join(dfk, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("dfk"), col("sh")))).as("ord"))
      .select(col("doc_id"),
        transform(col("ord"), o => o.getField("sh")).as("shs"))
      .withColumn("sz", size(col("shs")).cast("long"))
      .cache()
    t("keptSets build") { keptSets.count() }
    val pre = keptSets.select(col("doc_id"),
      explode(slice(col("shs"), lit(1), (col("sz") / 2 + 1).cast("int"))).as("sh"))
    t("prefix occurrences") { pre.count() }
    val preC = pre.cache()
    t("prefix cached") { preC.count() }
    t("cand join count") {
      preC.select(col("doc_id").as("id_a"), col("sh"))
        .join(preC.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b")).count()
    }
    t("cand distinct") {
      preC.select(col("doc_id").as("id_a"), col("sh"))
        .join(preC.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().count()
    }
    for (i <- 1 to 4) t(s"q49 full #$i") { DedupOps.q49(spark, sfDir).count() }
    spark.stop()
  }
}
