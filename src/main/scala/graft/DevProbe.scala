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
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f  ($r)")
    }
    import graft.operators.{DedupOps, GraphOps}
    GraphOps.q126(spark, "/root/testdata/sf0.001").count() // warm + artifact(sf0.001)
    spark.catalog.clearCache(); SharedRelations.clear(); CheckpointRegistry.releaseAll()

    t("pairs50 build") { DedupOps.pairs50(spark, sfDir).count() }
    t("q126 #1 (artifact build + probe)") { GraphOps.q126(spark, sfDir).count() }
    CheckpointRegistry.releaseAll()
    val pairs = DedupOps.pairs50(spark, sfDir).select(col("id_a"), col("id_b"))
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
    val isDelta = (col("id_a") + col("id_b")) % GraphOps.DeltaSplitMod === 0
    val hist = GraphOps.q126Hist(spark)
    t("artifact t=3 partition read") { hist.filter(col("t") === 3).count() }
    t("artifact t=0 anti join") {
      docs.join(hist.filter(col("t") === 0).select(col("doc_id")),
        Seq("doc_id"), "left_anti").count()
    }
    for (it <- Seq(0, 1, 2, 4, 8)) {
      t(s"pagerankDelta iters=$it") {
        GraphOps.pagerankDelta(hist, pairs.filter(!isDelta),
          pairs.filter(isDelta), docs, iters = it).count()
      }
      CheckpointRegistry.releaseAll()
    }
    spark.stop()
  }
}
