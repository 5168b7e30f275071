package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
    import graft.operators.DedupOps
    import graft.text.Text.idf
    DedupOps.q100(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache(); SharedRelations.clear()

    val kept = DedupOps.keptShingles(spark, sfDir)
    t("kept") { kept.count() }
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val w = kept.groupBy(col("sh")).agg(count(lit(1)).as("dfc"))
      .crossJoin(broadcast(nDocs))
      .select(col("sh"), round(idf(col("n_docs"), col("dfc")) * 1000000L).cast("long").as("m"))
    val CosT = 0.5
    val sets = kept.join(w, "sh")
      .groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(
          (-col("m")).as("nm"), col("sh"), col("m")))).as("ord"),
        sum((col("m") * col("m")).cast(DecimalType(38, 0))).as("t2"))
      .select(col("doc_id"),
        transform(col("ord"),
          o => struct(o.getField("sh").as("sh"), o.getField("m").as("m"))).as("dims"),
        transform(col("ord"),
          o => concat(o.getField("sh"), lit(":"),
            o.getField("m").cast("string"))).as("pk"),
        col("t2").cast("double").as("n2"))
      .cache()
    t("sets build") { sets.count() }
    val cut = col("n2") * lit(1.0 - CosT * CosT) * lit(1.0 + 1e-9)
    val pState = aggregate(col("dims"),
      struct(lit(0.0).as("cum"), lit(0).as("p"), lit(0).as("i")),
      (acc, x) => {
        val m = x.getField("m").cast("double")
        val cum2 = acc.getField("cum") + m * m
        val i2 = acc.getField("i") + lit(1)
        struct(cum2.as("cum"),
          when(acc.getField("p") > 0, acc.getField("p"))
            .when(cum2 >= cut, i2).otherwise(lit(0)).as("p"),
          i2.as("i"))
      })
    val withP = sets.withColumn("p",
      when(pState.getField("p") > 0, pState.getField("p"))
        .otherwise(size(col("dims"))))
    t("avg prefix frac") {
      withP.agg(avg(col("p") / size(col("dims")))).head().getDouble(0)
    }
    val pre = withP
      .select(col("doc_id"), explode(slice(
        transform(col("dims"), d => d.getField("sh")), lit(1), col("p"))).as("sh"))
    t("pre count") { pre.count() }
    val preC = pre.cache()
    preC.count()
    t("cand join") {
      preC.select(col("doc_id").as("id_a"), col("sh"))
        .join(preC.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
        .filter(col("id_a") < col("id_b")).count()
    }
    val cand = preC.select(col("doc_id").as("id_a"), col("sh"))
      .join(preC.select(col("doc_id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    t("cand distinct") { cand.count() }
    val candC = cand.cache(); candC.count()
    val dotCol = aggregate(
      array_intersect(col("pk_a"), col("pk_b")),
      lit(0).cast(DecimalType(38, 0)),
      (acc, x) => {
        val m = substring_index(x, ":", -1).cast("long")
        acc + (m * m).cast(DecimalType(38, 0))
      })
      .cast("double")
    t("verify") {
      candC
        .join(sets.select(col("doc_id").as("id_a"),
          col("pk").as("pk_a"), col("n2").as("na2")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"),
          col("pk").as("pk_b"), col("n2").as("nb2")), "id_b")
        .withColumn("dot", dotCol)
        .withColumn("cos", col("dot") / sqrt(col("na2") * col("nb2")))
        .filter(col("cos") >= CosT).count()
    }
    spark.stop()
  }
}
