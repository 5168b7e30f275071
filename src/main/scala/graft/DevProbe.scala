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
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def t(label: String)(f: => Any): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f  jobs=${jobs.get() - j0}  ($r)")
    }
    def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    def v0(dir: String): DataFrame = graft.operators.Relational.q3(spark, dir)
    // C: group on the raw date, format after the aggregation
    def vC(dir: String): DataFrame = {
      val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("date"))
      val li = Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") > lit("1996-01-01").cast("date"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }
    val variants: Seq[(String, String => DataFrame)] =
      Seq("v0-cur" -> v0 _, "vC-datekey" -> vC _)
    variants.foreach { case (_, f) =>
      (1 to 2).foreach(_ => f("/root/testdata/sf0.001").count()) }
    spark.catalog.clearCache(); SharedRelations.clear()
    (1 to 6).foreach { i =>
      variants.foreach { case (n, f) => t(s"$n $i") { f(sfDir).count() } }
    }
    val h0 = v0(sfDir).collect().map(_.toString).toList
    println("same C: " + (vC(sfDir).collect().map(_.toString).toList == h0))
    spark.stop()
  }
}
