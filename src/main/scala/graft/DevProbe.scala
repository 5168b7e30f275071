package graft
import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe for stage-level timing. Not part of the
  * driver contract; contents change freely while iterating. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      "q162_epoch_order,q191_batch_schedule,q200_epoch_continuity")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val byName = SparkEntry.allOps.map(o => o.name -> o).toMap
    names.foreach { n =>
      val op = byName(n)
      (1 to 3).foreach { i =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val c = op.fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $n run$i: ${dt}%.3f s, jobs=${jobs.get() - j0}, rows=$c")
        CheckpointRegistry.releaseAll()
      }
    }
    spark.stop()
  }
}
