package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    case class J(id: Int, sub: Long, var end: Long = 0L,
        var stages: String = "", var tasks: Int = 0)
    val log = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val rec = J(j.jobId, j.time)
        rec.stages = j.stageInfos.map(s => s.name.split("\n")(0).take(40)).mkString("|")
        rec.tasks = j.stageInfos.map(_.numTasks).sum
        log.put(j.jobId, rec)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val rec = log.get(j.jobId); if (rec != null) rec.end = j.time
      }
    })
    val ops = Seq(
      "q146" -> ((d: String) => graft.operators.MLOps.q146(spark, d)))
    ops.foreach { case (_, f) => (1 to 2).foreach(_ => f("/root/testdata/sf0.001").count()) }
    spark.catalog.clearCache(); SharedRelations.clear()
    ops.foreach { case (name, f) =>
      (1 to 3).foreach { i =>
        log.clear()
        val t0 = System.nanoTime()
        f(sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"RUN $name $i wall=$wall%.3f")
        if (i == 3) {
          import scala.jdk.CollectionConverters._
          val js = log.values.asScala.toSeq.sortBy(_.sub)
          var prevEnd = 0L
          js.foreach { j =>
            val gap = if (prevEnd == 0) 0 else j.sub - prevEnd
            prevEnd = math.max(prevEnd, j.end)
            println(f"  job ${j.id}%3d dur=${(j.end - j.sub) / 1e3}%6.3f gap=${gap / 1e3}%6.3f tasks=${j.tasks} [${j.stages.take(90)}]")
          }
        }
      }
      spark.catalog.clearCache(); SharedRelations.clear()
    }
    spark.stop()
  }
}
