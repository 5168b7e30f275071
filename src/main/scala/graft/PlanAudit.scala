package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump executed-plan shape summaries (exchange / window /
  * sort / broadcast counts) or the full formatted plan for registered
  * queries — the `.explain("formatted")` audit loop.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <qname>[,<qname>…] [full]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val full = args.length > 2 && args(2) == "full"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"=== $n ===")
      if (full) df.explain("formatted")
      else {
        val p = df.queryExecution.executedPlan.toString
        def count(re: String) = re.r.findAllIn(p).size
        println(s"  shuffle exchanges: ${count("Exchange (hash|range)partitioning")}" +
          s"  single-partition: ${count("Exchange SinglePartition")}")
        println(s"  windows: ${count("Window \\[")}  sorts: ${count("(?m)^[\\s+:-]*\\*?\\(?\\d*\\)? ?Sort \\[")}")
        println(s"  broadcast exchanges: ${count("BroadcastExchange")}" +
          s"  BNLJ: ${count("BroadcastNestedLoopJoin")}  BHJ: ${count("BroadcastHashJoin")}" +
          s"  SMJ: ${count("SortMergeJoin")}")
      }
    }
    spark.stop()
  }
}
