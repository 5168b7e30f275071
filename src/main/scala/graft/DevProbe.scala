package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scratch probe for stage-level timing. Not part of the
  * driver contract; contents change freely while iterating. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{EmbedOps, SimOps}
    val tv = EmbedOps.trainedEmbTable(spark, sfDir).cache()
    val n = tv.count()
    val nCells = tv.select(col("label")).distinct().count()
    println(s"corpus n=$n cells=$nCells uniform=${n / nCells}")
    // brute ground truth over trained vectors
    val trained = tv.select(col("vec_id"), col("embedding"))
    val exact = SimOps.knnBrute(trained,
        trained.filter(col("vec_id") % 50 === 0), SimOps.IdxK)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def nrm(d: DataFrame) = d.withColumn("nrm",
      graft.expressions.VectorExprs.vecNorm(col("embedding")))
    for (rounds <- Seq(4)) {
      val t0 = System.nanoTime()
      val cells = SimOps.cellsOfCmeans(SimOps.lloydCmeans(tv, rounds))
      val cellsRow = SimOps.cellsAsRow(cells)
      val cbRow = SimOps.pqCodebookFrom(cells)
      val asg = SimOps.assignToCells(nrm(tv), cellsRow).cache()
      val occ = asg.groupBy(col("cell_id")).count()
        .orderBy(col("count").desc).collect()
      val maxOcc = occ.head.getLong(1)
      val enc = SimOps.pqEncode(asg, cbRow)
        .select(col("vec_id"), col("codes"), col("embedding"), col("nrm"),
          col("cell_id").cast("int").as("cell_id")).cache()
      enc.count()
      val buildSec = (System.nanoTime() - t0) / 1e9
      val recalls = (for (nprobe <- Seq(2, 3); rr <- Seq(100, 200, 1024)) yield {
        val got = SimOps.annIndexSearch(enc,
            SimOps.probeCells(nrm(tv.filter(col("vec_id") % 50 === 0)),
              cellsRow, nprobe), cbRow, SimOps.IdxK, rr)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val rec = got.count(exact).toDouble / exact.size
        f"np$nprobe/r$rr=$rec%.3f"
      })
      println(f"rounds=$rounds maxOcc=$maxOcc (${maxOcc.toDouble * nCells / n}%.1fx uniform) " +
        s"build=${f"$buildSec%.1f"}s ${recalls.mkString(" ")} " +
        s"occ=${occ.take(6).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")}")
      // decompose the recall loss: (a) CELL loss — exact neighbors whose
      // cell is not probed; (b) shortlist loss — in-cell neighbors the
      // ADC top-r misses before the exact rerank
      val cellOf = asg.select(col("vec_id"), col("cell_id")).collect()
        .map(r => r.getLong(0) -> r.getAs[Number]("cell_id").longValue()).toMap
      Seq(1, 2, 3).foreach { nprobe =>
        val probes = SimOps.probeCells(nrm(tv.filter(col("vec_id") % 50 === 0)),
            cellsRow, nprobe)
          .select(col("vec_id"), col("cell_id")).collect()
          .groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getAs[Number]("cell_id").longValue()).toSet }
        val inCell = exact.count { case (q, nId) => probes(q).contains(cellOf(nId)) }
        println(f"  np$nprobe cell-ceiling=${inCell.toDouble / exact.size}%.3f")
      }
      asg.unpersist(); enc.unpersist()
      CheckpointRegistry.releaseAll()
    }
    spark.stop()
  }
}
