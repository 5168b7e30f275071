package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults.
  *
  * Tuned for the driver's local[32] harness but written for cluster use:
  * AQE (runtime re-planning, skew-join splitting, partition coalescing) on,
  * explicit shuffle parallelism instead of the 200 default, UTC everywhere.
  */
object GraftSession {
  /** Configs applied to any builder — shared by tests, Verify and Bench. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // events.parquet carries INT64(TIMESTAMP(NANOS)) which vanilla Spark
    // refuses; read as long and convert explicitly (Tables.events).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
