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
    // Coalesce by SIZE, not back to defaultParallelism: with the default
    // (parallelismFirst=true) a 600 KB shuffle still fans out to 32
    // post-shuffle tasks, and per-task scheduling overhead dominates the
    // small-SF relational set (r6 VERDICT #5 — q3 spent 0.7s moving 600k
    // rows). size-first coalescing folds those to ~1 task here while the
    // 64 MB advisory target keeps 100 TB shuffles at full width — this is
    // also the Spark tuning guide's recommended production setting.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_PFIRST", "false"))
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
