package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Typed loaders for the driver's star schema + corpus tables.
  *
  * All loaders are plain parquet scans so Catalyst can push filters and
  * prune columns into the file source (verify via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  /** Per-(session, file) memo of the resolved scan relation (r8).
    *
    * Every `spark.read.parquet(...)` call runs a ONE-TASK schema-
    * inference job (footer read on an executor) plus a file listing —
    * ~40 ms of job + ~50 ms of scheduling gap each, re-paid on every
    * table reference of every query (q3 alone pays it three times:
    * ~0.25 s of its 0.8 s wall was these jobs). The test corpora are
    * immutable per directory, so the resolved DataFrame (schema +
    * InMemoryFileIndex) is reused for the session's lifetime; Catalyst
    * still plans each query's filters/pruning against the shared
    * relation independently. Production deployments with mutating
    * inputs would key this by snapshot (or skip it) — the driver
    * contract reads fixed sf dirs. Keyed by session: a restarted
    * session never sees another session's relations. */
  private val memo =
    new scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]

  private def ld(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    memo.getOrElseUpdate((s, path), s.read.parquet(path))
  }

  def region(s: SparkSession, dir: String): DataFrame   = ld(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = ld(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = ld(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = ld(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = ld(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = ld(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = ld(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = ld(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = ld(s, dir, "embeddings")

  /** The driver has shipped events.parquet with different physical `ts`
    * types across rounds: INT64(TIMESTAMP(NANOS)) (surfaced as a raw nano
    * count under `spark.sql.legacy.parquet.nanosAsLong`) and plain
    * `timestamp[us]` with no timezone (surfaced as TIMESTAMP_NTZ, which
    * Spark won't cast to BIGINT). Normalize every variant to a session-tz
    * TimestampType — the session runs UTC and DuckDB reads the same file
    * as a naive timestamp, so all paths agree to the microsecond — keeping
    * downstream operators schema-stable regardless of the writer.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = ld(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // exact integral division: `/` on longs is double division, and ns
        // epochs (~1.7e18) exceed 2^53, so the rounded quotient can be off
        // by 1 µs vs DuckDB's truncation — `div` stays in int64
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ → TimestampType reinterprets the wall-clock in the session
        // zone (UTC) — the same instant DuckDB computes from the file
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
