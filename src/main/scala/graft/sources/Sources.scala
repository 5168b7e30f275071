package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Tabular sources/sinks (the reference ingests literature records from
  * CSV/spreadsheet exports; at scale everything lands in parquet).
  *
  * Readers take explicit schemas — schema inference is a full extra pass
  * over the data and non-deterministic under sampling, both wrong at
  * 100 TB. Writers default to snappy parquet, optionally partitioned
  * (partition columns become directory pruning keys for downstream scans).
  *
  * KNOWN GAP — native spreadsheet (.xlsx) ingest: the reference also
  * accepts Excel exports. Spark has no built-in Excel source and this
  * build intentionally adds no third-party dependencies (the usual
  * answer is the `com.crealytics:spark-excel` DataSource V2 package, or
  * a one-time export to CSV — which every reference-manager that emits
  * .xlsx also offers). `readCsv` with an explicit schema + delimiter
  * covers the exported form; a production deployment that must read
  * .xlsx directly should register spark-excel and the call becomes
  * `spark.read.format("excel")` with the same explicit-schema policy.
  */
object Sources {

  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
