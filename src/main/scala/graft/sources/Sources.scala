package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tabular sources/sinks (the reference ingests literature records from
  * CSV/spreadsheet exports; at scale everything lands in parquet).
  *
  * Readers take explicit schemas — schema inference is a full extra pass
  * over the data and non-deterministic under sampling, both wrong at
  * 100 TB. Writers default to snappy parquet, optionally partitioned
  * (partition columns become directory pruning keys for downstream scans).
  *
  * Spreadsheet (.xlsx) ingest is native via [[Xlsx]] (pure JDK — Spark
  * has no built-in Excel source and this build adds no third-party
  * dependencies): one executor task per workbook file, all cells as
  * strings, headers from the first row. A production deployment
  * preferring a DataSource V2 package (`spark-excel`) keeps the same
  * explicit-schema policy.
  */
object Sources {

  /** Directory (or glob) of .xlsx workbooks → DataFrame of strings.
    *
    * Execution shape: each workbook parses whole on an EXECUTOR — the
    * driver touches only the first file's header row. `binaryFiles`
    * packs small files together (up to `spark.files.openCostInBytes`)
    * and gives large ones their own task, which is the right
    * parallelism for the format: a workbook is ≤ 2^20 rows by spec, so
    * the scale axis is file count (thousands of per-source literature
    * exports), not file size. Workbooks whose header differs from the
    * first file's fail fast rather than silently misalign columns. */
  def readXlsx(s: SparkSession, path: String): DataFrame = {
    val files = s.sparkContext.binaryFiles(path)
    val firstFile = files.keys.collect().sorted.headOption.getOrElse(
      throw new IllegalArgumentException(s"readXlsx: no files at $path"))
    val header = Xlsx.parse(
      files.filter(_._1 == firstFile).first()._2.open())._1
    require(header.nonEmpty, s"readXlsx: $firstFile has no header row")
    val ncols = header.size
    val rows = files.flatMap { case (file, pds) =>
      val (h, data) = Xlsx.parse(pds.open())
      require(h == header,
        s"readXlsx: $file header $h differs from $firstFile header $header")
      data.map { cells =>
        // fail fast, never truncate: the header-equality check catches
        // differing headers but not ragged DATA rows, and dropping
        // trailing cells would lose data without any signal
        require(cells.length <= ncols,
          s"readXlsx: $file has a ${cells.length}-cell row, wider than " +
            s"the $ncols-column header")
        Row.fromSeq(cells.map(c => if (c.isEmpty) null else c).padTo(ncols, null))
      }
    }
    s.createDataFrame(rows,
      StructType(header.map(StructField(_, StringType, nullable = true))))
  }

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

  /** ORC — the other columnar interchange format large warehouses hand
    * over; Spark's native reader gives it the same predicate-pushdown /
    * column-pruning path as parquet (proven in SourcesSpec). */
  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Directory/glob of opaque binary payload files (images, audio,
    * clips) → (path, modificationTime, length, content) via Spark's
    * built-in `binaryFile` DataSource V2 — the ingestion seam for the
    * multimodal pipeline (q56/q135/q136/q143 consume payload COLUMNS;
    * this is how payloads arrive from object storage as real files).
    * V2 source semantics carry the scale properties for free: file
    * listing is distributed, small files pack into shared tasks
    * (`spark.sql.files.maxPartitionBytes` / `openCostInBytes`), and a
    * `pathGlobFilter` option prunes by extension at listing time —
    * never read-then-filter. `length`-only projections prune `content`
    * at the scan (V2 column pruning), so inventory queries never load
    * payload bytes. */
  def readBinaryFiles(s: SparkSession, path: String,
      glob: Option[String] = None): DataFrame = {
    val r = s.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }
}
