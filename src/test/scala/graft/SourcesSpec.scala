package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite with SharedSpark {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("csv round-trip preserves rows and schema") {
    val docs = Tables.documents(spark, SF).select("doc_id", "lang", "n_chars")
    val path = tmp("csv")
    Sources.writeCsv(docs, path)
    val back = Sources.readCsv(spark, path, docs.schema)
    assert(back.count() === docs.count())
    assert(back.schema === docs.schema)
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ===
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("jsonl round-trip preserves rows") {
    val docs = Tables.documents(spark, SF).select("doc_id", "text", "lang")
    val path = tmp("jsonl")
    Sources.writeJsonl(docs, path)
    val back = Sources.readJsonl(spark, path, docs.schema)
    assert(back.count() === docs.count())
  }

  test("gzip-compressed jsonl ingest: codec round-trip, .gz files on disk, splits into tasks per file") {
    // the wire format a 100 TB text corpus actually arrives in: gzip
    // JSONL. Spark's Hadoop codec path handles it transparently through
    // the SAME readJsonl entry (extension-dispatched) — pin that it
    // genuinely compresses and genuinely reads back.
    val docs = Tables.documents(spark, SF).select("doc_id", "text", "lang")
    val path = tmp("jsonlgz")
    docs.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "gzip").json(path)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.nonEmpty, "sink must write .json.gz files")
    val back = Sources.readJsonl(spark, path, docs.schema)
    assert(back.count() === docs.count())
    // content survives the codec hop (keyed compare, not just counts)
    val a = back.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2))).sortBy(_._1)
    val b = docs.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2))).sortBy(_._1)
    assert(a === b)
    // gzip is NOT splittable: each .gz file is one input partition —
    // the parallelism unit at scale is the FILE (shard your corpus into
    // many files), never byte ranges inside one
    assert(back.rdd.getNumPartitions === files.length,
      "one task per gzip file (non-splittable codec)")
  }

  test("partitioned parquet sink prunes partitions on read") {
    val docs = Tables.documents(spark, SF).select("doc_id", "lang", "source")
    val path = tmp("pq")
    Sources.writeParquet(docs, path, partitionBy = Seq("lang"))
    val back = Sources.readParquet(spark, path).filter(col("lang") === "en")
    assert(back.count() === docs.filter(col("lang") === "en").count())
    // partition pruning must reach the scan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("lang#"))
  }

  test("orc round-trip preserves rows and pushes filters into the scan") {
    val docs = Tables.documents(spark, SF).select("doc_id", "text", "lang", "n_chars")
    val path = tmp("orc")
    Sources.writeOrc(docs, path)
    val back = Sources.readOrc(spark, path)
      .filter(col("n_chars") > 100).select("doc_id", "lang")
    assert(back.count() === docs.filter(col("n_chars") > 100).count())
    // ORC gets the same pushdown/pruning treatment as parquet: the filter
    // reaches the file source and the scan reads only referenced columns
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"ORC scan must carry the pushed filter:\n$scan")
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:"),
      s"ORC scan must prune to the referenced columns:\n$scan")
  }

  test("partitioned orc sink prunes partitions on read") {
    val docs = Tables.documents(spark, SF).select("doc_id", "lang", "source")
    val path = tmp("orcp")
    Sources.writeOrc(docs, path, partitionBy = Seq("lang"))
    val back = Sources.readOrc(spark, path).filter(col("lang") === "en")
    assert(back.count() === docs.filter(col("lang") === "en").count())
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("lang#"))
  }

  /** A real minimal workbook written with the JDK zip API: shared + inline
    * strings, numbers, a boolean, a sparse row (skipped B cell), rich-text
    * runs in sharedStrings — the forms literature exports emit. */
  private def writeWorkbook(path: java.io.File, docRows: Seq[(Long, String, String)],
      sharedTitleRuns: Boolean = false): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val titles = docRows.map(_._2).distinct
    val sst = titles.map { t =>
      if (sharedTitleRuns) {
        val (a, b) = t.splitAt(math.max(1, t.length / 2))
        s"<si><r><t>$a</t></r><r><t>$b</t></r></si>"
      } else s"<si><t>$t</t></si>"
    }.mkString
    val header =
      """<row r="1">
        |<c r="A1" t="inlineStr"><is><t>doc_id</t></is></c>
        |<c r="B1" t="inlineStr"><is><t>title</t></is></c>
        |<c r="C1" t="inlineStr"><is><t>abstract</t></is></c>
        |<c r="D1" t="inlineStr"><is><t>relevant</t></is></c>
        |</row>""".stripMargin.replaceAll("\n", "")
    val body = docRows.zipWithIndex.map { case ((id, title, abs), i) =>
      val r = i + 2
      val sparse = abs.isEmpty // drop the C cell entirely for one row
      s"""<row r="$r"><c r="A$r"><v>$id</v></c>""" +
        s"""<c r="B$r" t="s"><v>${titles.indexOf(title)}</v></c>""" +
        (if (sparse) "" else s"""<c r="C$r" t="inlineStr"><is><t>$abs</t></is></c>""") +
        s"""<c r="D$r" t="b"><v>${i % 2}</v></c></row>"""
    }.mkString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="export" sheetId="1"/></sheets></workbook>""")
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0"?><sst count="${titles.size}" uniqueCount="${titles.size}">$sst</sst>""")
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$header$body</sheetData></worksheet>""")
    zos.close()
  }

  test("parquet schema evolution: mergeSchema unions generations, old rows null-fill, pushdown intact") {
    // the 100 TB ingest reality: a long-lived table accretes columns
    // across writer generations; readers must see the union schema
    // without rewriting history
    val path = tmp("evolve")
    val docs = Tables.documents(spark, SF)
    docs.select(col("doc_id"), col("lang"))
      .write.parquet(s"$path/gen=1")
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .write.parquet(s"$path/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet === Set("doc_id", "lang", "n_chars", "gen"))
    assert(merged.count() === 2 * docs.count())
    // pre-evolution rows surface the new column as null, new rows carry it
    assert(merged.filter(col("gen") === 1 && col("n_chars").isNotNull).count() === 0)
    assert(merged.filter(col("gen") === 2 && col("n_chars").isNull).count() === 0)
    // evolution must not break pushdown: a filter on a shared column
    // still reaches the scan, and the partition column prunes
    val q = merged.filter(col("gen") === 2 && col("doc_id") < 100)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]"), scan)
    assert(scan.matches("(?s).*PartitionFilters: \\[.*gen.* = 2.*"), scan)
    val expected = docs.filter(col("doc_id") < 100).count()
    assert(q.count() === expected)
  }

  test("xlsx ingest: executor-side parse into the documents schema") {
    val dir = new java.io.File(tmp("xlsx"))
    writeWorkbook(new java.io.File(dir, "export_a.xlsx"), Seq(
      (1L, "Salmonella in poultry", "a survey of detection methods"),
      (2L, "Listeria outbreaks", ""), // sparse: no abstract cell
      (3L, "Aflatoxin screening", "maize import controls")))
    writeWorkbook(new java.io.File(dir, "export_b.xlsx"), Seq(
      (4L, "Campylobacter prevalence", "broiler flocks meta-analysis")),
      sharedTitleRuns = true) // rich-text shared strings concatenate
    val df = Sources.readXlsx(spark, dir.getAbsolutePath)
    assert(df.columns.toSeq === Seq("doc_id", "title", "abstract", "relevant"))
    // all-string cells cast cleanly into a typed documents-like frame
    val typed = df.select(col("doc_id").cast("long").as("doc_id"),
      col("title"), col("abstract"), col("relevant").cast("boolean"))
    val rows = typed.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)), r.getBoolean(3))).sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "Salmonella in poultry", Some("a survey of detection methods"), false),
      (2L, "Listeria outbreaks", None, true),
      (3L, "Aflatoxin screening", Some("maize import controls"), false),
      (4L, "Campylobacter prevalence", Some("broiler flocks meta-analysis"), false)))
  }

  test("xlsx parser decodes XML entities and picks the lowest-numbered sheet") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val f = java.io.File.createTempFile("graft_ent", ".xlsx")
    f.deleteOnExit()
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // sheet10 before sheet2 in the archive AND lexicographically smaller —
    // numeric ordering must still pick sheet2
    entry("xl/worksheets/sheet10.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>wrong_sheet</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>title</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>Salt &amp; pepper &lt;2&gt; &quot;fine&quot;</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val (header, rows) = graft.sources.Xlsx.parse(new java.io.FileInputStream(f))
    assert(header === Vector("title"))
    assert(rows === Vector(Vector("""Salt & pepper <2> "fine"""")))
  }

  test("xlsx ingest fails fast on a data row wider than the header") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = new java.io.File(tmp("xlsx_ragged"))
    val f = new java.io.File(dir, "ragged.xlsx")
    val zos = new ZipOutputStream(new java.io.FileOutputStream(f))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    // 2-column header, but row 2 carries a third (C) cell: silently
    // truncating it would lose data with no signal — must raise instead
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>doc_id</t></is></c><c r="B1" t="inlineStr"><is><t>title</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="inlineStr"><is><t>ok</t></is></c><c r="C2" t="inlineStr"><is><t>orphan</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val ex = intercept[Exception] {
      Sources.readXlsx(spark, dir.getAbsolutePath).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("wider than")))
  }

  test("sql extension exposes the native vec_dot") {
    Tables.embeddings(spark, SF).createOrReplaceTempView("emb_ext_test")
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM emb_ext_test LIMIT 1")
      .collect()(0).getDouble(0)
    assert(r > 0.0)
  }

  test("sql extension exposes the native aggregates (freq_items_agg, simhash_agg)") {
    Tables.documents(spark, SF).createOrReplaceTempView("docs_ext_test")
    // the SQL form must agree with the Column-API form used by q101
    val viaSql = spark.sql(
      """SELECT freq_items_agg(token, 8) AS m FROM (
        |  SELECT explode(split(lower(text), '[^a-z0-9]+')) AS token
        |  FROM docs_ext_test WHERE doc_id < 50) _t""".stripMargin)
      .collect()(0).getMap[String, Long](0)
    assert(viaSql.nonEmpty && viaSql.size <= 8)
    val sh = spark.sql(
      """SELECT simhash_agg(
        |  CAST(conv(substr(md5(token), 1, 8), 16, 10) AS BIGINT),
        |  CAST(conv(substr(md5(token), 9, 8), 16, 10) AS BIGINT)) AS s
        |FROM (SELECT explode(split(lower(text), '[^a-z0-9]+')) AS token
        |      FROM docs_ext_test WHERE doc_id = 0) _t""".stripMargin)
      .collect()(0)
    assert(!sh.isNullAt(0))
    // k must be a literal — a column reference is a clear error
    val ex = intercept[Exception] {
      spark.sql("SELECT freq_items_agg(token, doc_id) FROM (SELECT CAST(doc_id AS STRING) AS token, CAST(doc_id AS INT) AS doc_id FROM docs_ext_test) _t").collect()
    }
    assert(ex.getMessage != null)
    // and the native tokenizer: SQL form ≡ the regex form it replaces
    val tokRows = spark.sql(
      """SELECT graft_tokens(text) AS a,
        |  regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS b
        |FROM docs_ext_test WHERE doc_id < 50""".stripMargin).collect()
    assert(tokRows.nonEmpty)
    tokRows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("binaryFile ingest: real PNG files → V2 source → real codec features") {
    import org.apache.spark.sql.functions._
    import graft.multimodal.MultiModal
    // real payload FILES on disk (the ingest seam the payload-column ops
    // start after): one genuine PNG per doc for a corpus sample
    val dir = java.nio.file.Files.createTempDirectory("graft_binsrc").toFile
    try {
      val sample = Tables.documents(spark, SF)
        .filter(col("doc_id") % 17 === 0).select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
      sample.foreach { case (id, bytes) =>
        java.nio.file.Files.write(
          new java.io.File(dir, f"doc_$id%05d.png").toPath,
          MultiModal.pngEncode(bytes))
      }
      // decoy file: the glob filter must prune it at LISTING time
      java.nio.file.Files.write(
        new java.io.File(dir, "manifest.txt").toPath, "not a png".getBytes)
      val df = sources.Sources.readBinaryFiles(
        spark, dir.getAbsolutePath, glob = Some("*.png"))
      assert(df.count() === sample.size)
      // inventory projection never needs content (V2 column pruning —
      // the plan's ReadSchema drops the payload column)
      val lens = df.select(col("path"), col("length")).collect()
        .map(r => r.getString(0).split("/doc_").last.stripSuffix(".png").toLong ->
          r.getLong(1)).toMap
      val scan = df.select("length").queryExecution.executedPlan.toString
      assert(!scan.contains("content"), s"content not pruned:\n$scan")
      // ingest → REAL ImageIO decode, features ≡ direct byte recompute
      import spark.implicits._
      val feats = df.select(col("path"), col("content"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          val codec = new MultiModal.PngCodec()
          it.map { case (p, png) =>
            val id = p.split("/doc_").last.stripSuffix(".png").toLong
            // payload length rides the file: pixels = png image minus pad
            MultiModal.pngDecodeFeatures(id, sample.get(id).map(_.length)
              .getOrElse(0), png, codec)
          }
        }.collect()
      assert(feats.length === sample.size)
      feats.foreach { f =>
        val bytes = sample(f.doc_id)
        assert(lens(f.doc_id) === MultiModal.pngEncode(bytes).length.toLong)
        val sum = bytes.map(b => (b & 0xff).toLong).sum
        val mean = if (bytes.isEmpty) 0L
          else (2L * sum * 1000000L + bytes.length) / (2L * bytes.length)
        assert(f.n_bytes === bytes.length)
        assert(f.mean_px_micros === mean, s"doc ${f.doc_id}")
      }
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
