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

  test("sql extension exposes the native vec_dot") {
    Tables.embeddings(spark, SF).createOrReplaceTempView("emb_ext_test")
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM emb_ext_test LIMIT 1")
      .collect()(0).getDouble(0)
    assert(r > 0.0)
  }
}
