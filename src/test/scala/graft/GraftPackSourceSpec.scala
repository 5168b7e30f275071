package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PipelineOps

/** The `graftpack` DataSource V2 connector (r14 — SURVEY spec row):
  * named-table reads over the pack artifact replacing the path-based
  * `packDir`/`GenManifest.current` convention. Pins: V2 scan node (no
  * silent V1 fallback), default lineage/current-generation resolution,
  * explicit generation time travel across publishes, lineage selection
  * (packclean / manifest lineages), partition pruning through the
  * format() read, and loud errors for a missing base option or an
  * unpublished lineage. */
class GraftPackSourceSpec extends AnyFunSuite with SharedSpark {

  private def base = PipelineOps.q165Ensure(spark, SF)

  test("format(graftpack) resolves the current generation and matches packRead") {
    val viaFormat = spark.read.format("graftpack")
      .option("base", base.getAbsolutePath).load()
      .withColumn("shard", col("shard").cast("long"))
      .select("doc_id", "chunk_id", "lang", "n_tokens", "n_units",
        "cum_units", "shard")
      .collect().map(_.toSeq).sortBy(_.toString)
    val viaHelper = PipelineOps.packRead(spark, base)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(viaFormat.nonEmpty)
    assert(viaFormat === viaHelper)
  }

  test("the read is a V2 BatchScan (not a V1 fallback) and shard predicates prune partitions") {
    val seek = spark.read.format("graftpack")
      .option("base", base.getAbsolutePath).load()
      .filter(col("shard") === 0)
    val plan = seek.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"expected a V2 BatchScan node:\n$plan")
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(pf.matches(""".*PartitionFilters: \[[^\]]*shard[^\]]*0[^\]]*\].*"""),
      s"shard seek must prune partitions on the V2 scan, got: $pf")
  }

  test("explicit generation pins a read across a later publish (time travel)") {
    val genBefore = GenManifest.current(base, "pack")
    val rowsBefore = spark.read.format("graftpack")
      .option("base", base.getAbsolutePath).load().count()
    // publish a NEW generation with one shard only — the current-gen
    // read must follow it, the pinned read must not
    val oneShard = PipelineOps.packRead(spark, base)
      .filter(col("shard") === 0)
    val genAfter = PipelineOps.packWrite(spark, base, oneShard)
    try {
      assert(genAfter === genBefore + 1)
      val current = spark.read.format("graftpack")
        .option("base", base.getAbsolutePath).load()
      assert(current.count() === oneShard.count())
      val pinned = spark.read.format("graftpack")
        .option("base", base.getAbsolutePath)
        .option("generation", genBefore).load()
      assert(pinned.count() === rowsBefore)
    } finally {
      // restore the full pack as the newest generation so later suites
      // (and the standing-reuse premise) see the build's content
      PipelineOps.packWrite(spark, base,
        PipelineOps.packReadAt(spark, base, genBefore))
    }
  }

  test("lineage option selects manifest and packclean lines") {
    val mf = spark.read.format("graftpack")
      .option("base", base.getAbsolutePath)
      .option("lineage", "packmf")
      .option("generation", GenManifest.current(base, "pack"))
      .load()
    // the persisted manifest: one row per shard of the build
    assert(mf.count() ===
      PipelineOps.packRead(spark, base).select("shard").distinct().count())
  }

  test("missing base and unpublished lineage fail loudly") {
    val e1 = intercept[Exception] {
      spark.read.format("graftpack").load()
    }
    assert(e1.getMessage.contains("base"))
    val e2 = intercept[Exception] {
      spark.read.format("graftpack")
        .option("base", base.getAbsolutePath)
        .option("lineage", "nosuchlineage").load()
    }
    assert(e2.getMessage.contains("no published generation"))
  }
}
