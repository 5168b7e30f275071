package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Op, Tables}

/** Iterative graph analytics on the near-dup graph (SURVEY §2 r4, q95).
  *
  * PageRank generalizes q70/q74's min-label fixpoint from "which
  * component" to "how central": on the duplication graph a high-rank
  * document is template/boilerplate material whose near-copies are
  * themselves heavily duplicated — the doc a curation team inspects
  * first, and a better keeper-priority signal than raw degree (q94)
  * because it discounts edges to already-redundant neighbors.
  *
  * Numerics are EXACT integer micros so the iteration is replayable
  * cross-engine: ranks start at 10⁶, each round computes
  * `r' = 150000 + (85 · Σ_{b∈N(a)} (r_b div deg_b)) div 100` in int64
  * (damping 0.85; per-neighbor truncating shares — both engines
  * truncate identically on non-negative operands). A FIXED 8 rounds
  * rather than a convergence test keeps the oracle expressible as 8
  * unrolled CTEs and removes the one per-round driver action the CC
  * loop needs. Isolated docs settle at (1−α) = 0.15 after round 1.
  *
  * Scale shape (per round): one equi-join of ranks onto the cached
  * symmetric edge list (shuffle keyed on the neighbor id), one
  * map-side-combined `groupBy(id_a).sum` — contribution volume is
  * edge-linear, hub fan-out is handled by partial aggregation — and one
  * left join back to the doc universe. Lineage is truncated per round
  * with `localCheckpoint` exactly like [[DedupOps.connectedComponents]]
  * (eager, one job, previous round's blocks released); final blocks go
  * to [[graft.CheckpointRegistry]] for harness-owned release. Nothing
  * driver-sized anywhere: the driver never sees ranks, only job
  * completions.
  */
object GraphOps {
  /** Damping factor ×100 (α = 0.85). */
  val Damping = 85
  /** Fixed iteration count (oracle-unrolled). */
  val Iters = 8
  /** Rank unit: integer micros. */
  val RankScale = 1000000L

  /** q95: PageRank over the verified MinHash near-dup pairs (q50),
    * isolates included via the document universe. */
  def q95(s: SparkSession, dir: String): DataFrame =
    graft.SharedRelations.getOrBuild("pr50", dir)(
      pagerank(DedupOps.pairs50(s, dir).select(col("id_a"), col("id_b")),
        Tables.documents(s, dir).select(col("doc_id"))))

  /** Integer-micros PageRank over an undirected pair set; `docs`
    * supplies the universe so isolates hold rank (1−α). */
  def pagerank(pairs: DataFrame, docs: DataFrame): DataFrame =
    pagerankFrom(docs.select(col("doc_id"), lit(RankScale).as("r")),
      pairs, docs, Iters)

  /** The iteration body, resumable from an arbitrary integer-micros rank
    * snapshot `ranks0(doc_id, r)` — because each round is a pure
    * function of the previous ranks, running k rounds, persisting the
    * micro ranks, and resuming for the remaining Iters−k rounds is
    * BIT-IDENTICAL to one straight run (GraphSpec pins it). That is the
    * operational property a 100 TB graph job needs: a rank snapshot is
    * a restart point, not a re-run — and an incremental corpus update
    * warm-starts from the previous snapshot instead of uniform ranks. */
  def pagerankFrom(ranks0: DataFrame, pairs: DataFrame, docs: DataFrame,
      iters: Int): DataFrame = {
    def blocks(df: DataFrame) = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd }
    val edges = pairs
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .cache()
    // symmetric edges: degree = out-degree = in-degree, keyed on the
    // CONTRIBUTING endpoint (id_b) to join once per round
    val deg = edges.groupBy(col("id_b")).agg(count(lit(1)).as("deg"))
    var ranks = ranks0.select(col("doc_id"), col("r"))
      .localCheckpoint()
    var prevBlocks = blocks(ranks)
    for (_ <- 1 to iters) {
      val shares = ranks
        .join(deg, ranks("doc_id") === deg("id_b"))
        .select(col("id_b"), expr("r div deg").as("share"))
      val contrib = edges.join(shares, "id_b")
        .groupBy(col("id_a")).agg(sum(col("share")).as("cin"))
      val next = docs.select(col("doc_id"))
        .join(contrib.withColumnRenamed("id_a", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cin0", coalesce(col("cin"), lit(0L)))
        .select(col("doc_id"),
          (lit((100 - Damping) * RankScale / 100) +
            expr(s"($Damping * cin0) div 100")).as("r"))
        .localCheckpoint()
      prevBlocks.foreach(_.unpersist(blocking = false))
      prevBlocks = blocks(next)
      ranks = next
    }
    edges.unpersist()
    prevBlocks.foreach(r => graft.CheckpointRegistry.register(r))
    ranks.select(col("doc_id"), (col("r") / 1000000.0).as("rank"))
      .orderBy(col("doc_id"))
  }

  /** The `prdeg, pr0..pr$Iters` CTE chain replaying [[pagerank]] over an
    * existing symmetric edge relation `edges(a, b)` — the same int64
    * formula DuckDB-side (`//` ≡ `div` on non-negative operands; SUM's
    * HUGEINT is cast back per round). Unrolled because the per-round
    * aggregation can't live inside a recursive CTE term. Shared by the
    * q95 oracle and the q97 composition. */
  def prCtesSql(edges: String, a: String, b: String): String = {
    val base = (100 - Damping) * RankScale / 100
    val head = Seq(
      s"prdeg AS (SELECT $b AS nid, COUNT(*) AS deg FROM $edges GROUP BY $b)",
      s"pr0 AS (SELECT doc_id, CAST($RankScale AS BIGINT) AS r FROM documents)")
    val iters = (1 to Iters).map { k =>
      s"""pr$k AS (
         |  SELECT d.doc_id,
         |    CAST($base + ($Damping * COALESCE(SUM(s.share), 0)) // 100 AS BIGINT) AS r
         |  FROM documents d LEFT JOIN (
         |    SELECT e.$a AS tgt, r.r // g.deg AS share
         |    FROM $edges e
         |    JOIN pr${k - 1} r ON e.$b = r.doc_id
         |    JOIN prdeg g ON e.$b = g.nid) s
         |  ON d.doc_id = s.tgt
         |  GROUP BY d.doc_id)""".stripMargin
    }
    (head ++ iters).mkString(",\n")
  }

  lazy val q95Sql: String =
    s"""WITH pairs AS (SELECT id_a, id_b FROM (${DedupOps.q50PairsSql}) _p),
       |edges AS (SELECT id_a, id_b FROM pairs
       |  UNION ALL SELECT id_b AS id_a, id_a AS id_b FROM pairs),
       |${prCtesSql("edges", "id_a", "id_b")}
       |SELECT doc_id, r / 1000000.0 AS rank FROM pr$Iters
       |ORDER BY doc_id""".stripMargin

  // --- 97. keeper-by-centrality (r4) --------------------------------------
  /** The curation policy q95 exists to feed: within each near-dup
    * cluster keep the most CENTRAL document (highest PageRank, doc_id
    * tie-break) rather than q70/q74's min-id convention — "keep the
    * canonical version" instead of "keep an arbitrary one". Composes the
    * production edge set (q50) with connected components and PageRank —
    * both checkpoint-backed iterations over ONE shared cached pair
    * relation — then a per-cluster argmax whose `row_number ≤ 1` compiles
    * to a map-side WindowGroupLimit (a pathological mega-cluster never
    * lands whole on one task). One row per cluster, singletons included.
    * Both iterations come from the family memo ([[graft.SharedRelations]]):
    * q74's label set and q95's rank vector are materialized once per
    * family run, so q97 itself is just the argmax join. */
  def q97(s: SparkSession, dir: String): DataFrame =
    clusterArgmax(DedupOps.q74(s, dir).select(col("doc_id"), col("root")),
      q95(s, dir))

  /** Cluster + rank + per-cluster argmax over any undirected pair set. */
  def keeperByRank(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val p = pairs.cache()
    val roots = DedupOps.connectedComponents(p, docs)
      .select(col("doc_id"), col("root"))
    val ranks = pagerank(p, docs)
    // both iterations have materialized to checkpoint blocks; the pair
    // relation is no longer reachable from the returned plan
    p.unpersist(blocking = false)
    clusterArgmax(roots, ranks)
  }

  /** Per-cluster argmax: highest-rank member of each `root` cluster,
    * doc_id tie-break; `row_number ≤ 1` compiles to WindowGroupLimit. */
  private def clusterArgmax(roots: DataFrame, ranks: DataFrame): DataFrame =
    roots.join(ranks, "doc_id")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("root"))
          .orderBy(col("rank").desc, col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("root").as("cluster"), col("doc_id").as("keeper"),
        col("rank").as("keeper_rank"))
      .orderBy(col("cluster"))

  lazy val q97Sql: String =
    s"""WITH RECURSIVE ${DedupOps.ccCtesSql(DedupOps.q50PairsSql)},
       |${prCtesSql("edges", "a", "b")},
       |sel AS (
       |  SELECT t.root, t.doc_id, p.r,
       |    ROW_NUMBER() OVER (PARTITION BY t.root
       |      ORDER BY p.r DESC, t.doc_id) AS rk
       |  FROM roots t JOIN pr$Iters p ON t.doc_id = p.doc_id)
       |SELECT root AS cluster, doc_id AS keeper, r / 1000000.0 AS keeper_rank
       |FROM sel WHERE rk = 1
       |ORDER BY cluster""".stripMargin

  // --- 106. policy-driven keeper selection (r4) ---------------------------
  /** q97 with the keeper POLICY a curation run actually ships: prefer
    * documents that pass the quality gate (q45's length/symbol
    * metrics, q77's thresholds), break ties by centrality (q95), then
    * doc_id — "keep the best-written canonical version". The policy is
    * a lexicographic ORDER BY inside the same per-cluster argmax, so
    * swapping policies costs nothing at plan level; all three inputs
    * (CC labels, ranks, quality) come from family-memoized / cached
    * relations, leaving q106 itself as two equi-joins + a map-side
    * WindowGroupLimit. */
  def q106(s: SparkSession, dir: String): DataFrame = {
    val roots = DedupOps.q74(s, dir).select(col("doc_id"), col("root"))
    val qual = TextOps.q45(s, dir).select(col("doc_id"),
      (col("n_toks") >= 10 && col("non_alnum_ratio") <= 0.5)
        .cast("int").as("quality_ok"))
    roots.join(q95(s, dir), "doc_id").join(qual, "doc_id")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("root"))
          .orderBy(col("quality_ok").desc, col("rank").desc, col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("root").as("cluster"), col("doc_id").as("keeper"),
        col("quality_ok"), col("rank").as("keeper_rank"))
      .orderBy(col("cluster"))
  }

  private lazy val q45Body: String =
    TextOps.q45Sql.split("\nORDER BY")(0)

  lazy val q106Sql: String =
    s"""WITH RECURSIVE ${DedupOps.ccCtesSql(DedupOps.q50PairsSql)},
       |${prCtesSql("edges", "a", "b")},
       |qual AS (
       |  SELECT doc_id,
       |    CASE WHEN n_toks >= 10 AND non_alnum_ratio <= 0.5 THEN 1 ELSE 0 END AS quality_ok
       |  FROM ($q45Body) _q),
       |sel AS (
       |  SELECT t.root, t.doc_id, q.quality_ok, p.r,
       |    ROW_NUMBER() OVER (PARTITION BY t.root
       |      ORDER BY q.quality_ok DESC, p.r DESC, t.doc_id) AS rk
       |  FROM roots t
       |  JOIN pr$Iters p ON t.doc_id = p.doc_id
       |  JOIN qual q ON t.doc_id = q.doc_id)
       |SELECT root AS cluster, doc_id AS keeper, quality_ok, r / 1000000.0 AS keeper_rank
       |FROM sel WHERE rk = 1
       |ORDER BY cluster""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q95_pagerank", q95, Some(q95Sql)),
    Op("q97_keeper_by_rank", q97, Some(q97Sql)),
    Op("q106_keeper_policy", q106, Some(q106Sql)),
  )
}
