package graft.operators

/** Artifact-amortized oracle SQL for the tokenizer/pack family (r13
  * VERDICT #4 — "baseline fairness, both directions").
  *
  * The cold 36-query baseline ratio mostly measures memo-vs-chain-replay:
  * Spark trains the tokenizer / builds the pack ONCE per corpus snapshot
  * and every readout consumes the artifact, while single-statement SQL
  * re-derives the whole chain inside each query. This object produces the
  * OTHER bracket: the shared chains as `CREATE TABLE` statements DuckDB
  * materializes once per session (the artifact equivalent), plus each
  * family query's oracle SQL REWRITTEN to read those tables — so
  * `scripts/baseline_duckdb.py` can time the amortized readouts and the
  * committed artifact reports BOTH ratios (cold = DuckDB replays chains,
  * amortized = DuckDB reads standing tables; the truth brackets between).
  *
  * The rewrites are exact-string substitutions over the SAME Scala
  * builders the oracles interpolate ([[PipelineOps.q158Sql]],
  * [[BpeOps.chainCtesSql]], …), so they can never drift from the oracle
  * text; `baseline_duckdb.py` additionally verifies each amortized
  * query's RESULT equals its cold result before timing it (a wrong
  * rewrite is a loud failure, not a silent wrong ratio).
  *
  * Deliberate fairness choices, both directions:
  *  - q157 amortizes ONLY the tokenizer training chain (`c_bpe_vocab`),
  *    not the chunk corpus pass — Spark's q157 likewise re-derives the
  *    text-bearing chunk relation per call (only the thin masses memo).
  *  - q173's chunk relation IS amortized (`c_chunks`) even though
  *    Spark's flag plan re-reads chunk text — generous to DuckDB; the
  *    amortized ratio is an upper bound on DuckDB's standing-artifact
  *    speed.
  *  - q161/q164 land in [[amortized]] incidentally (their oracle SQL is
  *    byte-equal to q144's/q151's), but they are never TIMED amortized —
  *    the script intersects with its headline set, which excludes them
  *    because their Spark contracts deliberately re-train per run; the
  *    cold comparison is the honest one there.
  */
object AmortizedSql {

  /** Chain tables in CREATION ORDER (later chains may read earlier ones
    * only via their own full SQL — each definition is self-contained, so
    * order is actually free; kept dependency-ordered for readability). */
  lazy val chains: Seq[(String, String)] = Seq(
    // the trained merge table (q144's registered readout)
    "c_bpe_merges" -> BpeOps.q144Sql,
    // the final vocab relation v<Rounds>(w, f) — what trainShared memoizes
    "c_bpe_vocab" ->
      s"WITH ${BpeOps.chainCtesSql}\nSELECT w, f FROM v${BpeOps.Rounds}",
    // t(doc_id, lang, rt, ct) — the span-cleaned per-doc token masses
    "c_t" -> s"${PipelineOps.q114CtesSql}\nSELECT * FROM t",
    // fxp(lang, …, rate_micros, alloc_tokens) — the mixing fixpoint
    "c_fxp" -> s"${PipelineOps.q120CtesSql}\nSELECT * FROM fxp",
    // chunks(doc_id, chunk_id, …, text_chunk) — the context-chunk relation
    "c_chunks" ->
      s"WITH ${BpeOps.chainCtesSql},\n${BpeOps.chunkCtesSql}\nSELECT * FROM chunks",
    // the packed sequence build (q158's registered readout / the q165
    // artifact's content)
    "c_pack" -> PipelineOps.q158Sql,
    // the multimodal pack (q196's registered readout / the q197
    // artifact's content) — r16: the mm lineage gets the c_pack
    // treatment, so q197/q199/q207's amortized readouts consume the
    // standing table exactly as Spark reads the mm_pack memo /
    // persisted mmpack artifact
    "c_mmpack" -> PipelineOps.q196Sql)

  /** Whole-query rewrites (applied only when the oracle SQL is exactly
    * this text — the chain IS the query, so the amortized readout is the
    * standing table, matching Spark's memo-read marginal). */
  private lazy val fullRules: Seq[(String, String)] = Seq(
    BpeOps.q144Sql -> "SELECT * FROM c_bpe_merges ORDER BY round",
    PipelineOps.q158Sql -> "SELECT * FROM c_pack ORDER BY doc_id, chunk_id",
    PipelineOps.q196Sql ->
      "SELECT * FROM c_mmpack ORDER BY doc_id, modality, seq_id")

  /** Fragment rewrites, longest-prefix first. The q120+chain(+chunk)
    * prefixes rebind `t`/`fxp`/`chunks` as alias CTEs over the standing
    * tables; the pack subquery collapses to `c_pack`; a chain-only WITH
    * prefix drops to the bare WITH (its `v<Rounds>` consumers then
    * retarget to `c_bpe_vocab` via the last rule). */
  private lazy val fragRules: Seq[(String, String)] = Seq(
    s"(${PipelineOps.q158Sql})" -> "c_pack",
    s"(${PipelineOps.q196Sql})" -> "c_mmpack",
    // q207's inline mm-pack derivation collapses to the standing table
    // (its arrival CTEs stay live — Spark memoizes the arrival build
    // too, but it is batch-sized; the standing-table read is the part
    // that matters at scale)
    s"${PipelineOps.mmPackCtesSql}," ->
      "mpack AS (SELECT * FROM c_mmpack),",
    s"${PipelineOps.q120CtesSql},\n${BpeOps.chainCtesSql},\n${BpeOps.chunkCtesSql}," ->
      ("WITH t AS (SELECT * FROM c_t), fxp AS (SELECT * FROM c_fxp), " +
        "chunks AS (SELECT * FROM c_chunks),\n" +
        // q173's bench-shingle side reads the tokenized docs (`ctt`)
        // directly — a corpus text pass Spark's flag plan also pays per
        // run, so it stays a live CTE, not a standing table
        BpeOps.cttCteSql + ","),
    s"${PipelineOps.q120CtesSql},\n${BpeOps.chainCtesSql}," ->
      "WITH t AS (SELECT * FROM c_t), fxp AS (SELECT * FROM c_fxp),",
    s"WITH ${BpeOps.chainCtesSql}," -> "WITH")

  /** Reference retarget applied ONLY when a structural rule above fired
    * (on its own it would silently amortize chain-carrying queries like
    * q147 whose SQL keeps the full chain in scope). */
  private lazy val vocabRef: (String, String) =
    (s"FROM v${BpeOps.Rounds}", "FROM c_bpe_vocab")

  /** qname → amortized SQL, for every registered oracle a structural
    * rule rewrites. Queries whose chains interleave unmemoized corpus
    * passes on the Spark side too (q160's Lloyd probe, the LM family)
    * stay cold by omission. */
  lazy val amortized: Map[String, String] = {
    graft.SparkEntry.oracleSql.flatMap { case (name, sql) =>
      fullRules.find(_._1 == sql) match {
        case Some((_, repl)) => Some(name -> repl)
        case None =>
          var out = sql
          var fired = false
          fragRules.foreach { case (pat, repl) =>
            if (out.contains(pat)) { out = out.replace(pat, repl); fired = true }
          }
          if (fired) {
            out = out.replace(vocabRef._1, vocabRef._2)
            Some(name -> out)
          } else None
      }
    }
  }
}
