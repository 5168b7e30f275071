#!/usr/bin/env python3
"""Second-engine wall-clock baseline (dev tool only — the shipped library
is pure Scala/Spark). Times a HEADLINE subset of the oracle SQL in DuckDB
over the same parquet tables Bench reads, best-of-2 per query, and writes
BASELINE_DUCKDB.json. graft.Bench picks that file up and emits the
spark/duckdb wall-clock ratio on its JSON line, making `bench_vs_baseline`
a measured number instead of a convention.

The headline set spans the engine's families (relational agg/join/window,
sessionization, TF-IDF, eval metrics, inverted-index + MinHash dedup,
BM25, DSIR selection, order-statistics gate) while staying inside what
DuckDB expresses efficiently — the recursive-CTE graph replays and the
persisted-artifact probes are correctness oracles, not fair timing
baselines (DuckDB re-materializes the whole index per run).

Usage: python3 scripts/baseline_duckdb.py <sfDir> <oracle_sql.json> [out]
  oracle_sql.json: as dumped by graft.Verify (any SF's dump works — the
  SQL is SF-independent; tables come from <sfDir>).
"""
import sys, os, json, time
import duckdb

HEADLINE = [
    "q1_pricing_summary", "q3_join_agg", "q9_topk", "q28_sessionize",
    "q36_tfidf", "q40_wss95", "q49_dedup_ngram_jaccard",
    "q50_dedup_minhash", "q103_bm25", "q121_dsir_select",
    # r9 widening (r8 VERDICT #7): cover the families the original ten
    # under-sampled — window ops, as-of join, prefix-sum packing, span
    # cleaning, eval curves, robust gates, percentile, soft dedup — so
    # the headline ratio stops being dedup-weighted.
    "q10_window_rank", "q24_percentile", "q64_asof_join", "q83_token_pack",
    "q100_dedup_idf_cosine", "q107_span_clean", "q139_roc_points",
    "q142_mad_outliers",
    # r11 widening (r10 VERDICT #6): the 18-query headline predated the
    # r9/r10 tokenizer family — the engine's biggest new surface. Add BPE
    # training, trained-tokenizer segmentation, the subword-budget pack,
    # tokenizer-unit context chunks, and banded semantic dedup so the
    # ratio tracks what the engine now is.
    "q144_bpe_train", "q151_bpe_segment", "q152_subword_pack",
    "q153_dedup_semantic_banded", "q157_context_chunks_units",
    # r12 widening (r11 VERDICT #6): the sequence-pack ladder and the
    # trained-vector ANN index — q158/q159 ride the same chain replays
    # as q152 (the fairness note covers them), q160 re-derives the
    # whole train->Lloyd->encode->probe pipeline per run where Spark
    # serves an amortized standing artifact (same note).
    "q158_sequence_pack", "q159_sequence_manifest",
    "q160_ann_index_trained",
    # r13 widening (r12 VERDICT #6): the loader surface — per-epoch
    # ordering, the persisted pack artifact (DuckDB replays its manifest
    # chain; Spark reads the standing artifact — the fairness note's
    # amortization caveat applies), curriculum scheduling, and
    # sequence-level decontamination. All full-oracle and
    # DuckDB-expressible.
    "q162_epoch_order", "q165_pack_artifact", "q171_curriculum_order",
    "q173_chunk_decontaminate",
    # r13 second widening: the loader-batching / curation wave. q179/
    # q185 nest the q158 chain and q181/q184 the q144 training chain
    # (the fairness note's family-memo caveat applies); q180 rides the
    # LM chain, q182 the shingle pass — both self-contained. q183 is
    # deliberately EXCLUDED: its oracle embeds the recursive-CTE CC
    # replay, the class this headline documents as a correctness oracle,
    # not a fair timing baseline.
    "q179_length_batches", "q180_ppl_buckets", "q181_tokenizer_fertility",
    "q182_ngram_novelty", "q184_repeat_plan", "q185_batch_manifest",
    # r14 widening: the Unicode-tokenization oracle (the new token
    # class's cross-engine proof — self-contained) and the multimodal
    # pack (rides the q158 chain; the amortized pass covers it). NB the
    # r14 token-class change rewrote toksSql inside many headline
    # oracles — their min histories restart under the sql-md5 guard,
    # by design.
    "q195_unicode_tokens", "q196_multimodal_pack",
    # r15 widening: epoch continuity over a growing artifact (rides the
    # q158 chain — the amortized pass covers it), the unsegmented-script
    # segmentation readout and the script-routed gate (self-contained —
    # and the r15 segmentation change rewrote toksSql inside every
    # token-bearing headline oracle, restarting those min histories
    # under the sql-md5 guard, by design).
    "q200_epoch_continuity", "q201_cjk_segmentation",
    "q202_script_routed_gate",
    # r16 widening: the per-script tokenizer trainer + its routed
    # release proof (grouped q144 chains — self-contained) and mm epoch
    # continuity (rides the q158+q196 chains — the amortized pass
    # covers it via the new c_mmpack standing table). q205/q206 are
    # deliberately EXCLUDED (the q183 class): their oracles replay the
    # payload fingerprint as md5(text) — valid for CORRECTNESS only
    # because the codec round-trips are provably lossless — while the
    # Spark side runs the REAL PNG/WAV decode per payload; timing
    # md5-over-varchar against a codec pass is not a comparison of the
    # same work in either direction.
    "q203_bpe_train_per_script", "q204_tokenizer_routed_fertility",
    "q207_mm_epoch_continuity",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, oracle_json, out_path="BASELINE_DUCKDB.json"):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    res = {}
    for q in HEADLINE:
        sql = oracle[q]
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        res[q] = round(min(ts), 3)
        print(f"{q}: {res[q]}s", file=sys.stderr)
    # --- artifact-amortized pass (r13 VERDICT #4) -------------------------
    # Second ratio: materialize the tokenizer/pack shared chains ONCE per
    # session (CREATE TABLE — DuckDB's equivalent of Spark's family memo /
    # standing artifact), then time only the rewritten readouts. Chain
    # creation is deliberately untimed (it's the artifact build both
    # engines amortize); each rewritten query is first VERIFIED to return
    # exactly its cold oracle's rows — a drifted rewrite drops the query
    # with a loud banner instead of committing a wrong ratio.
    res_am, am_md5 = {}, {}
    am_path = os.path.join(os.path.dirname(os.path.abspath(oracle_json)),
                           "amortized_sql.json")
    if os.path.exists(am_path):
        am = json.load(open(am_path))
        # MEMBERSHIP GUARD (r14 ADVICE): AmortizedSql's fragment rules are
        # exact-string matches over the Scala SQL builders — a formatting
        # change in a builder silently DROPS queries from the amortized
        # set by omission. Log the set and warn loudly when a query that
        # was amortized in the committed artifact is no longer rewritten,
        # so baseline_amortized can't quietly cover a different subset
        # across rounds under the same label.
        cur_am = sorted(q for q in HEADLINE if q in am["queries"])
        print(f"amortized set ({len(cur_am)}): {', '.join(cur_am)}",
              file=sys.stderr)
        if os.path.exists(out_path):
            prev_am = set(json.load(open(out_path))
                          .get("queries_amortized", {}))
            for q in sorted(prev_am - set(cur_am)):
                print(f"AMORTIZED SET SHRANK: {q} was amortized in the "
                      "committed artifact but amortized_sql.json no longer "
                      "rewrites it — check AmortizedSql's fragment rules "
                      "against the SQL builders", file=sys.stderr)
        for name, csql in am["chains"]:
            t0 = time.perf_counter()
            con.sql(f"CREATE TABLE {name} AS {csql}")
            print(f"chain {name}: built in "
                  f"{time.perf_counter() - t0:.2f}s (untimed)", file=sys.stderr)
        for q in HEADLINE:
            if q not in am["queries"]:
                continue
            asql = am["queries"][q]
            cold = sorted(map(str, con.sql(oracle[q]).fetchall()))
            warm = sorted(map(str, con.sql(asql).fetchall()))
            if cold != warm:
                print(f"AMORTIZED REWRITE MISMATCH: {q} — rewritten result "
                      "differs from cold oracle; query dropped from the "
                      "amortized set (fix AmortizedSql)", file=sys.stderr)
                continue
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(asql).fetchall()
                ts.append(time.perf_counter() - t0)
            res_am[q] = round(min(ts), 3)
            import hashlib as _h
            am_md5[q] = _h.md5(asql.encode()).hexdigest()
            print(f"{q} (amortized): {res_am[q]}s", file=sys.stderr)
    else:
        print(f"no {am_path} — amortized pass skipped", file=sys.stderr)
    # host + date markers (r7 ADVICE): Bench warns when the committed
    # baseline was timed on a different host than the bench run — a
    # cross-host wall-clock ratio is not comparable.
    import socket, datetime
    # If out_path already exists for the same sf/host, MERGE per-query
    # mins instead of overwriting: the committed artifact is min across
    # N temporally-separated runs (graft.Bench's storm defense — one
    # contended window cannot corrupt the committed numbers). The note
    # records the protocol AND the r11 fairness caveat on the
    # tokenizer-family queries.
    import hashlib
    sql_md5 = {q: hashlib.md5(oracle[q].encode()).hexdigest()
               for q in HEADLINE}
    qruns = {q: 1 for q in res}
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        if prev.get("sf") == os.path.basename(os.path.normpath(sf_dir)) \
                and prev.get("host") == socket.gethostname():
            # merge over the INTERSECTION (r11 review): a headline
            # widening must not discard the carried queries' accumulated
            # mins — new queries simply start their own min history.
            # SQL-HASH GUARD (r11 review #2): a query whose oracle SQL
            # was redefined under the same name must NOT inherit mins
            # timed on the old definition — its history restarts.
            pq = prev.get("queries", {})
            phash = prev.get("query_sql_md5", {})
            pruns = prev.get("query_runs", {})
            # LEGACY BOOTSTRAP (r11 ADVICE): an artifact written before
            # the hash-guard era has NO query_sql_md5 map at all — that
            # is a format gap, not 18 simultaneous SQL redefinitions, so
            # carry its mins (one loud banner) instead of silently
            # discarding every accumulated history in a single run.
            legacy = "query_sql_md5" not in prev
            if legacy:
                print("LEGACY BASELINE: previous artifact predates the "
                      "query_sql_md5 guard — carrying its mins unguarded "
                      "this once; the merged artifact records hashes",
                      file=sys.stderr)
            for q in list(res):
                if q in pq and (legacy or phash.get(q) == sql_md5[q]):
                    res[q] = min(res[q], pq[q])
                    qruns[q] = pruns.get(q, prev.get("runs", 1)) + 1
                elif q in pq:
                    print(f"{q}: oracle SQL changed — min history restarted",
                          file=sys.stderr)
            # amortized mins merge under their OWN sql-hash guard (a
            # rewrite-rule change restarts that query's amortized history)
            pam = prev.get("queries_amortized", {})
            pamh = prev.get("query_amortized_md5", {})
            for q in list(res_am):
                if q in pam and pamh.get(q) == am_md5[q]:
                    res_am[q] = min(res_am[q], pam[q])
            print(f"merged mins with existing {out_path} "
                  f"(per-query histories now {sorted(set(qruns.values()))})",
                  file=sys.stderr)
    runs = max(qruns.values())
    note = ("per-query min over the query intersection across temporally "
            "separated runs — graft.Bench's cross-window storm defense; "
            "query_runs records each query's own history depth "
            f"(max {runs}), best-of-2 within each run, and a query whose "
            "oracle SQL changes restarts its history (query_sql_md5 "
            "guard; a pre-guard artifact's mins carry once via the "
            "legacy bootstrap with a loud banner). Fairness: on the "
            "tokenizer/pack-family queries "
            "(q144/q151/q152/q157/q158/q159/q179/q181/q184/q185) "
            "Spark's bench numbers are "
            "family-memo marginal costs (the engine trains once per "
            "corpus snapshot and every readout consumes the artifact), "
            "and on q160 Spark serves a standing on-disk index, while "
            "this SQL re-derives the training/index chain inside each "
            "query — plain SQL cannot share artifacts across statements. "
            "The comparison still holds cold: Spark's r10 pre-memo plan "
            "times (q144 0.50s, q151 0.34s, q152 0.27s, q157 0.49s) and "
            "q160's 1.2s build-inclusive first call beat the chain "
            "replays on every added query.")
    # field ORDER is part of the contract with graft.Bench's anchor
    # regex (r11 ADVICE): `queries` must appear before any free-text
    # field that could contain a literal `"queries": {` — keep the note
    # AFTER the queries object (python dicts serialize insertion-ordered)
    note += (" Amortized pass (r14): queries_amortized re-times the "
             "tokenizer/pack-family subset against once-per-session "
             "CREATE TABLE materializations of the shared chains "
             "(amortized_sql.json, rewrites verified result-equal to the "
             "cold oracles before timing) — the cold ratio charges DuckDB "
             "full chain replays Spark memoizes, the amortized ratio "
             "grants DuckDB standing artifacts everywhere (including "
             "q173's chunk text, which Spark re-reads); the honest "
             "comparison brackets between the two. r16: q205/q206 "
             "(multimodal payload dedup) are excluded from the headline "
             "— their oracles replay the payload fingerprint as "
             "md5(text), valid for correctness only via the proven "
             "lossless codec round-trips, while Spark runs the real "
             "PNG/WAV decode per payload; md5-over-varchar vs a codec "
             "pass is not a timing comparison of the same work (the "
             "q183 exclusion class).")
    out = {"engine": "duckdb", "version": duckdb.__version__,
           "sf": os.path.basename(os.path.normpath(sf_dir)),
           "host": socket.gethostname(),
           "date": datetime.date.today().isoformat(),
           "runs": runs,
           "queries": res, "total": round(sum(res.values()), 3),
           "queries_amortized": res_am,
           "total_amortized": round(sum(res_am.values()), 3),
           "note": note,
           "query_runs": qruns, "query_sql_md5": sql_md5,
           "query_amortized_md5": am_md5}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

if __name__ == "__main__":
    main(*sys.argv[1:])
