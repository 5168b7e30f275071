package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Operator registries grouped by family, in SURVEY §2 order.
    * [[Bench]] and [[Verify]] clear the SQL cache between groups:
    * shared-subplan caches (tf-idf features, the shingle index, scored
    * docs) are structural-match reused WITHIN their family, but a
    * full-registry session that never unpersists them accumulates every
    * family's working set for the whole run. */
  def opGroups: Seq[Seq[Op]] = Seq(
    operators.Relational.ops,
    operators.Events.ops,
    // EvalOps/BpeOps ride TextOps' family caches (docsWithToks, q38's
    // scored relation) — same cache group so the evaluation readouts and
    // the subword trainer reuse them
    operators.TextOps.ops ++ operators.EvalOps.ops ++ operators.BpeOps.ops ++
      operators.EmbedOps.ops,
    // PipelineOps shares the dedup family's cached subplans (shingle
    // index, verified pairs) — same cache group so q77 reuses them
    operators.DedupOps.ops ++ operators.PipelineOps.ops ++ operators.GraphOps.ops,
    operators.SimOps.ops,
    operators.MLOps.ops,
    Seq(Op("q56_binary_meta", multimodal.MultiModal.mediaFeatures, None),
      // r7: the registered compressibility signal is the oracle-
      // replayable distinct-4-gram ratio; the Deflater form remains a
      // spec-only component (PropertySpec/EngineSpec)
      Op("q72_compression_quality", multimodal.MultiModal.ngramRatio,
        Some(multimodal.MultiModal.ngramRatioSql)),
      // r7: REAL image codec round-trip (pure-JDK ImageIO) — a codec is
      // not ANSI-SQL-expressible, so rows-checked + spec-pinned
      Op("q135_image_decode", multimodal.MultiModal.imageFeatures, None),
      // r8: REAL audio codec round-trip (pure-JDK javax.sound.sampled
      // WAV/PCM) — same rows-checked + spec-pinned closure as q135
      Op("q136_audio_decode", multimodal.MultiModal.audioFeatures, None),
      // r8: REAL video container demux (YUV4MPEG2 — uncompressed, so
      // the demuxer IS the decode); rows-checked + spec-pinned
      Op("q143_video_decode", multimodal.MultiModal.videoFeatures, None),
      // r12: REAL COMPRESSED video essence — MJPEG (ImageIO JPEG) in a
      // conforming AVI container; container round-trip lossless,
      // essence lossy-bounded (both spec-pinned)
      Op("q168_video_mjpeg", multimodal.MultiModal.mjpegFeatures, None),
      // r12: REAL COMPRESSED audio essence — G.711 µ-law (javax.sound
      // ULAW conversion) in a WAV container; companding bound carried
      // in the rows, ceiling spec-pinned
      Op("q169_audio_ulaw", multimodal.MultiModal.ulawFeatures, None)),
    operators.Relational2.ops ++ operators.Bucketed.ops)

  /** All operators, flattened in SURVEY §2 order. */
  def allOps: Seq[Op] = opGroups.flatten

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
