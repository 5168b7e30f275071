package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultiModal

class EngineSpec extends AnyFunSuite with SharedSpark {

  test("driver contract: every op is registered, oracles reference registered ops") {
    // r13: +q174/q177/q178 (full oracle), +q175/q176 (trained/artifact —
    // rows-only by design, spec-reconciled), +q179–q193 (loader batching +
    // its per-epoch batch schedule, ppl buckets + their sampling action,
    // fertility gate, novelty + its arrival-seam probe, soft-dedup
    // weights + their effective-mass manifest, repeat plan, batch
    // manifest, cell-quota diversity sample, artifact integrity audit,
    // shard mixture-skew report, DDP worker shard — all full oracle)
    // r14: +q195 unicode-tokenization oracle (full oracle — the
    // cross-engine proof of the [\p{L}\p{N}]+ token class), +q196
    // multimodal-interleaved pack (full oracle — geometry-derived unit
    // accounting, locators only), +q197 its persisted artifact +
    // per-modality manifest (full oracle — the q165 round-trip proof
    // shape), +q198 script profile / routing readout (full oracle —
    // Unicode script properties, Java Is-spelling vs RE2 spelling),
    // +q199 multimodal per-step batch fetch (full oracle — the q177
    // proof shape over the mmpack artifact)
    // r15: +q200 epoch continuity over a growing artifact (full oracle
    // — gen-N ranks verbatim, served arrivals at the epoch tail),
    // +q201 unsegmented-script segmentation readout (full oracle — the
    // per-codepoint rule's bounded-vocab proof vs the clause-run
    // counterfactual), +q202 script-routed quality gate (full oracle —
    // the q198 routing primitive's consumer; flips counted)
    // r16: +q203 per-script BPE training (full oracle — the q144 chain
    // with a script stratum; the routing family's ACTION), +q204
    // per-script tokenizer release + routed fertility proof (full
    // oracle — GenManifest round-trip + the q202 flip-count pattern at
    // the tokenizer layer), +q205 exact multimodal payload dedup (full
    // oracle — md5 over the REAL decoded payload bytes, keeper per
    // (modality, fingerprint)), +q206 the deduped modality pack (full
    // oracle — the keeper decision consumed before offsets), +q207 mm
    // epoch continuity (full oracle — the q200 law over the q199
    // multimodal stream; gen-N mmep ranks verbatim, arrivals at the
    // epoch tail)
    assert(SparkEntry.queries.size === 207)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size === 190)
  }

  test("entry flagship runs on sf0.001 with rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("op names are unique") {
    val names = SparkEntry.allOps.map(_.name)
    assert(names.distinct.length === names.length)
  }

  test("multimodal decode stub is deterministic and schema-stable") {
    val df = MultiModal.mediaFeatures(spark, SF)
    assert(df.columns.toSeq ===
      Seq("doc_id", "byte_len", "first_byte", "checksum", "f0"))
    val a = df.collect()
    val b = MultiModal.mediaFeatures(spark, SF).collect()
    assert(a === b)
    assert(a.length === Tables.documents(spark, SF).count())
    // payload is the utf-8 text, so byte_len tracks the text length
    a.take(5).foreach(r => assert(r.getAs[Int]("byte_len") > 0))
  }

  test("multimodal frame sampling keeps every k-th frame with local features") {
    val df = MultiModal.frameFeatures(spark, SF)
    assert(df.count() === Tables.documents(spark, SF).count())
    val r = df.collect().head
    val n = r.getAs[Int]("n_frames")
    assert(n > 0)
    assert(r.getAs[Seq[Long]]("frame_checksums").length === n)
    // deterministic: stub sampler keeps ceil(chunks/2) frames of 32 bytes
    val textLen = Tables.documents(spark, SF)
      .filter(org.apache.spark.sql.functions.col("doc_id") === r.getAs[Long]("doc_id"))
      .collect()(0).getAs[String]("text").getBytes("UTF-8").length
    val chunks = (textLen + 31) / 32
    assert(n === (chunks + 1) / 2)
  }

  test("q135 image pipeline: genuine PNG payloads, lossless decode, exact features") {
    // the payload really is a PNG (codec, not a stub): signature bytes
    val sample = "The quick brown fox — 42! éü".getBytes("UTF-8")
    val png = MultiModal.pngEncode(sample)
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P' && png(2) === 'N' && png(3) === 'G')
    // ImageIO round-trip is bit-exact pixel for pixel
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    sample.indices.foreach { i =>
      assert(img.getRaster.getSample(i % MultiModal.ImgWidth,
        i / MultiModal.ImgWidth, 0) === (sample(i) & 0xff), s"pixel $i")
    }
    // full pipeline over the corpus: features equal a direct byte-level
    // recompute (possible only because the codec is lossless)
    val df = MultiModal.imageFeatures(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "width", "height",
      "n_bytes", "png_bytes", "mean_px_micros"))
    assert(df.count() === Tables.documents(spark, SF).count())
    val byId = df.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(5)))).toMap
    Tables.documents(spark, SF).select("doc_id", "text").collect().take(20)
      .foreach { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val n = b.length
        val h = math.max(1, (n + MultiModal.ImgWidth - 1) / MultiModal.ImgWidth)
        val sum = b.map(_ & 0xff).map(_.toLong).sum
        val mean = if (n == 0) 0L else (2L * sum * 1000000L + n) / (2L * n)
        assert(byId(r.getLong(0)) === ((MultiModal.ImgWidth, h, n, mean)),
          s"doc ${r.getLong(0)}")
      }
    // determinism (PNG encode is deterministic for a fixed JDK)
    assert(df.collect() === MultiModal.imageFeatures(spark, SF).collect())
  }

  test("q136 audio pipeline: genuine WAV payloads, lossless decode, exact features") {
    // the payload really is a RIFF/WAVE container (codec, not a stub)
    val sample = "The quick brown fox — 42! éü".getBytes("UTF-8")
    val wav = MultiModal.wavEncode(sample)
    assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") === "WAVE")
    // AudioSystem round-trip recovers the exact sample (and byte) stream
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val pcm = ais.readAllBytes(); ais.close()
    assert(pcm.length === sample.length * 2)
    sample.indices.foreach { i =>
      val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
      assert(s === (((sample(i) & 0xff) - 128) << 8), s"sample $i")
    }
    // full pipeline over the corpus: features equal a direct byte-level
    // recompute (possible only because linear PCM in WAV is lossless)
    val df = MultiModal.audioFeatures(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "sample_rate", "bits",
      "n_samples", "wav_bytes", "peak_abs", "mean_abs_micros", "zero_crossings"))
    assert(df.count() === Tables.documents(spark, SF).count())
    val byId = df.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    Tables.documents(spark, SF).select("doc_id", "text").collect().take(20)
      .foreach { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val ss = b.map(x => ((x & 0xff) - 128) << 8)
        val n = ss.length
        val sumAbs = ss.map(s => math.abs(s.toLong)).sum
        val mean = if (n == 0) 0L else (2L * sumAbs * 1000000L + n) / (2L * n)
        val peak = if (n == 0) 0L else ss.map(s => math.abs(s.toLong)).max
        val zc = ss.toSeq.sliding(2).count {
          case Seq(a2, b2) => (a2 >= 0) != (b2 >= 0); case _ => false }
        assert(byId(r.getLong(0)) ===
          ((MultiModal.AudioRate.toInt, 16, n.toLong, peak, mean, zc.toLong)),
          s"doc ${r.getLong(0)}")
      }
    // determinism (WAV encode is deterministic for a fixed JDK)
    assert(df.collect() === MultiModal.audioFeatures(spark, SF).collect())
  }

  test("q143 video pipeline: conforming Y4M streams, lossless demux, exact features") {
    // the payload really is a YUV4MPEG2 stream (container, not a stub)
    val sample = "The quick brown fox — 42! éü".getBytes("UTF-8")
    val y4m = MultiModal.y4mEncode(sample)
    val hdr = new String(y4m, 0, y4m.indexOf('\n'), "US-ASCII")
    assert(hdr.startsWith("YUV4MPEG2 "))
    assert(hdr.contains(s"W${MultiModal.VidW}") && hdr.contains(s"H${MultiModal.VidH}"))
    // the demux recovers the exact byte stream (uncompressed frames +
    // the Xgraftlen header extension make the encode injective)
    assert(MultiModal.y4mDecodeBytes(y4m).toSeq === sample.toSeq)
    // strict parser: corrupt signature and truncated frames both throw
    val bad = y4m.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](MultiModal.y4mDecodeFeatures(1L, bad))
    intercept[IllegalArgumentException](
      MultiModal.y4mDecodeFeatures(1L, y4m.dropRight(1)))
    // malformed header token (consecutive spaces) fails through the same
    // require contract as every other corrupt-stream path
    val dbl = new String(y4m.takeWhile(_ != '\n'), "US-ASCII")
      .replaceFirst(" ", "  ").getBytes("US-ASCII") ++ y4m.dropWhile(_ != '\n')
    intercept[IllegalArgumentException](MultiModal.y4mDecodeFeatures(1L, dbl))
    // full pipeline over the corpus: one SCALAR row per sampled frame
    // (r9 — the registered shape the driver's rows-check can sort),
    // features equal a direct recompute
    val df = MultiModal.videoFeatures(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "width", "height", "fps_num",
      "fps_den", "n_frames", "n_sampled", "payload_bytes", "orig_len",
      "peak_luma", "frame_idx", "checksum", "mean_micros"))
    val rows = df.collect()
    val byFrame = rows.map(r => (r.getLong(0), r.getInt(10)) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(8), r.getLong(12)))).toMap
    assert(byFrame.size === rows.length) // (doc, frame) rows are unique
    val fsz = MultiModal.VidW * MultiModal.VidH
    var expectTotal = 0L
    Tables.documents(spark, SF).select("doc_id", "text").collect()
      .foreach { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val nf = math.max(1, (b.length + fsz - 1) / fsz)
        val ns = (nf + MultiModal.VidEvery - 1) / MultiModal.VidEvery
        expectTotal += ns
        if (r.getLong(0) % 17 == 0) // sampled doc subset: full recompute
          (0 until nf by MultiModal.VidEvery).foreach { f =>
            val lum = (0 until fsz).map { i =>
              val p = f * fsz + i
              if (p < b.length) (b(p) & 0xff).toLong else 0L
            }.sum
            val mean = (2L * lum * 1000000L + fsz) / (2L * fsz)
            assert(byFrame((r.getLong(0), f)) === ((MultiModal.VidW,
              MultiModal.VidH, 25, 1, nf, ns, b.length, mean)),
              s"doc ${r.getLong(0)} frame $f")
          }
      }
    assert(rows.length.toLong === expectTotal) // inventory: Σ n_sampled
    // determinism (the synthesis and demux are pure byte arithmetic)
    assert(rows === MultiModal.videoFeatures(spark, SF).collect())
  }

  test("q168 MJPEG pipeline: conforming AVI, byte-exact container round-trip, bounded lossy essence") {
    val sample = "The quick brown fox — 42! éü".getBytes("UTF-8")
    val codec = new MultiModal.JpegCodec()
    val w = MultiModal.MjpgW; val h = MultiModal.MjpgH; val fsz = w * h
    val avi = MultiModal.aviMjpegEncode(sample, w, h, codec)
    // the payload really is a RIFF/AVI container (muxer, not a stub)
    assert(new String(avi, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") === "AVI ")
    val clip = MultiModal.aviMjpegDemux(avi)
    val nf = math.max(1, (sample.length + fsz - 1) / fsz)
    assert((clip.width, clip.height, clip.usPerFrame, clip.totalFrames,
      clip.origLen) === ((w, h, MultiModal.MjpgUsPerFrame, nf, sample.length)))
    // CONTAINER round-trip is LOSSLESS: the demuxed essence is byte-equal
    // to the JPEG frames the encoder muxed (build the same frames here)
    def gray(off: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until fsz).foreach { i =>
        val p = off + i
        img.getRaster.setSample(i % w, i / w, 0,
          if (p < sample.length) sample(p) & 0xff else 0)
      }
      img
    }
    val expected = (0 until nf).map(f => codec.encode(gray(f * fsz)))
    assert(clip.jpegs.map(_.toSeq) === expected.map(_.toSeq))
    // the essence genuinely is JPEG (SOI/EOI markers, real ImageIO decode)
    clip.jpegs.foreach { j =>
      assert((j(0) & 0xff) === 0xff && (j(1) & 0xff) === 0xd8, "JPEG SOI")
      assert((j(j.length - 2) & 0xff) === 0xff &&
        (j(j.length - 1) & 0xff) === 0xd9, "JPEG EOI")
    }
    // ESSENCE is lossy with a BOUNDED error (DCT quantization): decoded
    // pixels stay close to the source frame
    clip.jpegs.indices.foreach { f =>
      val img = codec.decode(clip.jpegs(f))
      assert(img.getWidth === w && img.getHeight === h)
      var sumErr = 0L
      (0 until fsz).foreach { i =>
        val p = f * fsz + i
        val orig = if (p < sample.length) sample(p) & 0xff else 0
        sumErr += math.abs(img.getRaster.getSample(i % w, i / w, 0) - orig)
      }
      assert(sumErr.toDouble / fsz <= 24.0,
        s"frame $f mean abs error ${sumErr.toDouble / fsz}")
    }
    // strict parser: corrupt signature and truncated chunks both throw
    val bad = avi.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](MultiModal.aviMjpegDemux(bad))
    intercept[IllegalArgumentException](
      MultiModal.aviMjpegDemux(avi.dropRight(3)))
    // full pipeline over the corpus: one scalar row per sampled frame
    val df = MultiModal.mjpegFeatures(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "width", "height",
      "us_per_frame", "n_frames", "n_sampled", "payload_bytes", "orig_len",
      "frame_idx", "jpeg_bytes", "checksum", "mean_micros"))
    val rows = df.collect()
    var expectTotal = 0L
    Tables.documents(spark, SF).select("doc_id", "text").collect()
      .foreach { r =>
        val b = r.getString(1).getBytes("UTF-8")
        val n = math.max(1, (b.length + fsz - 1) / fsz)
        expectTotal += (n + MultiModal.MjpgEvery - 1) / MultiModal.MjpgEvery
      }
    assert(rows.length.toLong === expectTotal) // inventory: Σ n_sampled
    // determinism (fixed JDK ⇒ fixed JPEG tables both ways)
    assert(rows === MultiModal.mjpegFeatures(spark, SF).collect())
  }

  test("q169 µ-law pipeline: real ULAW WAV, genuine compression, bounded companding error") {
    val sample = "The quick brown fox — 42! éü".getBytes("UTF-8")
    val codec = new MultiModal.UlawCodec()
    val wav = codec.encode(sample)
    assert(new String(wav, 0, 4, "US-ASCII") === "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") === "WAVE")
    // the payload genuinely carries µ-law essence (javax.sound reads it
    // back as 8-bit ULAW, not PCM)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    assert(ais.getFormat.getSampleSizeInBits === 8)
    ais.close()
    // genuine compression: half the essence bytes of the 16-bit PCM WAV
    assert(wav.length < MultiModal.wavEncode(sample).length)
    // decode back to PCM: same inventory, bounded companding error
    val (rate, pcm) = codec.decodePcm(wav)
    assert(rate === MultiModal.AudioRate.toInt)
    assert(pcm.length === sample.length * 2)
    sample.indices.foreach { i =>
      val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
      val orig = ((sample(i) & 0xff) - 128) << 8
      assert(math.abs(s - orig) <= 1024, s"sample $i: decoded $s vs $orig")
    }
    // full pipeline over the corpus
    val df = MultiModal.ulawFeatures(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "sample_rate", "ulaw_bytes",
      "pcm_bytes", "n_samples", "peak_abs", "mean_abs_micros",
      "zero_crossings", "max_abs_err"))
    assert(df.count() === Tables.documents(spark, SF).count())
    val rows = df.collect()
    rows.foreach { r =>
      // the lossy bound is part of the operator's OUTPUT — ceiling pinned
      assert(r.getAs[Long]("max_abs_err") <= 1024L,
        s"doc ${r.getLong(0)} err ${r.getAs[Long]("max_abs_err")}")
      // compression receipt on every non-trivial clip (container header
      // amortizes past ~64 samples)
      if (r.getAs[Long]("n_samples") > 64)
        assert(r.getAs[Int]("ulaw_bytes") < r.getAs[Int]("pcm_bytes"))
    }
    // determinism
    assert(rows === MultiModal.ulawFeatures(spark, SF).collect())
  }

  test("q137 confusion matrix reconciles with q76's per-class metrics") {
    import graft.operators.TextOps
    val cm = TextOps.q137(spark, SF).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(cm.nonEmpty)
    // row shares are exact micros summing to ~1 per truth row
    cm.keys.map(_._1).toSet.foreach { (t: String) =>
      val shares = cm.collect { case ((`t`, _), (_, sh)) => sh }.sum
      assert(math.abs(shares - 1.0) < 1e-5, s"row $t shares: $shares")
    }
    // marginals: support (row sums) and n_pred (col sums) match q76;
    // the diagonal is q76's tp
    val per = TextOps.q76(spark, SF).collect()
      .filter(r => r.getString(0) != "macro_avg" && r.getString(0) != "micro_avg")
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    per.foreach { case (cls, (support, nPred, tp)) =>
      val row = cm.collect { case ((`cls`, _), (n, _)) => n }.sum
      val colSum = cm.collect { case ((_, `cls`), (n, _)) => n }.sum
      assert(row === support, s"support $cls")
      assert(colSum === nPred, s"n_pred $cls")
      assert(cm.get((cls, cls)).map(_._1).getOrElse(0L) === tp, s"tp $cls")
    }
  }

  test("q72 registered form: distinct-4-gram ratio matches a local sliding-window recompute") {
    import spark.implicits._
    val df = MultiModal.ngramRatio(spark, SF)
    assert(df.columns.toSeq === Seq("doc_id", "n_grams", "n_distinct", "ratio"))
    assert(df.count() === Tables.documents(spark, SF).count())
    val byId = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    Tables.documents(spark, SF).select("doc_id", "text").collect().take(20)
      .foreach { r =>
        val lt = r.getString(1).toLowerCase
        val grams = if (lt.length < 4) Seq.empty[String] else lt.sliding(4).toSeq
        val n = grams.size.toLong
        val nd = grams.distinct.size.toLong
        // Num.ratio6 half-away micros replay
        val ratio = if (n == 0) 1.0 else ((2 * nd * 1000000L + n) / (2 * n)) / 1e6
        assert(byId(r.getLong(0)) === ((n, nd, ratio)), s"doc ${r.getLong(0)}")
      }
    // repetitive text sits far below the corpus median
    val repRatio = {
      val lt = ("spam " * 200).toLowerCase
      val g = lt.sliding(4).toSeq
      g.distinct.size.toDouble / g.size
    }
    val med = byId.values.map(_._3).toSeq.sorted.apply(byId.size / 2)
    assert(repRatio < med)
  }

  test("compression-ratio quality signal separates repetitive from varied text") {
    import spark.implicits._
    val df = MultiModal.compressionRatio(spark, SF)
    assert(df.count() === Tables.documents(spark, SF).count())
    val ratios = df.select("ratio").as[Double].collect()
    assert(ratios.forall(r => r > 0.0 && r < 1.5))
    // determinism
    val again = MultiModal.compressionRatio(spark, SF).select("ratio").as[Double].collect()
    assert(ratios === again)
    // a pathological repeat compresses much better than the corpus median
    val rep = Seq((0L, "spam " * 200)).toDF("doc_id", "text")
    rep.createOrReplaceTempView("ignored")
    def localRatio(text: String): Double = {
      val bytes = text.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(6); d.setInput(bytes); d.finish()
      val buf = new Array[Byte](1 << 16)
      var c = 0; while (!d.finished()) c += d.deflate(buf)
      d.end()
      if (bytes.isEmpty) 1.0 else math.rint(c.toDouble / bytes.length * 1e6) / 1e6
    }
    assert(localRatio("spam " * 200) < ratios.sorted.apply(ratios.length / 2))
    // value parity vs an independent local recompute (the DuckDB-shaped
    // check a codec op can't have): bit-equal ratios on sampled docs
    val sample = Tables.documents(spark, SF)
      .filter(col("doc_id") % 29 === 0).select("doc_id", "text")
      .as[(Long, String)].collect()
    assert(sample.nonEmpty)
    val got = df.select("doc_id", "ratio").as[(Long, Double)].collect().toMap
    sample.foreach { case (id, text) =>
      assert(got(id) === localRatio(text), s"ratio mismatch for doc $id")
    }
  }

  test("mllib pipelines produce a prediction per input row") {
    val lr = graft.operators.MLOps.q41(spark, SF)
    assert(lr.count() === Tables.embeddings(spark, SF).count())
    val nb = graft.operators.MLOps.q42(spark, SF)
    assert(nb.count() === Tables.documents(spark, SF).count())
    // sanity: a trained model should beat coin-flip on its own training set
    val acc = lr.agg(org.apache.spark.sql.functions.avg("correct")).collect()(0).getDouble(0)
    assert(acc > 0.5)
  }
}
