package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-binary ("multimodal") column plumbing (SURVEY §2 row 56).
  *
  * Pattern for image/audio/video at 100 TB: payloads ride as `binary`
  * columns next to typed metadata; decode/feature-extraction runs as a
  * partition-local batch transform (the Scala analogue of `mapInPandas`)
  * so the decoder amortizes per-partition setup and never touches the
  * driver. Image (PNG via ImageIO, r7), audio (WAV via
  * javax.sound.sampled, r8) and video container (YUV4MPEG2 demux, r8)
  * decode are REAL pure-JDK pipelines end to end; the only declared
  * residue is COMPRESSED video essence (H.264/VP9 — no JDK codec),
  * whose batch plumbing [[frameSampleStub]] keeps exercised.
  */
object MultiModal {

  /** Typed record after "decoding". */
  final case class MediaFeature(
      doc_id: Long, byte_len: Int, first_byte: Int, checksum: Long, f0: Double)

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (JPEG→pixels, PCM→spectrogram). Deterministic byte arithmetic stands
    * in; signature and batching are what a real decoder would use. */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = (sum * 31 + (bytes(i) & 0xff)) & 0xffffffffL; i += 1 }
    MediaFeature(
      doc_id = id,
      byte_len = bytes.length,
      first_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      checksum = sum,
      f0 = if (bytes.nonEmpty) (bytes(0) & 0xff) / 255.0 else 0.0)
  }

  /** STUB frame sampler: a real implementation would decode a video
    * container and sample every k-th frame; here the payload is split
    * into fixed-size "frames" (every k-th chunk kept) — the output shape
    * (`array<binary>` + per-frame index metadata) is what a real sampler
    * produces, and what downstream per-frame featurizers consume. */
  def frameSampleStub(bytes: Array[Byte], frameSize: Int, every: Int): Seq[Array[Byte]] =
    bytes.grouped(frameSize).zipWithIndex.collect {
      case (chunk, i) if i % every == 0 => chunk
    }.toSeq

  /** documents → (payload binary, metadata struct) → partition-batched
    * feature extraction. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin: Dataset[(Long, Array[Byte])] = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(col("n_chars"), col("lang"), col("source")).as("meta"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    bin.mapPartitions { it =>
      // per-partition decoder setup would go here (e.g. codec init)
      it.map { case (id, bytes) => decodeStub(id, bytes) }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** Compression-ratio quality signal (deflate level 6): highly
    * repetitive/templated text compresses far below natural text — a
    * standard corpus-quality heuristic. Runs partition-local with one
    * Deflater per partition (the mapPartitions batch pattern again);
    * not ANSI-SQL-expressible, so rows-checked + spec'd. */
  def compressionRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var compressed = 0
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          (id, bytes.length, compressed,
            if (bytes.length == 0) 1.0
            else math.rint(compressed.toDouble / bytes.length * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "n_bytes", "n_compressed", "ratio")
      .orderBy(col("doc_id"))
  }

  // --- REAL image codec pipeline (r7) --------------------------------------
  /** The decode gap, closed: `javax.imageio` ships with the JDK (PNG and
    * JPEG readers/writers in java.desktop, headless-safe), so the
    * image path needs no external codec libs after all. The pipeline is
    * the real thing end to end: each doc's bytes render to an 8-bit
    * grayscale image, PNG-ENCODE to a genuine binary payload column
    * (what an image corpus ships as), and the feature stage
    * PNG-DECODES that payload back and reads pixels — per-partition
    * codec reuse, nothing driver-sized. PNG is lossless, so the
    * round-trip is bit-exact and the features are deterministic
    * integers (spec-pinned against a direct byte-level recompute).
    * Audio followed in r8 via `javax.sound.sampled` ([[wavEncode]] /
    * [[wavDecodeFeatures]]); only VIDEO container decode stays stubbed
    * ([[frameSampleStub]]) — the JDK carries no codec for it. */
  val ImgWidth = 32

  /** Per-partition PNG codec handles (the [[WavCodec]] rationale):
    * `ImageIO.read`/`write` consult the IIORegistry per call AND wrap
    * the stream in a DISK-cached ImageInputStream/OutputStream by
    * default — a temp file created and deleted per image, which both
    * serializes on the filesystem and wastes IO. Resolving the PNG
    * reader/writer once per partition and using memory-cached streams
    * keeps the whole codec stage allocation-only and parallel.
    * (ImageReader/Writer instances are not thread-safe — one per
    * partition, never shared.) */
  final class PngCodec {
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
      writer.setOutput(null)
      bos.toByteArray
    }

    def decode(png: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(png))
      reader.setInput(iis)
      val img = reader.read(0)
      reader.setInput(null)
      img
    }
  }

  /** Render bytes as a [[ImgWidth]]-wide gray8 image. */
  private def grayImageOf(bytes: Array[Byte], w: Int): java.awt.image.BufferedImage = {
    val h = math.max(1, (bytes.length + w - 1) / w)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0,
        if (i < bytes.length) bytes(i) & 0xff else 0)
      i += 1
    }
    img
  }

  /** Render bytes as a [[ImgWidth]]-wide gray8 image, PNG-encoded.
    * (One-shot convenience over [[PngCodec]]; the pipeline resolves
    * the codec per partition instead.) */
  def pngEncode(bytes: Array[Byte], w: Int = ImgWidth): Array[Byte] =
    new PngCodec().encode(grayImageOf(bytes, w))

  /** Typed record from a REAL decode of a PNG payload. */
  final case class ImageFeature(doc_id: Long, width: Int, height: Int,
      n_bytes: Int, png_bytes: Int, mean_px_micros: Long)

  /** Decode `png` and extract features over the first `n` pixels (the
    * payload bytes; the tail of the last row is padding). mean is an
    * exact half-away integer-micros ratio. */
  def pngDecodeFeatures(id: Long, n: Int, png: Array[Byte],
      codec: PngCodec = new PngCodec()): ImageFeature = {
    val img = codec.decode(png)
    val raster = img.getRaster
    val w = img.getWidth
    var sum = 0L
    var i = 0
    while (i < n) { sum += raster.getSample(i % w, i / w, 0); i += 1 }
    ImageFeature(id, w, img.getHeight, n, png.length,
      if (n == 0) 0L else (2L * sum * 1000000L + n) / (2L * n))
  }

  /** documents → REAL PNG payload column → REAL ImageIO decode →
    * per-image features. Both codec stages run partition-local
    * (`mapPartitions`), the batch shape a 100 TB image corpus needs;
    * rows-checked + spec'd (a codec isn't ANSI-SQL-expressible — the
    * spec pins the lossless round-trip and the exact feature values
    * against a direct byte recompute). */
  def imageFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // the test corpus is ONE parquet row group ⇒ one scan task would
      // run the whole codec stage single-threaded; spread the per-row-
      // heavy compute across the cluster first (PLANS §5 — a no-op cost
      // at real file counts, a ~5× win here: 1.5 s → ~0.3 s at sf0.1)
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val codec = new PngCodec() // per-partition setup — see PngCodec
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          pngDecodeFeatures(id, bytes.length,
            codec.encode(grayImageOf(bytes, ImgWidth)), codec)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** md5 hex of the DECODED payload bytes, through the REAL codec
    * round-trips (r16 — the q47 fingerprint rule at PAYLOAD
    * granularity, the exact-dedup key for
    * [[graft.operators.PipelineOps.q205]]):
    *
    *  - `image`: PNG-encode → ImageIO-decode → the payload pixels
    *    (first n bytes; the last row's tail is padding, excluded
    *    exactly as [[pngDecodeFeatures]]);
    *  - `audio`: WAV-encode → AudioSystem-decode → the byte stream
    *    recovered from the PCM samples ([[wavEncode]]'s injection
    *    inverted: b = (s >> 8) + 128).
    *
    * Both round-trips are lossless, so the fingerprint provably equals
    * md5 over the source bytes (spec-pinned) — which is what makes the
    * dedup readout FULL-oracle-checkable (DuckDB replays `md5(text)`)
    * while the engine actually fingerprints what a media corpus has:
    * the decoded payload. Partition-local codec reuse, one MessageDigest
    * per partition — the mapPartitions batch shape of every codec
    * stage here. */
  def payloadFingerprints(s: SparkSession, docs: DataFrame,
      modality: String): DataFrame = {
    import s.implicits._
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val base = docs.select(col("doc_id"), col("text")).as[(Long, String)]
    val fps = modality match {
      case "image" => base.mapPartitions { it =>
        val codec = new PngCodec()
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val img = codec.decode(codec.encode(grayImageOf(bytes, ImgWidth)))
          val raster = img.getRaster
          val out = new Array[Byte](bytes.length)
          var i = 0
          while (i < bytes.length) {
            out(i) = raster.getSample(i % ImgWidth, i / ImgWidth, 0).toByte
            i += 1
          }
          md.reset()
          (id, hex(md.digest(out)))
        }
      }
      case "audio" => base.mapPartitions { it =>
        val codec = new WavCodec()
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val ais = codec.open(codec.encode(bytes))
          val pcm = ais.readAllBytes()
          ais.close()
          val out = new Array[Byte](pcm.length / 2)
          var i = 0
          while (i < out.length) {
            val sm = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
            out(i) = ((sm >> 8) + 128).toByte
            i += 1
          }
          md.reset()
          (id, hex(md.digest(out)))
        }
      }
      case other => sys.error(s"no payload codec for modality '$other'")
    }
    fps.toDF("doc_id", "fp")
  }

  // --- REAL audio codec pipeline (r8) --------------------------------------
  /** The audio half of the decode gap, closed the same way as q135:
    * `javax.sound.sampled` ships with the JDK (WAV/AU/AIFF container +
    * linear-PCM codec in java.desktop, pure stream I/O — no audio
    * device, headless-safe). Each doc's bytes synthesize to a genuine
    * 16-bit signed little-endian mono PCM WAV payload column (what an
    * audio corpus ships as), and the feature stage parses that payload
    * back through AudioSystem and reads samples — both stages
    * partition-local, features exact integers (spec-pinned against a
    * direct byte-level recompute; the round-trip is lossless because
    * linear PCM in a WAV container is). The video container followed in
    * late r8 ([[videoFeatures]], Y4M demux); only compressed video
    * essence remains declared out (no JDK codec, §6). */
  val AudioRate = 8000f

  /** Per-partition codec handles, resolved ONCE via ServiceLoader.
    *
    * `AudioSystem.getAudioInputStream`/`write` re-resolve their SPI
    * provider lists on EVERY call through a synchronized JVM-global
    * registry (JDK13Services) — measured here: spreading the audio
    * stage over 32 tasks made it 2.5× SLOWER than one task because
    * every row serialized on that lock. Resolving the WAVE
    * reader/writer once per partition is exactly what the
    * mapPartitions batch pattern exists for (per-partition codec
    * setup), and the row path then runs lock-free and parallel. */
  final class WavCodec {
    import javax.sound.sampled._
    import scala.jdk.CollectionConverters._
    private val writer = java.util.ServiceLoader
      .load(classOf[spi.AudioFileWriter]).asScala
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider in this JDK"))
    private val readers = java.util.ServiceLoader
      .load(classOf[spi.AudioFileReader]).asScala.toList

    def encode(bytes: Array[Byte]): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        AudioRate, 16, 1, 2, AudioRate, false)
      val pcm = new Array[Byte](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val s = ((bytes(i) & 0xff) - 128) << 8
        pcm(2 * i) = (s & 0xff).toByte // little-endian
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, bytes.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      writer.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def open(wav: Array[Byte]): AudioInputStream = {
      val it = readers.iterator
      while (it.hasNext) {
        try return it.next().getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        catch { case _: UnsupportedAudioFileException => () }
      }
      sys.error("no AudioFileReader provider accepted the WAV payload")
    }
  }

  /** Synthesize bytes as a [[AudioRate]] Hz 16-bit mono WAV: byte i
    * becomes the centered sample ((b−128) << 8) — injective, so the
    * decode side can recover the exact byte stream. (One-shot
    * convenience over [[WavCodec]]; the pipeline resolves the codec
    * per partition instead.) */
  def wavEncode(bytes: Array[Byte]): Array[Byte] =
    new WavCodec().encode(bytes)

  /** Typed record from a REAL decode of a WAV payload. Every feature is
    * a deterministic integer: peak and mean-abs amplitude (half-away
    * integer micros) and the zero-crossing count — the standard cheap
    * audio quality/energy signals. */
  final case class AudioFeature(doc_id: Long, sample_rate: Int, bits: Int,
      n_samples: Long, wav_bytes: Int, peak_abs: Long, mean_abs_micros: Long,
      zero_crossings: Long)

  /** Parse `wav` (header + PCM payload) and extract exact integer
    * features over the decoded samples. */
  def wavDecodeFeatures(id: Long, wav: Array[Byte],
      codec: WavCodec = new WavCodec()): AudioFeature = {
    val ais = codec.open(wav)
    val fmt = ais.getFormat
    val pcm = ais.readAllBytes()
    ais.close()
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected 16-bit little-endian PCM, got $fmt")
    val n = pcm.length / 2
    var sumAbs = 0L; var peak = 0L; var zc = 0L
    var prevNonNeg = true
    var i = 0
    while (i < n) {
      val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff) // signed high byte
      val a = math.abs(s.toLong)
      sumAbs += a
      if (a > peak) peak = a
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      i += 1
    }
    AudioFeature(id, fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
      n.toLong, wav.length, peak,
      if (n == 0) 0L else (2L * sumAbs * 1000000L + n) / (2L * n), zc)
  }

  /** documents → REAL WAV payload column → REAL AudioSystem decode →
    * per-clip features. Both codec stages run partition-local
    * (`mapPartitions`), the batch shape a 100 TB audio corpus needs;
    * rows-checked + spec'd (a codec isn't ANSI-SQL-expressible — the
    * spec pins the lossless sample round-trip and the exact feature
    * values against a direct byte recompute). */
  def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // NO spreading repartition here, deliberately (contrast
      // imageFeatures): WAV linear PCM has no compression stage, so the
      // per-row cost is a short byte loop — measured, the repartition's
      // shuffle + 32-task scheduling costs MORE than it buys at test SF
      // (0.47 s single-task vs 0.85 s spread). At real file counts the
      // scan is already many partitions and the same per-partition
      // codec runs wide.
      .as[(Long, String)]
      .mapPartitions { it =>
        val codec = new WavCodec() // per-partition setup — see WavCodec
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          wavDecodeFeatures(id, codec.encode(bytes), codec)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Compressibility proxy the ORACLE can replay (r6 VERDICT #6): the
    * distinct/total character-4-gram ratio. Repetitive or templated text
    * re-uses the same few 4-grams (low ratio ⇒ highly compressible ⇒
    * low quality), natural text keeps the ratio high — the same signal
    * [[compressionRatio]]'s Deflater reads, in a form both engines
    * compute exactly: integer gram counts + the 6-decimal integer-micros
    * ratio. The Deflater form stays as the spec-only component (a real
    * pipeline may prefer the true codec; it just can't be hash-checked
    * cross-engine).
    *
    * Plan shape: per-row-local expression work only (slice/zip/distinct
    * over the char array — the [[graft.text.Text.shingles]] pattern, no
    * per-element re-evaluation of the lowering), no shuffle at all
    * before the output sort. */
  def ngramRatio(s: SparkSession, dir: String): DataFrame = {
    val lt = lower(col("text"))
    // trailing-empty-safe char array: slice to exactly len entries
    val chars = slice(split(lt, ""), lit(1), length(lt))
    // char 4-grams, space-joined (single chars ⇒ injective, so DISTINCT
    // counts equal the substring-gram counts the oracle computes)
    val grams = graft.text.Text.shingles(chars, 4)
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        size(grams).cast("long").as("n_grams"),
        size(array_distinct(grams)).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        when(col("n_grams") === 0, 1.0)
          .otherwise(graft.functions.Num.ratio6(col("n_distinct"), col("n_grams")))
          .as("ratio"))
      .orderBy(col("doc_id"))
  }

  val ngramRatioSql: String =
    s"""WITH d AS (SELECT doc_id, lower(text) AS lt FROM documents),
       |p AS (SELECT doc_id, lt, unnest(range(1, greatest(len(lt) - 2, 1))) AS i FROM d),
       |g AS (SELECT doc_id, substr(lt, CAST(i AS INT), 4) AS gram FROM p),
       |a AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_distinct FROM g GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(greatest(len(d.lt) - 3, 0) AS BIGINT) AS n_grams,
       |  CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       |  CASE WHEN len(d.lt) < 4 THEN 1.0
       |    ELSE ${graft.functions.Num.ratio6Sql(
                "COALESCE(a.n_distinct, 0)", "len(d.lt) - 3")} END AS ratio
       |FROM d LEFT JOIN a USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --- REAL video container pipeline (r8) ----------------------------------
  /** The video third of the decode gap, closed with a REAL container:
    * YUV4MPEG2 ("Y4M" — the uncompressed interchange format
    * ffmpeg/mjpegtools read and write; plain-ASCII stream header +
    * `FRAME` markers + raw planar frames, spec public since mjpegtools).
    * Uncompressed is the point: a Y4M demuxer IS the whole decode — the
    * format carries no codec — so pure-JDK byte parsing covers it end to
    * end the way ImageIO covered PNG (q135) and javax.sound covered WAV
    * (q136). What remains out of scope is COMPRESSED video essence
    * (H.264/VP9 — no JDK codec), declared in §6.
    *
    * Each doc's bytes synthesize to a genuine mono Y4M clip (byte i is
    * the luma of pixel i, row-major across [[VidW]]×[[VidH]] frames;
    * zero-padded tail, exact length carried in an `Xgraftlen` header
    * extension — X-parameters are part of the Y4M grammar, so the
    * payload stays a conforming stream and the round-trip stays
    * injective). The decode stage parses the header (W/H/F/C tokens),
    * walks the FRAME markers, SAMPLES every [[VidEvery]]-th frame (the
    * 100 TB shape: featurize a stride, never every frame), and emits
    * exact integer features per sampled frame. Both stages
    * partition-local; no SPI registry is involved (contrast
    * [[WavCodec]]) so there is nothing to resolve per partition. */
  val VidW = 16
  val VidH = 8
  val VidEvery = 2

  /** Synthesize `bytes` as a conforming YUV4MPEG2 mono stream. */
  def y4mEncode(bytes: Array[Byte], w: Int = VidW, h: Int = VidH): Array[Byte] = {
    val fsz = w * h
    val nFrames = math.max(1, (bytes.length + fsz - 1) / fsz)
    val bos = new java.io.ByteArrayOutputStream(
      64 + nFrames * (6 + fsz))
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono Xgraftlen=${bytes.length}\n"
      .getBytes("US-ASCII"))
    val frame = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < nFrames) {
      bos.write(frame)
      val base = f * fsz
      var i = 0
      while (i < fsz) {
        val p = base + i
        bos.write(if (p < bytes.length) bytes(p) & 0xff else 0)
        i += 1
      }
      f += 1
    }
    bos.toByteArray
  }

  /** Typed record from a REAL parse of a Y4M payload: header fields,
    * frame inventory, and per-SAMPLED-frame exact integer features
    * (checksum + half-away integer-micros mean luma), plus the global
    * peak luma over sampled frames. */
  final case class VideoFeature(doc_id: Long, width: Int, height: Int,
      fps_num: Int, fps_den: Int, n_frames: Int, n_sampled: Int,
      payload_bytes: Int, orig_len: Int, peak_luma: Int,
      frame_checksums: Seq[Long], frame_mean_micros: Seq[Long])

  /** Parse a YUV4MPEG2 stream: validate the signature, read the header
    * parameters, demux frames, and featurize every `every`-th frame.
    * Strict by contract — a malformed stream throws rather than
    * degrades (a corrupt corpus shard should fail loudly). */
  def y4mDecodeFeatures(id: Long, y4m: Array[Byte],
      every: Int = VidEvery): VideoFeature = {
    val Magic = "YUV4MPEG2"
    var nl = 0
    while (nl < y4m.length && y4m(nl) != '\n') nl += 1
    require(nl < y4m.length, "y4m: unterminated stream header")
    val header = new String(y4m, 0, nl, "US-ASCII")
    val toks = header.split(' ')
    require(toks.head == Magic, s"y4m: bad signature '${toks.head}'")
    var (w, h, fn, fd, glen) = (-1, -1, -1, -1, -1)
    var mono = false
    toks.tail.foreach { t =>
      // consecutive spaces yield an empty token; fail it through the same
      // require-based contract as every other malformed-stream path (a
      // bare charAt would throw StringIndexOutOfBounds instead)
      require(t.nonEmpty, s"y4m: empty header token (consecutive spaces) in '$header'")
      t.charAt(0) match {
        case 'W' => w = t.tail.toInt
        case 'H' => h = t.tail.toInt
        case 'F' =>
          val Array(a, b) = t.tail.split(':'); fn = a.toInt; fd = b.toInt
        case 'C' => mono = t.tail == "mono"
        case 'X' => if (t.startsWith("Xgraftlen=")) glen = t.drop(10).toInt
        case _ => () // I/A and future parameters: tolerated, unused
      }
    }
    require(w > 0 && h > 0, s"y4m: missing frame geometry in '$header'")
    require(mono, "y4m: this demuxer handles Cmono planar streams")
    val fsz = w * h
    val frameMark = "FRAME".getBytes("US-ASCII")
    var pos = nl + 1
    var nFrames = 0; var nSampled = 0; var peak = 0
    val sums = Seq.newBuilder[Long]
    val means = Seq.newBuilder[Long]
    while (pos < y4m.length) {
      require(pos + frameMark.length <= y4m.length &&
        frameMark.indices.forall(i => y4m(pos + i) == frameMark(i)),
        s"y4m: expected FRAME marker at byte $pos")
      pos += frameMark.length
      while (pos < y4m.length && y4m(pos) != '\n') pos += 1 // frame params
      require(pos < y4m.length, "y4m: unterminated FRAME header")
      pos += 1
      require(pos + fsz <= y4m.length, s"y4m: truncated frame $nFrames")
      if (nFrames % every == 0) {
        var sum = 0L; var lum = 0L
        var i = 0
        while (i < fsz) {
          val v = y4m(pos + i) & 0xff
          sum = (sum * 31 + v) & 0xffffffffL
          lum += v
          if (v > peak) peak = v
          i += 1
        }
        sums += sum
        means += (2L * lum * 1000000L + fsz) / (2L * fsz)
        nSampled += 1
      }
      pos += fsz
      nFrames += 1
    }
    require(nFrames > 0, "y4m: stream carries no frames")
    VideoFeature(id, w, h, fn, fd, nFrames, nSampled, y4m.length,
      glen, peak, sums.result(), means.result())
  }

  /** Recover the original byte stream from a Y4M clip ([[y4mEncode]]'s
    * inverse): concatenated frame luma truncated to the `Xgraftlen`
    * header value. Spec uses this to pin the lossless round-trip. */
  def y4mDecodeBytes(y4m: Array[Byte]): Array[Byte] = {
    var nl = 0
    while (nl < y4m.length && y4m(nl) != '\n') nl += 1
    val header = new String(y4m, 0, nl, "US-ASCII").split(' ')
    val w = header.find(_.startsWith("W")).get.tail.toInt
    val h = header.find(_.startsWith("H")).get.tail.toInt
    val glen = header.find(_.startsWith("Xgraftlen=")).get.drop(10).toInt
    val fsz = w * h
    val out = new java.io.ByteArrayOutputStream(glen)
    var pos = nl + 1
    while (pos < y4m.length && out.size < glen) {
      while (pos < y4m.length && y4m(pos) != '\n') pos += 1 // FRAME line
      pos += 1
      val take = math.min(fsz, glen - out.size)
      out.write(y4m, pos, take)
      pos += fsz
    }
    out.toByteArray
  }

  /** One SAMPLED frame of a decoded clip — the registered, driver-checkable
    * row shape (all scalar columns: the driver's comparator sorts rows
    * through pandas, which cannot sort array cells — r8's one red entry).
    * `frame_idx` is the ORIGINAL frame number (0, every, 2·every, …), so
    * the row is self-describing without the sampled-order context. */
  final case class VideoFrameFeature(doc_id: Long, width: Int, height: Int,
      fps_num: Int, fps_den: Int, n_frames: Int, n_sampled: Int,
      payload_bytes: Int, orig_len: Int, peak_luma: Int,
      frame_idx: Int, checksum: Long, mean_micros: Long)

  /** documents → REAL Y4M payload column → REAL container demux →
    * stride-sampled per-frame features, EXPLODED to one row per sampled
    * frame (r9: the r8 form carried two `array<bigint>` columns, which the
    * driver's rows-check cannot sort — the typed per-frame row is both
    * checkable and more informative; the array form stays available via
    * [[y4mDecodeFeatures]] for the round-trip spec). Both stages
    * partition-local (`mapPartitions`); rows-checked + spec'd (a container
    * demux isn't ANSI-SQL-expressible — the spec pins the lossless byte
    * round-trip, header fields, frame inventory, and features against a
    * direct recompute). Unspread like [[audioFeatures]] (pure byte loops,
    * no compression stage — the repartition costs more than it buys at
    * test SF; real file counts arrive already wide). */
  def videoFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val v = y4mDecodeFeatures(id, y4mEncode(text.getBytes("UTF-8")))
        v.frame_checksums.indices.iterator.map { k =>
          VideoFrameFeature(v.doc_id, v.width, v.height, v.fps_num,
            v.fps_den, v.n_frames, v.n_sampled, v.payload_bytes, v.orig_len,
            v.peak_luma, k * VidEvery, v.frame_checksums(k),
            v.frame_mean_micros(k))
        }
      })
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // --- REAL COMPRESSED video pipeline (r12): MJPEG essence in AVI ----------
  /** Closes the compressed-ESSENCE half of the video gap for the one
    * video codec the JDK actually ships: baseline JPEG (ImageIO), i.e.
    * Motion-JPEG in an AVI container (RIFF 'MJPG' — the oldest
    * production video format still in service; RIFF/AVI grammar public
    * since 1992). The honest decomposition a lossy pipeline needs, each
    * half pinned separately: the CONTAINER round-trip is LOSSLESS (the
    * demuxed per-frame essence is byte-equal to what was muxed —
    * spec-pinned), while the ESSENCE is lossy with a measured, bounded
    * reconstruction error (JPEG DCT quantization; the registered rows
    * carry exact integer features of the DECODED pixels, and the spec
    * pins a mean-abs-error ceiling against the source frame).
    * H.264/VP9 essence remains declared out (§6 — no JDK codec).
    *
    * Scale shape: both mux and demux+decode run partition-local over the
    * payload rows ([[imageFeatures]]'s spread — JPEG DCT is real compute,
    * unlike the Y4M byte walk); only fixed-width feature rows shuffle. */
  val MjpgW = 32
  val MjpgH = 32
  val MjpgEvery = 2

  /** Per-partition JPEG codec handles (the [[PngCodec]] rationale:
    * registry resolution + disk-cached streams per call otherwise). */
  final class JpegCodec {
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(img)
      ios.flush()
      writer.setOutput(null)
      bos.toByteArray
    }

    def decode(jpeg: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(jpeg))
      reader.setInput(iis)
      val img = reader.read(0)
      reader.setInput(null)
      img
    }
  }

  /** One w×h gray8 frame from `bytes` starting at `off` (zero-padded). */
  private def grayFrameOf(bytes: Array[Byte], off: Int, w: Int,
      h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      val p = off + i
      raster.setSample(i % w, i / w, 0,
        if (p < bytes.length) bytes(p) & 0xff else 0)
      i += 1
    }
    img
  }

  private def writeLe32(bos: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
    bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
  }
  private def writeLe16(bos: java.io.ByteArrayOutputStream, v: Int): Unit = {
    bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
  }
  private def readLe32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, "US-ASCII")

  /** One RIFF chunk: id + LE size + body + word-alignment pad. */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(9 + body.length)
    bos.write(id.getBytes("US-ASCII"), 0, 4)
    writeLe32(bos, body.length)
    bos.write(body, 0, body.length)
    if (body.length % 2 == 1) bos.write(0)
    bos.toByteArray
  }

  /** One RIFF LIST: 'LIST' + LE size + type fourcc + parts. */
  private def riffList(typ: String, parts: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(
      12 + parts.map(_.length).sum)
    bos.write("LIST".getBytes("US-ASCII"), 0, 4)
    writeLe32(bos, 4 + parts.map(_.length).sum)
    bos.write(typ.getBytes("US-ASCII"), 0, 4)
    parts.foreach(p => bos.write(p, 0, p.length))
    bos.toByteArray
  }

  val MjpgUsPerFrame = 40000 // 25 fps

  /** Mux `bytes` as a conforming single-stream MJPEG AVI: each
    * [[MjpgW]]×[[MjpgH]] gray frame JPEG-encoded and carried as a
    * '00dc' chunk inside the 'movi' LIST; the original byte length rides
    * in a private 'grft' chunk (RIFF readers skip unknown chunks by
    * grammar, so the file stays conforming). */
  def aviMjpegEncode(bytes: Array[Byte], w: Int = MjpgW, h: Int = MjpgH,
      codec: JpegCodec = new JpegCodec()): Array[Byte] = {
    val fsz = w * h
    val nFrames = math.max(1, (bytes.length + fsz - 1) / fsz)
    val jpegs = (0 until nFrames).map(f =>
      codec.encode(grayFrameOf(bytes, f * fsz, w, h)))
    val maxJpeg = jpegs.map(_.length).max

    val avih = new java.io.ByteArrayOutputStream(56)
    writeLe32(avih, MjpgUsPerFrame) // dwMicroSecPerFrame
    writeLe32(avih, 0) // dwMaxBytesPerSec
    writeLe32(avih, 0) // dwPaddingGranularity
    writeLe32(avih, 0) // dwFlags
    writeLe32(avih, nFrames) // dwTotalFrames
    writeLe32(avih, 0) // dwInitialFrames
    writeLe32(avih, 1) // dwStreams
    writeLe32(avih, maxJpeg) // dwSuggestedBufferSize
    writeLe32(avih, w); writeLe32(avih, h)
    (0 until 4).foreach(_ => writeLe32(avih, 0)) // dwReserved

    val strh = new java.io.ByteArrayOutputStream(56)
    strh.write("vids".getBytes("US-ASCII"), 0, 4) // fccType
    strh.write("MJPG".getBytes("US-ASCII"), 0, 4) // fccHandler
    writeLe32(strh, 0) // dwFlags
    writeLe16(strh, 0); writeLe16(strh, 0) // wPriority, wLanguage
    writeLe32(strh, 0) // dwInitialFrames
    writeLe32(strh, 1) // dwScale
    writeLe32(strh, 1000000 / MjpgUsPerFrame) // dwRate (fps)
    writeLe32(strh, 0) // dwStart
    writeLe32(strh, nFrames) // dwLength
    writeLe32(strh, maxJpeg) // dwSuggestedBufferSize
    writeLe32(strh, 0) // dwQuality
    writeLe32(strh, 0) // dwSampleSize
    writeLe16(strh, 0); writeLe16(strh, 0) // rcFrame left, top
    writeLe16(strh, w); writeLe16(strh, h) // rcFrame right, bottom

    val strf = new java.io.ByteArrayOutputStream(40)
    writeLe32(strf, 40) // biSize
    writeLe32(strf, w); writeLe32(strf, h)
    // biBitCount/biSizeImage describe the DECODED essence, which is 8-bit
    // grayscale here (TYPE_BYTE_GRAY JPEG frames) — an external reader
    // planning buffers from this header must not be told 24-bit RGB
    writeLe16(strf, 1); writeLe16(strf, 8) // biPlanes, biBitCount
    strf.write("MJPG".getBytes("US-ASCII"), 0, 4) // biCompression
    writeLe32(strf, w * h) // biSizeImage
    (0 until 4).foreach(_ => writeLe32(strf, 0)) // ppm/clr fields

    val hdrl = riffList("hdrl", Seq(
      riffChunk("avih", avih.toByteArray),
      riffList("strl", Seq(riffChunk("strh", strh.toByteArray),
        riffChunk("strf", strf.toByteArray)))))
    val grftBody = new java.io.ByteArrayOutputStream(4)
    writeLe32(grftBody, bytes.length)
    val grft = riffChunk("grft", grftBody.toByteArray)
    val movi = riffList("movi", jpegs.map(riffChunk("00dc", _)))

    val out = new java.io.ByteArrayOutputStream(
      12 + hdrl.length + grft.length + movi.length)
    out.write("RIFF".getBytes("US-ASCII"), 0, 4)
    writeLe32(out, 4 + hdrl.length + grft.length + movi.length)
    out.write("AVI ".getBytes("US-ASCII"), 0, 4)
    out.write(hdrl, 0, hdrl.length)
    out.write(grft, 0, grft.length)
    out.write(movi, 0, movi.length)
    out.toByteArray
  }

  /** Demuxed clip header + per-frame JPEG essence, byte-exact. */
  final case class MjpegClip(width: Int, height: Int, usPerFrame: Int,
      totalFrames: Int, origLen: Int, jpegs: Seq[Array[Byte]])

  /** Parse an MJPEG AVI: validate the RIFF/AVI signature, read the
    * main header, and collect every '00dc' frame chunk byte-exact.
    * Strict by contract — a malformed container throws (the
    * [[y4mDecodeFeatures]] rule: corrupt shards fail loudly). */
  def aviMjpegDemux(avi: Array[Byte]): MjpegClip = {
    require(avi.length >= 12 && fourcc(avi, 0) == "RIFF" &&
      fourcc(avi, 8) == "AVI ", "avi: bad RIFF/AVI signature")
    var (w, h, us, total, origLen) = (-1, -1, -1, -1, -1)
    val jpegs = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourcc(avi, pos)
        val size = readLe32(avi, pos + 4)
        // a crafted LE32 size can be negative (walk would loop forever or
        // move backwards) or near Int.MaxValue (pos + 8 + size overflows
        // past the truncation check) — bound it overflow-free first
        require(size >= 0 && size <= to - pos - 8,
          s"avi: bad/truncated chunk '$id' size $size at $pos")
        id match {
          case "LIST" =>
            fourcc(avi, pos + 8) match {
              case "hdrl" | "strl" | "movi" => walk(pos + 12, pos + 8 + size)
              case _ => () // unknown list: skipped by grammar
            }
          case "avih" =>
            us = readLe32(avi, pos + 8)
            total = readLe32(avi, pos + 8 + 16)
            w = readLe32(avi, pos + 8 + 32)
            h = readLe32(avi, pos + 8 + 36)
          case "grft" => origLen = readLe32(avi, pos + 8)
          case "00dc" =>
            jpegs += java.util.Arrays.copyOfRange(avi, pos + 8, pos + 8 + size)
          case _ => () // strh/strf/JUNK/…: not needed here
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, avi.length)
    val fs = jpegs.result()
    require(w > 0 && h > 0 && total == fs.length,
      s"avi: header/frame inventory mismatch ($total declared, ${fs.length} found)")
    MjpegClip(w, h, us, total, origLen, fs)
  }

  /** One SAMPLED frame of a decoded MJPEG clip — the registered,
    * driver-checkable scalar row shape (the [[VideoFrameFeature]] rule).
    * `jpeg_bytes` is that frame's COMPRESSED essence size; checksum and
    * mean are exact integers over the DECODED pixels. */
  final case class VideoMjpegFrameFeature(doc_id: Long, width: Int,
      height: Int, us_per_frame: Int, n_frames: Int, n_sampled: Int,
      payload_bytes: Int, orig_len: Int, frame_idx: Int, jpeg_bytes: Int,
      checksum: Long, mean_micros: Long)

  /** documents → REAL MJPEG-AVI payload column → REAL demux + ImageIO
    * JPEG decode → stride-sampled per-frame features. Rows-checked +
    * spec'd (a lossy codec isn't ANSI-SQL-expressible; the spec pins the
    * byte-exact container round-trip, header fields, the bounded essence
    * error, and decode determinism). Spread like [[imageFeatures]]
    * (JPEG DCT is real per-row compute). */
  def mjpegFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val codec = new JpegCodec() // per-partition setup — see JpegCodec
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val avi = aviMjpegEncode(bytes, MjpgW, MjpgH, codec)
          val clip = aviMjpegDemux(avi)
          val sampled = clip.jpegs.indices.filter(_ % MjpgEvery == 0)
          sampled.iterator.map { fi =>
            val img = codec.decode(clip.jpegs(fi))
            val raster = img.getRaster
            var cs = 0L; var lum = 0L
            var i = 0
            val fsz = clip.width * clip.height
            while (i < fsz) {
              val v = raster.getSample(i % clip.width, i / clip.width, 0)
              cs = (cs * 31 + v) & 0xffffffffL
              lum += v
              i += 1
            }
            VideoMjpegFrameFeature(id, clip.width, clip.height,
              clip.usPerFrame, clip.totalFrames, sampled.length, avi.length,
              clip.origLen, fi, clip.jpegs(fi).length, cs,
              (2L * lum * 1000000L + fsz) / (2L * fsz))
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // --- REAL COMPRESSED audio pipeline (r12): G.711 µ-law -------------------
  /** Closes the compressed-ESSENCE half of the audio gap for the codec
    * the JDK actually ships: G.711 µ-law (javax.sound's ULAW
    * FormatConversionProvider — 8-bit logarithmic companding, the
    * telephony standard since 1972; WAV format tag 7). Genuinely lossy
    * compression (2× smaller than 16-bit PCM) with a BOUNDED
    * quantization error — the registered rows carry `max_abs_err`
    * against the synthesized source samples, so the lossy bound is part
    * of the operator's output, and the spec pins its ceiling. */
  final class UlawCodec {
    import javax.sound.sampled._
    import scala.jdk.CollectionConverters._
    private val writer = java.util.ServiceLoader
      .load(classOf[spi.AudioFileWriter]).asScala
      .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter provider in this JDK"))
    private val readers = java.util.ServiceLoader
      .load(classOf[spi.AudioFileReader]).asScala.toList
    private val converters = java.util.ServiceLoader
      .load(classOf[spi.FormatConversionProvider]).asScala.toList

    private def convert(target: AudioFormat,
        ais: AudioInputStream): AudioInputStream =
      converters.find(_.isConversionSupported(target, ais.getFormat))
        .map(_.getAudioInputStream(target, ais))
        .getOrElse(sys.error(
          s"no conversion provider ${ais.getFormat.getEncoding} → ${target.getEncoding}"))

    /** bytes → 16-bit PCM samples ((b−128)<<8, the [[WavCodec]] synth) →
      * µ-law compressed → WAV container. */
    def encode(bytes: Array[Byte]): Array[Byte] = {
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        AudioRate, 16, 1, 2, AudioRate, false)
      val pcm = new Array[Byte](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val s = ((bytes(i) & 0xff) - 128) << 8
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val pcmAis = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), pcmFmt, bytes.length.toLong)
      val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
        AudioRate, 8, 1, 1, AudioRate, false)
      val bos = new java.io.ByteArrayOutputStream()
      writer.write(convert(ulawFmt, pcmAis), AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a µ-law WAV back to (sampleRate, 16-bit LE PCM). */
    def decodePcm(wav: Array[Byte]): (Int, Array[Byte]) = {
      val it = readers.iterator
      var ais: AudioInputStream = null
      while (ais == null && it.hasNext) {
        try ais = it.next().getAudioInputStream(
          new java.io.ByteArrayInputStream(wav))
        catch { case _: UnsupportedAudioFileException => () }
      }
      require(ais != null, "no AudioFileReader provider accepted the WAV payload")
      val fmt = ais.getFormat
      require(fmt.getEncoding == AudioFormat.Encoding.ULAW,
        s"ulaw: payload is ${fmt.getEncoding}, not ULAW")
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        fmt.getSampleRate, 16, 1, 2, fmt.getSampleRate, false)
      val pcm = convert(pcmFmt, ais).readAllBytes()
      ais.close()
      (fmt.getSampleRate.toInt, pcm)
    }
  }

  /** Typed record from a REAL µ-law decode: the [[AudioFeature]]
    * signals over the DECODED samples, plus the compression receipt
    * (`ulaw_bytes` < `pcm_bytes`) and the measured companding bound
    * (`max_abs_err` vs the synthesized source). */
  final case class UlawFeature(doc_id: Long, sample_rate: Int,
      ulaw_bytes: Int, pcm_bytes: Int, n_samples: Long, peak_abs: Long,
      mean_abs_micros: Long, zero_crossings: Long, max_abs_err: Long)

  def ulawDecodeFeatures(id: Long, bytes: Array[Byte],
      codec: UlawCodec = new UlawCodec()): UlawFeature = {
    val wav = codec.encode(bytes)
    val (rate, pcm) = codec.decodePcm(wav)
    val n = pcm.length / 2
    var peak = 0L; var sumAbs = 0L; var zc = 0L; var maxErr = 0L
    var prevNonNeg = true
    var i = 0
    while (i < n) {
      val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
      val orig =
        if (i < bytes.length) ((bytes(i) & 0xff) - 128) << 8 else 0
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumAbs += a
      val err = math.abs((s - orig).toLong)
      if (err > maxErr) maxErr = err
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      i += 1
    }
    UlawFeature(id, rate, wav.length, 2 * n, n.toLong, peak,
      if (n == 0) 0L else (2L * sumAbs * 1000000L + n) / (2L * n),
      zc, maxErr)
  }

  /** documents → REAL µ-law WAV payload column → REAL javax.sound
    * decode → per-clip features with the measured companding bound.
    * Unspread like [[audioFeatures]] (companding is a table lookup per
    * sample — the shuffle costs more than it buys at test SF). */
  def ulawFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val codec = new UlawCodec() // per-partition setup — see UlawCodec
        it.map { case (id, text) =>
          ulawDecodeFeatures(id, text.getBytes("UTF-8"), codec)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling pipeline: binary payloads → sampled frame arrays →
    * per-frame features, exploded back to rows. Partitioned the same way
    * a video corpus would be (by payload row, frames stay local). */
  def frameFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val frames = frameSampleStub(bytes, frameSize = 32, every = 2)
        (id, frames.length, frames.map(f => decodeStub(id, f).checksum))
      })
      .toDF("doc_id", "n_frames", "frame_checksums")
      .orderBy(col("doc_id"))
  }
}
