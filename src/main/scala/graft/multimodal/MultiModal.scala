package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-binary ("multimodal") column plumbing (SURVEY §2 row 56).
  *
  * Pattern for image/audio/video at 100 TB: payloads ride as `binary`
  * columns next to typed metadata; decode/feature-extraction runs as a
  * partition-local batch transform (the Scala analogue of `mapInPandas`)
  * so the decoder amortizes per-partition setup and never touches the
  * driver. The decode step itself is STUBBED (no media libs in this
  * environment) with a deterministic byte-level fake — the Spark-side
  * contract (schema, encoders, partition batching) is real and tested.
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
