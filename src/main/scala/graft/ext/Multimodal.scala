package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-shaped feature
  * extraction over `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF).
  *
  * The decode step is a clearly-marked STUB (`decodeStub`) — the
  * container has no image/audio codecs — producing deterministic fake
  * features from the byte stream. The Spark-side plumbing is real:
  * schema (binary + metadata struct), partition-parallel batch
  * processing, and a typed `Dataset` boundary, exactly the shape a
  * real decoder would plug into.
  *
  * Scale posture (100 TB): payloads never leave the executor — decode
  * is map-side with no shuffle; metadata-only queries prune the
  * binary column at the parquet scan (columnar at-rest means the
  * multi-KB payload bytes are not even read).
  */
object Multimodal {

  /** One media record: payload + typed metadata. */
  case class MediaRecord(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features (the decoder's output schema). */
  case class MediaFeatures(
      doc_id: Long, modality: String, n_bytes: Long,
      width: Int, height: Int, sample_rate: Int, checksum: Long)

  /** Attach a synthetic binary payload + modality to each document —
    * stands in for reading `binary` columns off parquet. Deterministic
    * (payload = utf-8 bytes of the text; modality = doc_id mod 3).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** The ONE payload rolling checksum ((acc·131 + byte) mod 1e9+7) —
    * shared by [[extractFeatures]] and [[sampleFrames]], and
    * value-identical to the native `char_rolling_hash` / the oracle
    * fold on ASCII payloads, so the constants live in one place.
    */
  private def byteRollingHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var acc = 0L
    var j = from
    while (j < until) { acc = (acc * 131 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
    acc
  }

  /** STUB decoder — a real implementation would parse the container
    * format (JPEG/WAV/MP4) here; this one derives deterministic fake
    * dimensions from the byte stream so the plumbing is testable.
    */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    // ??? real codec goes here; fake header parse below
    val b0 = if (n > 0) r.payload(0) & 0xff else 0
    val b1 = if (n > 1) r.payload(1) & 0xff else 0
    val checksum = byteRollingHash(r.payload, 0, r.payload.length)
    r.modality match {
      case "image" => MediaFeatures(r.doc_id, r.modality, n, 16 * (b0 % 40 + 1), 16 * (b1 % 30 + 1), 0, checksum)
      case "audio" => MediaFeatures(r.doc_id, r.modality, n, 0, 0, 8000 * (b0 % 6 + 1), checksum)
      case _       => MediaFeatures(r.doc_id, r.modality, n, 16 * (b1 % 40 + 1), 16 * (b0 % 30 + 1), 0, checksum)
    }
  }

  /** Batch feature extraction: one decoder call per record, streamed
    * per partition (batch shape = partition iterator, like a
    * mapInPandas batch). No shuffle; binary stays executor-local.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(decodeStub))
  }

  /** Resized record: target dims + the originals for audit. */
  case class ResizedFeatures(
      doc_id: Long, modality: String, width: Int, height: Int,
      orig_width: Int, orig_height: Int)

  /** STUB resize — a real implementation would rescale pixel data; the
    * dimension arithmetic (the part that matters to the pipeline:
    * aspect-preserving clamp of the longest side, never upscaling) is
    * real and spec-verified. Map-side, no shuffle.
    */
  def resizeFeatures(
      spark: SparkSession, feats: Dataset[MediaFeatures], maxSide: Int): Dataset[ResizedFeatures] = {
    import spark.implicits._
    feats.mapPartitions(_.map { f =>
      val longest = math.max(f.width, f.height)
      val scale = if (longest <= maxSide || longest == 0) 1.0 else maxSide.toDouble / longest
      // ??? real pixel resample goes here; dimension math is the real part
      ResizedFeatures(f.doc_id, f.modality,
        math.max(1, math.round(f.width * scale).toInt),
        math.max(1, math.round(f.height * scale).toInt),
        f.width, f.height)
    })
  }

  /** One sampled frame: fixed-width byte window of the payload. */
  case class Frame(doc_id: Long, frame_idx: Long, frame_bytes: Long, frame_checksum: Long)

  /** Frame sampling — every `step`-th fixed-`frameSize` window of the
    * payload byte stream (a real video decoder would seek keyframes;
    * the windowing, striding, ragged-tail and per-frame checksum
    * plumbing is real). flatMap shape: one input record fans out to
    * its sampled frames, map-side, payload never shuffled.
    */
  def sampleFrames(
      spark: SparkSession, media: DataFrame, frameSize: Int, step: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = r.payload.length
      val nFrames = (n + frameSize - 1) / frameSize
      (0 until nFrames by step).iterator.map { i =>
        val from = i * frameSize
        val until = math.min(from + frameSize, n)
        Frame(r.doc_id, i.toLong, (until - from).toLong, byteRollingHash(r.payload, from, until))
      }
    }
  }
}
