package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-shaped feature
  * extraction over `mapPartitions` (the Scala analogue of a
  * `mapInPandas` batch UDF).
  *
  * The IMAGE decode path is REAL for binary PPM (P6) — a pure-JVM
  * parser plus an actual nearest-neighbor pixel resample
  * ([[decodePpm]]/[[resampleNearest]], r8) — so crafted image bytes
  * decode end-to-end with pixels asserted in `MultimodalSpec`.
  * Compressed formats (JPEG/WAV/MP4) remain clearly-marked STUBS —
  * the container has no codec libraries — producing deterministic
  * fake features from the byte stream. The Spark-side plumbing is
  * real either way: schema (binary + metadata struct), partition-
  * parallel batch processing, and a typed `Dataset` boundary,
  * exactly the shape a full multi-codec decoder would plug into.
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

  /** A decoded raster image: RGB bytes, row-major interleaved. */
  final case class RasterImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL image decoder for binary PPM (P6) — the uncompressed public
    * Netpbm format: `P6`, whitespace/`#`-comment-separated ASCII
    * width, height, maxval (255 only), ONE whitespace byte, then
    * width·height·3 raw RGB bytes. Pure JVM, no codec dependency —
    * this closes the r7 image-decode stub for real payloads; JPEG/
    * PNG/WAV/MP4 remain out of scope in this container (no codec
    * libs) and fall through to the marked stub.
    */
  def decodePpm(bytes: Array[Byte]): RasterImage = {
    var i = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && i < bytes.length) {
        if (isWs(bytes(i))) i += 1
        else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else done = true
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"PPM: digit expected at byte $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9' && v <= 100000) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "PPM: not P6")
    i = 2
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(w > 0 && h > 0, s"PPM: bad dimensions ${w}x$h")
    require(maxval == 255, s"PPM: only maxval 255 supported, got $maxval")
    require(i < bytes.length && isWs(bytes(i)), "PPM: single whitespace after maxval")
    i += 1
    val n = w * h * 3
    require(bytes.length - i >= n, s"PPM: truncated pixel data (${bytes.length - i} < $n)")
    RasterImage(w, h, java.util.Arrays.copyOfRange(bytes, i, i + n))
  }

  /** [[decodePpm]] as a total function: None for anything that is not
    * a well-formed P6 — the guard that keeps synthetic text payloads
    * (and truncated real ones) on the stub path deterministically.
    */
  def tryDecodePpm(bytes: Array[Byte]): Option[RasterImage] =
    try Some(decodePpm(bytes)) catch { case _: IllegalArgumentException => None }

  /** REAL nearest-neighbor resample: target pixel (x, y) takes source
    * pixel (⌊x·W/tw⌋, ⌊y·H/th⌋) — actual pixel movement, not the
    * r7 dimension-only arithmetic.
    */
  def resampleNearest(img: RasterImage, tw: Int, th: Int): RasterImage = {
    require(tw > 0 && th > 0, s"bad target ${tw}x$th")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        val si = (sy * img.width + sx) * 3
        val di = (y * tw + x) * 3
        out(di) = img.pixels(si)
        out(di + 1) = img.pixels(si + 1)
        out(di + 2) = img.pixels(si + 2)
        x += 1
      }
      y += 1
    }
    RasterImage(tw, th, out)
  }

  /** Decoder front door: a payload that parses as P6 decodes for REAL
    * (true dimensions off the header — `MultimodalSpec` asserts
    * pixels end-to-end via [[resampleImages]]); everything else takes
    * the clearly-marked stub (deterministic fake dimensions from the
    * byte stream, so the plumbing stays testable on synthetic
    * payloads and the `x_multimodal_meta` oracle is unchanged).
    */
  private def decode(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val checksum = byteRollingHash(r.payload, 0, r.payload.length)
    val b0 = if (n > 0) r.payload(0) & 0xff else 0
    val b1 = if (n > 1) r.payload(1) & 0xff else 0
    (r.modality, tryDecodePpm(r.payload)) match {
      case ("image", Some(img)) =>
        MediaFeatures(r.doc_id, r.modality, n, img.width, img.height, 0, checksum)
      // ??? remaining stubs: no JPEG/WAV/MP4 codecs in this container;
      // fake header parse below keeps the batch plumbing exercised
      case ("image", None) =>
        MediaFeatures(r.doc_id, r.modality, n, 16 * (b0 % 40 + 1), 16 * (b1 % 30 + 1), 0, checksum)
      case ("audio", _) =>
        MediaFeatures(r.doc_id, r.modality, n, 0, 0, 8000 * (b0 % 6 + 1), checksum)
      case _ =>
        MediaFeatures(r.doc_id, r.modality, n, 16 * (b1 % 40 + 1), 16 * (b0 % 30 + 1), 0, checksum)
    }
  }

  /** Batch feature extraction: one decoder call per record, streamed
    * per partition (batch shape = partition iterator, like a
    * mapInPandas batch). No shuffle; binary stays executor-local.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map(decode))
  }

  /** A decoded-and-resampled image with its REAL pixels. */
  final case class ResampledImage(
      doc_id: Long, width: Int, height: Int,
      orig_width: Int, orig_height: Int, pixels: Array[Byte])

  /** End-to-end REAL image path: decode P6 payloads, aspect-clamp the
    * longest side to `maxSide` (the [[resizeFeatures]] rule), and
    * nearest-neighbor-resample the actual pixels. Non-PPM payloads
    * drop out (flatMap) — the typed boundary a real multi-codec
    * decoder would widen. Map-side; payloads never shuffle.
    */
  def resampleImages(
      spark: SparkSession, media: DataFrame, maxSide: Int): Dataset[ResampledImage] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      tryDecodePpm(r.payload).map { img =>
        val longest = math.max(img.width, img.height)
        val scale = if (longest <= maxSide) 1.0 else maxSide.toDouble / longest
        val out = resampleNearest(img,
          math.max(1, math.round(img.width * scale).toInt),
          math.max(1, math.round(img.height * scale).toInt))
        ResampledImage(r.doc_id, out.width, out.height, img.width, img.height, out.pixels)
      }
    })
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
