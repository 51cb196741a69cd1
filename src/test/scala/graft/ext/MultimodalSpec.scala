package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "an image like payload with enough bytes"),
      (1L, "audio payload text"),
      (2L, "video payload text here"),
      (3L, "x")
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
  }

  test("withPayload: binary column + modality metadata, deterministic") {
    val m = Multimodal.withPayload(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("modality"), r.getAs[Array[Byte]]("payload"))))
      .toMap
    assert(m(0L)._1 == "image" && m(1L)._1 == "audio" && m(2L)._1 == "video" && m(3L)._1 == "image")
    assert(new String(m(1L)._2, "UTF-8") == "audio payload text")
  }

  test("typed mapPartitions decoder agrees with its declarative SQL twin") {
    val typed = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
      .collect().map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.sample_rate, f.checksum))).toMap
    // the declarative twin from ExtQueries, restricted to the same docs
    val b0 = ascii(substring(col("text"), 1, 1))
    val b1 = ascii(substring(col("text"), 2, 1))
    val checksum = expr(
      "aggregate(sequence(1, length(text)), 0L, (acc, i) -> (acc * 131 + ascii(substring(text, i, 1))) % 1000000007)")
    val declared = docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        length(col("text")).cast("long").as("n_bytes"), b0.as("b0"), b1.as("b1"), checksum.as("ck"))
      .collect().map { r =>
        val (m, b0v, b1v) = (r.getAs[String]("modality"), r.getAs[Int]("b0"), r.getAs[Int]("b1"))
        val (w, h, sr) = m match {
          case "image" => ((b0v % 40 + 1) * 16, (b1v % 30 + 1) * 16, 0)
          case "audio" => (0, 0, (b0v % 6 + 1) * 8000)
          case _       => ((b1v % 40 + 1) * 16, (b0v % 30 + 1) * 16, 0)
        }
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_bytes"), w, h, sr, r.getAs[Long]("ck")))
      }.toMap
    assert(typed == declared)
  }

  test("resizeFeatures: aspect-preserving clamp of the longest side, never upscales") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
    val resized = Multimodal.resizeFeatures(spark, feats, maxSide = 64).collect()
    resized.foreach { r =>
      assert(math.max(r.width, r.height) <= 64 || math.max(r.orig_width, r.orig_height) == 0)
      // never upscaled
      assert(r.width <= math.max(r.orig_width, 1) && r.height <= math.max(r.orig_height, 1))
      // aspect preserved within rounding (skip degenerate 0-dim audio)
      if (r.orig_width > 0 && r.orig_height > 0 && math.max(r.orig_width, r.orig_height) > 64) {
        val origRatio = r.orig_width.toDouble / r.orig_height
        val newRatio = r.width.toDouble / r.height
        assert(math.abs(origRatio - newRatio) / origRatio < 0.1)
      }
    }
  }

  test("sampleFrames (typed flatMap) agrees with the declarative x_frame_sample twin") {
    import spark.implicits._
    val media = Multimodal.withPayload(docs).filter(col("modality") === "video")
    val typed = Multimodal.sampleFrames(spark, media, frameSize = 16, step = 2)
      .collect().map(f => (f.doc_id, f.frame_idx, f.frame_bytes, f.frame_checksum)).toSet
    val t = col("payload").cast("string")
    val nFrames = floor((octet_length(t) + lit(15)) / lit(16.0)).cast("int")
    val declared = media
      .select(col("doc_id"), t.as("t"),
        explode(sequence(lit(0), nFrames - 1, lit(2))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long"),
        octet_length(expr("substring(t, frame_idx * 16 + 1, 16)")).cast("long"),
        expr("aggregate(sequence(1, length(substring(t, frame_idx * 16 + 1, 16))), 0L, " +
          "(acc, i) -> (acc * 131 + ascii(substring(substring(t, frame_idx * 16 + 1, 16), i, 1))) % 1000000007)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(typed.nonEmpty && typed == declared)
  }

  test("binary payloads at rest: metadata-only queries never read payload bytes (ReadSchema pruning)") {
    // a REAL binary-column parquet table, not query-time synthesis: the
    // scaladoc claim "columnar at-rest means the multi-KB payload bytes
    // are not even read" exercised against an actual scan
    val path = java.nio.file.Files.createTempDirectory("graft-media").toString + "/media"
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    Multimodal.withPayload(docs)
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .write.mode("overwrite").parquet(path)

    val media = spark.read.parquet(path)
    val key = "spark.sql.maxMetadataStringLength"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "10000")
    try {
      val metaPlan = media.groupBy("modality")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"))
        .queryExecution.executedPlan.toString
      assert(metaPlan.contains("ReadSchema: struct<modality:string,n_bytes:bigint>"), metaPlan)
      assert(!metaPlan.contains("payload"), metaPlan)

      // contrast: a query that genuinely needs the bytes does scan them
      val payloadPlan = media.select(col("doc_id"), octet_length(col("payload")))
        .queryExecution.executedPlan.toString
      assert(payloadPlan.contains("payload:binary"), payloadPlan)
    } finally spark.conf.set(key, saved)
  }

  test("PPM decode + nearest-neighbor resample: real crafted bytes, pixels asserted end-to-end") {
    import spark.implicits._
    // 4×2 binary PPM with a header comment; pixel (x, y) distinct per channel
    val header = "P6\n# crafted fixture\n4 2\n255\n".getBytes("US-ASCII")
    def px(x: Int, y: Int): Seq[Byte] =
      Seq((10 * x + y).toByte, (100 + x).toByte, (200 - x).toByte)
    val body = (for (y <- 0 until 2; x <- 0 until 4) yield px(x, y)).flatten.toArray
    val media = Seq((7L, "image", header ++ body)).toDF("doc_id", "modality", "payload")

    // feature extraction reports the REAL header dimensions, not the stub's fake ones
    val f = Multimodal.extractFeatures(spark, media).collect().head
    assert(f.width == 4 && f.height == 2 && f.n_bytes == (header.length + body.length).toLong)

    // aspect clamp 4×2 → 2×1; nearest-neighbor takes source (0,0) and (2,0)
    val r = Multimodal.resampleImages(spark, media, maxSide = 2).collect().head
    assert((r.width, r.height, r.orig_width, r.orig_height) == ((2, 1, 4, 2)))
    assert(r.pixels.toSeq == px(0, 0) ++ px(2, 0))

    // upscale never happens: maxSide larger than the image passes pixels through
    val same = Multimodal.resampleImages(spark, media, maxSide = 64).collect().head
    assert((same.width, same.height) == ((4, 2)) && same.pixels.toSeq == body.toSeq)

    // non-PPM payloads (the synthetic text corpus) drop out of the image
    // path and keep the stub features — the x_multimodal_meta contract
    assert(Multimodal.resampleImages(spark, Multimodal.withPayload(docs), 64).count() == 0)
    assert(Multimodal.tryDecodePpm("P6 oops".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.tryDecodePpm(header.dropRight(1) ++ Array[Byte]('0', '\n') ++ body).isEmpty)
  }

  test("BMP decode: bottom-up BGR stride-padded bytes round-trip to top-down RGB pixels") {
    // 3×2 image: stride = ((3*3+3)/4)*4 = 12, so each 9-byte row pads by 3
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 11 + 5).toByte)
    val payload = Multimodal.bmpPayload(3, 2, rgb)
    // encoder writes the real layout: BM magic, 54-byte offset, 24bpp
    assert(payload(0) == 'B' && payload(1) == 'M' && payload.length == 54 + 12 * 2)
    assert((payload(28) & 0xff) == 24 && (payload(10) & 0xff) == 54)
    // stored first row is the BOTTOM image row, BGR: byte 54 is pixel
    // (0, 1)'s blue = rgb[(1*3+0)*3 + 2]
    assert(payload(54) == rgb(1 * 3 * 3 + 2))
    val img = Multimodal.decodeBmp(payload)
    assert(img.width == 3 && img.height == 2 && img.pixels.toSeq == rgb.toSeq)

    // negative height = top-down layout; decoder handles both
    val td = payload.clone()
    td(22) = (-2 & 0xff).toByte; td(23) = 0xff.toByte
    td(24) = 0xff.toByte; td(25) = 0xff.toByte
    val imgTd = Multimodal.decodeBmp(td)
    assert(imgTd.height == 2 &&
      imgTd.pixels.toSeq == (rgb.slice(9, 18) ++ rgb.slice(0, 9)).toSeq)

    // the image front door dispatches PPM first, then BMP
    assert(Multimodal.tryDecodeImage(payload).map(_.pixels.toSeq).contains(rgb.toSeq))
    // truncated / wrong-bpp payloads fall back to the stub path
    assert(Multimodal.tryDecodeBmp(payload.dropRight(1)).isEmpty)
    val bpp8 = payload.clone(); bpp8(28) = 8
    assert(Multimodal.tryDecodeBmp(bpp8).isEmpty)
    assert(Multimodal.tryDecodeBmp("BMnope".getBytes("US-ASCII")).isEmpty)
  }

  test("BMP feeds the real image pipeline: extractFeatures dims + resample pixels") {
    import spark.implicits._
    val rgb = Array.tabulate(4 * 2 * 3)(i => (7 * i).toByte)
    val media = Seq((9L, "image", Multimodal.bmpPayload(4, 2, rgb)))
      .toDF("doc_id", "modality", "payload")
    val f = Multimodal.extractFeatures(spark, media).collect().head
    assert(f.width == 4 && f.height == 2 && f.sample_rate == 0)
    val r = Multimodal.resampleImages(spark, media, maxSide = 2).collect().head
    // 4×2 clamps to 2×1; nearest-neighbor takes source pixels (0,0), (2,0)
    def px(x: Int, y: Int) = (0 until 3).map(c => rgb((y * 4 + x) * 3 + c))
    assert((r.width, r.height) == ((2, 1)) && r.pixels.toSeq == px(0, 0) ++ px(2, 0))
  }

  test("WAV decode: RIFF chunk walk recovers fmt fields and the exact data bytes") {
    val data = "pcm sample payload".getBytes("US-ASCII")
    val payload = Multimodal.wavPayload(22050, data)
    assert(payload.length == 44 + data.length)
    val wav = Multimodal.decodeWav(payload)
    assert(wav.sampleRate == 22050 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.data.toSeq == data.toSeq)

    // an unknown chunk BEFORE fmt/data is skipped by size (LIST here),
    // including the RIFF pad byte for odd-sized chunks
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val withChunk = payload.take(12) ++ extra ++ payload.drop(12)
    // outer RIFF size grows by the inserted chunk
    val fixed = withChunk.clone()
    val newSize = 36 + data.length + extra.length
    fixed(4) = (newSize & 0xff).toByte; fixed(5) = ((newSize >> 8) & 0xff).toByte
    val wav2 = Multimodal.decodeWav(fixed)
    assert(wav2.sampleRate == 22050 && wav2.data.toSeq == data.toSeq)

    // audio front door: WAV payloads report the REAL sample rate...
    import spark.implicits._
    val media = Seq((4L, "audio", payload)).toDF("doc_id", "modality", "payload")
    assert(Multimodal.extractFeatures(spark, media).collect().head.sample_rate == 22050)
    // ...while non-WAV audio stays on the deterministic stub
    assert(Multimodal.tryDecodeWav("RIFFnope".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.tryDecodeWav(payload.dropRight(1)).isEmpty)
  }

  test("craftAndDecode: the x_media_decode row derives from the real codecs") {
    // wav row (doc_id % 3 == 0): sample rate from the first text
    // byte, content hash over exactly the text bytes
    val w = Multimodal.craftAndDecode(6L, "abc")
    assert(w.kind == "audio_wav" && w.n_bytes == 44 + 3)
    assert(w.sample_rate == ('a'.toInt % 6 + 1) * 8000)
    assert(w.content_hash == Multimodal.rollingHash("abc".getBytes("US-ASCII")))
    // bmp row (doc_id % 3 == 1): dims from the first two text bytes;
    // the content hash equals the hash of the arithmetic pixel
    // sequence — i.e. the decode round-trip reproduced the pre-encode
    // pixels
    val b = Multimodal.craftAndDecode(7L, "abc")
    val (bw, bh) = ('a'.toInt % 6 + 2, 'b'.toInt % 4 + 2)
    assert(b.kind == "image_bmp" && b.width == bw && b.height == bh)
    val rgb = Array.tabulate(bw * bh * 3)(i => ((7L * 7 + i * 13) % 256).toByte)
    assert(b.content_hash == Multimodal.rollingHash(rgb))
    assert(b.n_bytes == 54 + Multimodal.bmpStride(bw) * bh)
    // png row (doc_id % 3 == 2): same pixel sequence through the real
    // PNG encode → CRC-checked decode round trip; file size is the
    // stored-block layout's closed form (68 framing bytes + filtered
    // scanline stream)
    val p = Multimodal.craftAndDecode(8L, "abc")
    assert(p.kind == "image_png" && p.width == bw && p.height == bh)
    val prgb = Array.tabulate(bw * bh * 3)(i => ((8L * 7 + i * 13) % 256).toByte)
    assert(p.content_hash == Multimodal.rollingHash(prgb))
    assert(p.n_bytes == 68 + bh * (bw * 3 + 1))
  }

  // -- PNG codec (r11): real chunk walk + inflate + filter reconstruction --

  /** Test-side PNG writer with CHOSEN per-row filters and a real
    * Deflater (fixed/dynamic Huffman) stream — exercises exactly what
    * [[Multimodal.pngPayload]]'s stored-block filter-0 output cannot:
    * the decoder against compressed streams and all five filter
    * reconstructions. Filtered bytes are computed by inverting the
    * spec recurrences against the ORIGINAL pixels.
    */
  private def pngWith(
      w: Int, h: Int, bpp: Int, pix: Array[Byte], filters: Seq[Int]): Array[Byte] = {
    val stride = w * bpp
    def at(r: Int, x: Int): Int =
      if (r < 0 || x < 0) 0 else pix(r * stride + x) & 0xff
    val raw = new Array[Byte](h * (stride + 1))
    for (r <- 0 until h) {
      val f = filters(r)
      raw(r * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = at(r, x)
        val a = if (x >= bpp) at(r, x - bpp) else 0
        val b = at(r - 1, x)
        val c = if (x >= bpp) at(r - 1, x - bpp) else 0
        val v = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(r * (stride + 1) + 1 + x) = (v & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zn = defl.deflate(buf)
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte), 0, 8)
    def be4(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be4(data.length), 0, 4)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      out.write(be4(crc.getValue.toInt), 0, 4)
    }
    val colorType: Byte = bpp match { case 1 => 0; case 3 => 2; case _ => 6 }
    val ihdr = be4(w) ++ be4(h) ++ Array[Byte](8, colorType, 0, 0, 0)
    chunk("IHDR", ihdr)
    chunk("IDAT", java.util.Arrays.copyOf(buf, zn))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("PNG round trip: own stored-block encoder inverts exactly") {
    val (w, h) = (5, 4)
    val pix = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val img = Multimodal.decodePng(Multimodal.pngPayload(w, h, pix))
    assert(img.width == w && img.height == h)
    assert(img.pixels.sameElements(pix))
  }

  test("PNG decode: all five filter types through a real Deflater stream") {
    val (w, h) = (4, 5)
    val pix = Array.tabulate(w * h * 3)(i => ((i * 53 + 11) % 256).toByte)
    // one row per filter type — Sub/Up/Average/Paeth all reconstruct
    val payload = pngWith(w, h, 3, pix, Seq(0, 1, 2, 3, 4))
    val img = Multimodal.decodePng(payload)
    assert(img.width == w && img.height == h)
    assert(img.pixels.sameElements(pix), "filter reconstruction mismatch")
  }

  test("PNG decode: RGBA drops alpha into the RGB RasterImage contract") {
    val (w, h) = (3, 3)
    val rgba = Array.tabulate(w * h * 4)(i => ((i * 17 + 5) % 256).toByte)
    val img = Multimodal.decodePng(pngWith(w, h, 4, rgba, Seq(0, 4, 2)))
    assert(img.width == w && img.height == h)
    val expected = Array.tabulate(w * h * 3) { i =>
      rgba((i / 3) * 4 + i % 3)
    }
    assert(img.pixels.sameElements(expected))
  }

  test("PNG decode: 8-bit grayscale replicates into the RGB RasterImage contract") {
    val (w, h) = (5, 3)
    val gray = Array.tabulate(w * h)(i => ((i * 29 + 3) % 256).toByte)
    val img = Multimodal.decodePng(pngWith(w, h, 1, gray, Seq(0, 1, 4)))
    assert(img.width == w && img.height == h)
    val expected = Array.tabulate(w * h * 3)(i => gray(i / 3))
    assert(img.pixels.sameElements(expected))
  }

  test("PNG decode: corrupt chunk CRC and truncated IDAT are rejected") {
    val pix = Array.tabulate(4 * 3 * 3)(i => (i % 256).toByte)
    val good = Multimodal.pngPayload(4, 3, pix)
    assert(Multimodal.tryDecodePng(good).nonEmpty)
    val badCrc = good.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x01).toByte // IEND CRC
    assert(Multimodal.tryDecodePng(badCrc).isEmpty)
    assert(Multimodal.tryDecodePng(good.dropRight(20)).isEmpty) // no IEND / short IDAT
    // and the dispatcher routes PNGs (synthetic text bytes never parse)
    assert(Multimodal.tryDecodeImage(good).nonEmpty)
    assert(Multimodal.tryDecodeImage("not an image".getBytes("US-ASCII")).isEmpty)
  }
}
