package graft.ext

/** ISO Base Media File Format (MP4) DEMUXER and a writer twin — the
  * container layer of the last marked multimodal stub. Decoding video
  * FRAMES (H.264 etc.) stays honestly out of scope (an entropy-coded
  * video codec is not a few-hundred-line task); what a training-data
  * pipeline actually needs from 100 TB of MP4s FIRST is the container
  * walk — track metadata (dimensions, duration, codec fourcc) and
  * SAMPLE EXTRACTION (frame byte ranges from the stsc/stsz/stco
  * tables) for downstream frame-level processing — and that layer is
  * fully specified by the public ISO 14496-12 box grammar: big-endian
  * length-prefixed boxes, no entropy coding, no checksums.
  *
  * Demuxer scope (guarded loudly): 32-bit box sizes (no `size==1`
  * 64-bit largesize, no `size==0` to-EOF), version-0 full boxes for
  * mvhd/tkhd/mdhd/stts/stsc/stsz/stco, one video or sound track (the
  * first trak wins), samples resolved through the full
  * stsc→stsz→stco chain (any chunking, not just one-chunk files).
  *
  * The writer twin emits a deterministic single-track layout
  * (ftyp, mdat-before-moov so stco offsets are moov-size-independent,
  * one chunk) whose EVERY byte is computable from (dims, frame sizes,
  * timescale) alone — which is what lets the `x_mp4_demux` DuckDB
  * oracle rebuild the complete file in SQL and hash-match it, the
  * same independent byte-layout proof the BMP/PNG/WAV oracles give.
  *
  * Scale shape: one record in → one demux out, map-side inside a
  * partition iterator; no shuffle (the [[Multimodal]] codec contract).
  */
object Mp4 {

  /** Demuxed container metadata + per-sample byte ranges. */
  final case class Mp4Meta(
      majorBrand: String,
      handler: String,       // "vide" | "soun" | ...
      codec: String,         // sample-entry fourcc, e.g. "mp4v"
      width: Int, height: Int,
      timescale: Long, duration: Long,
      sampleOffsets: Array[Long], sampleSizes: Array[Long])

  private def be4(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  private def be2(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, "US-ASCII")

  def demux(bytes: Array[Byte]): Mp4Meta = {
    require(bytes.length >= 16, "MP4: too short")
    var majorBrand = ""
    var handler = ""
    var codec = ""
    var width = 0
    var height = 0
    var timescale = 0L
    var duration = 0L
    var sttsCount = 0L
    var stsz: Array[Long] = Array.empty
    var stco: Array[Long] = Array.empty
    var stsc: Array[(Long, Long)] = Array.empty // (firstChunk, samplesPerChunk)
    var trakSeen = false

    def walk(from: Long, until: Long, depth: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val size = be4(bytes, i.toInt)
        val typ = fourcc(bytes, i.toInt + 4)
        require(size != 1, "MP4: 64-bit box sizes not supported")
        require(size != 0, "MP4: to-end-of-file box sizes not supported")
        require(size >= 8 && i + size <= until,
          s"MP4: box $typ size $size overruns its container")
        val body = i + 8
        typ match {
          case "ftyp" =>
            majorBrand = fourcc(bytes, body.toInt)
          case "moov" | "mdia" | "minf" | "stbl" =>
            walk(body, i + size, depth + 1)
          case "trak" =>
            if (!trakSeen) { trakSeen = true; walk(body, i + size, depth + 1) }
          case "tkhd" =>
            require(bytes(body.toInt) == 0, "MP4: tkhd version 1 not supported")
            // width/height are 16.16 fixed point at payload offset 76/80
            width = (be4(bytes, body.toInt + 76) >> 16).toInt
            height = (be4(bytes, body.toInt + 80) >> 16).toInt
          case "mdhd" =>
            require(bytes(body.toInt) == 0, "MP4: mdhd version 1 not supported")
            timescale = be4(bytes, body.toInt + 12)
            duration = be4(bytes, body.toInt + 16)
          case "hdlr" =>
            handler = fourcc(bytes, body.toInt + 8)
          case "stsd" =>
            val n = be4(bytes, body.toInt + 4)
            require(n >= 1, "MP4: empty stsd")
            codec = fourcc(bytes, body.toInt + 12) // first entry's fourcc
          case "stts" =>
            val n = be4(bytes, body.toInt + 4)
            var k = 0
            while (k < n) {
              sttsCount += be4(bytes, body.toInt + 8 + k * 8)
              k += 1
            }
          case "stsz" =>
            val fixed = be4(bytes, body.toInt + 4)
            val n = be4(bytes, body.toInt + 8)
            stsz =
              if (fixed != 0) Array.fill(n.toInt)(fixed)
              else Array.tabulate(n.toInt)(k => be4(bytes, body.toInt + 12 + k * 4))
          case "stco" =>
            val n = be4(bytes, body.toInt + 4)
            stco = Array.tabulate(n.toInt)(k => be4(bytes, body.toInt + 8 + k * 4))
          case "stsc" =>
            val n = be4(bytes, body.toInt + 4)
            stsc = Array.tabulate(n.toInt) { k =>
              (be4(bytes, body.toInt + 8 + k * 12),
                be4(bytes, body.toInt + 12 + k * 12))
            }
          case _ => () // mdat, free, skipped leaves
        }
        i += size
      }
    }
    walk(0L, bytes.length.toLong, 0)
    require(majorBrand.nonEmpty, "MP4: no ftyp box")
    require(trakSeen, "MP4: no trak box")
    require(stsz.nonEmpty && stco.nonEmpty && stsc.nonEmpty,
      "MP4: incomplete sample tables (stsz/stco/stsc)")
    require(sttsCount == stsz.length,
      s"MP4: stts sample count $sttsCount != stsz count ${stsz.length}")

    // resolve sample offsets through the stsc→stco chain: stsc runs
    // describe samples-per-chunk from firstChunk until the next entry
    val nChunks = stco.length
    val offsets = new Array[Long](stsz.length)
    var sample = 0
    var entry = 0
    var chunk = 0
    while (chunk < nChunks && sample < stsz.length) {
      while (entry + 1 < stsc.length && stsc(entry + 1)._1 <= chunk + 1) entry += 1
      val perChunk = stsc(entry)._2.toInt
      var off = stco(chunk)
      var j = 0
      while (j < perChunk && sample < stsz.length) {
        offsets(sample) = off
        off += stsz(sample)
        sample += 1
        j += 1
      }
      chunk += 1
    }
    require(sample == stsz.length,
      s"MP4: chunk tables cover $sample of ${stsz.length} samples")
    offsets.zip(stsz).foreach { case (o, s) =>
      require(o >= 0 && o + s <= bytes.length,
        s"MP4: sample range [$o, ${o + s}) outside the file")
    }
    Mp4Meta(majorBrand, handler, codec, width, height, timescale, duration,
      offsets, stsz)
  }

  def tryDemux(bytes: Array[Byte]): Option[Mp4Meta] =
    if (bytes.length < 12 || fourcc(bytes, 4) != "ftyp") None
    else
      try Some(demux(bytes))
      catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }

  /** Extract sample `i`'s bytes. */
  def sample(bytes: Array[Byte], meta: Mp4Meta, i: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes,
      meta.sampleOffsets(i).toInt, (meta.sampleOffsets(i) + meta.sampleSizes(i)).toInt)

  // =================================================================
  // Writer twin — deterministic single-track layout
  // =================================================================

  private def out4(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
  private def out2(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def tag(o: java.io.ByteArrayOutputStream, t: String): Unit =
    o.write(t.getBytes("US-ASCII"), 0, 4)

  private val UnityMatrix: Seq[Long] =
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L)

  /** One video track, `frames` as one chunk in an mdat placed BEFORE
    * moov (so the chunk offset is a constant 32 = ftyp 24 + mdat
    * header 8, independent of moov's size), stts as a single run of
    * `delta` ticks per frame. Every byte is a pure function of the
    * arguments — the property the SQL oracle relies on.
    */
  def mp4Payload(
      width: Int, height: Int, frames: Seq[Array[Byte]],
      timescale: Long, delta: Long): Array[Byte] = {
    require(frames.nonEmpty, "mp4Payload: no frames")
    val n = frames.size
    val dataLen = frames.map(_.length.toLong).sum
    val duration = n * delta
    val o = new java.io.ByteArrayOutputStream()
    // ftyp (24)
    out4(o, 24); tag(o, "ftyp"); tag(o, "isom"); out4(o, 512); tag(o, "isom"); tag(o, "mp42")
    // mdat
    out4(o, 8 + dataLen); tag(o, "mdat")
    frames.foreach(f => o.write(f, 0, f.length))
    // moov
    val stszSize = 20L + 4L * n
    val stblSize = 8 + 102 + 24 + 28 + stszSize + 16
    val minfSize = 8 + 20 + 36 + stblSize
    val mdiaSize = 8 + 32 + 33 + minfSize
    val trakSize = 8 + 92 + mdiaSize
    out4(o, 8 + 108 + trakSize); tag(o, "moov")
    // mvhd (108)
    out4(o, 108); tag(o, "mvhd"); out4(o, 0) // version/flags
    out4(o, 0); out4(o, 0) // creation/modification
    out4(o, timescale); out4(o, duration)
    out4(o, 0x10000); out2(o, 0x0100); out2(o, 0) // rate, volume, reserved
    out4(o, 0); out4(o, 0) // reserved
    UnityMatrix.foreach(out4(o, _))
    (0 until 6).foreach(_ => out4(o, 0)) // predefined
    out4(o, 2) // next track id
    // trak
    out4(o, trakSize); tag(o, "trak")
    // tkhd (92), flags = 7 (enabled | in movie | in preview)
    out4(o, 92); tag(o, "tkhd"); out4(o, 7)
    out4(o, 0); out4(o, 0) // creation/modification
    out4(o, 1); out4(o, 0) // track id, reserved
    out4(o, duration)
    out4(o, 0); out4(o, 0) // reserved
    out2(o, 0); out2(o, 0); out2(o, 0); out2(o, 0) // layer, group, volume, reserved
    UnityMatrix.foreach(out4(o, _))
    out4(o, width.toLong << 16); out4(o, height.toLong << 16)
    // mdia
    out4(o, mdiaSize); tag(o, "mdia")
    // mdhd (32)
    out4(o, 32); tag(o, "mdhd"); out4(o, 0)
    out4(o, 0); out4(o, 0)
    out4(o, timescale); out4(o, duration)
    out2(o, 0x55c4); out2(o, 0) // language "und", predefined
    // hdlr (33: 8 + 24 + empty-name NUL)
    out4(o, 33); tag(o, "hdlr"); out4(o, 0)
    out4(o, 0); tag(o, "vide")
    out4(o, 0); out4(o, 0); out4(o, 0) // reserved
    o.write(0) // name ""
    // minf
    out4(o, minfSize); tag(o, "minf")
    // vmhd (20), flags = 1
    out4(o, 20); tag(o, "vmhd"); out4(o, 1)
    out2(o, 0); out2(o, 0); out2(o, 0); out2(o, 0) // graphicsmode, opcolor
    // dinf > dref > url (36)
    out4(o, 36); tag(o, "dinf")
    out4(o, 28); tag(o, "dref"); out4(o, 0); out4(o, 1)
    out4(o, 12); tag(o, "url "); out4(o, 1) // self-contained
    // stbl
    out4(o, stblSize); tag(o, "stbl")
    // stsd (102) with one 86-byte visual sample entry "mp4v"
    out4(o, 102); tag(o, "stsd"); out4(o, 0); out4(o, 1)
    out4(o, 86); tag(o, "mp4v")
    (0 until 6).foreach(_ => o.write(0)) // reserved
    out2(o, 1) // data reference index
    out2(o, 0); out2(o, 0) // predefined, reserved
    (0 until 3).foreach(_ => out4(o, 0)) // predefined
    out2(o, width); out2(o, height)
    out4(o, 0x480000); out4(o, 0x480000) // 72 dpi
    out4(o, 0) // reserved
    out2(o, 1) // frame count
    (0 until 32).foreach(_ => o.write(0)) // compressor name
    out2(o, 0x0018); out2(o, 0xffff) // depth, predefined
    // stts (24): one run
    out4(o, 24); tag(o, "stts"); out4(o, 0); out4(o, 1)
    out4(o, n.toLong); out4(o, delta)
    // stsc (28): one chunk-run, n samples in chunk 1
    out4(o, 28); tag(o, "stsc"); out4(o, 0); out4(o, 1)
    out4(o, 1); out4(o, n.toLong); out4(o, 1)
    // stsz (20 + 4n): variable sizes
    out4(o, stszSize); tag(o, "stsz"); out4(o, 0); out4(o, 0); out4(o, n.toLong)
    frames.foreach(f => out4(o, f.length.toLong))
    // stco (16): one chunk at offset 32
    out4(o, 16); tag(o, "stco"); out4(o, 0); out4(o, 1); out4(o, 32)
    o.toByteArray
  }
}
