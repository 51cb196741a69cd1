package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp3]] — frame-header scanner: CBR round trip, ID3v2 prefix and
  * ID3v1 tail handling, VBR detection, and the loud-fail guards
  * (desync, truncation, non-Layer-III).
  */
class Mp3Spec extends AnyFunSuite {

  private def cbr(n: Int, bIdx: Int): Array[Byte] =
    Mp3.mp3Payload(n, bIdx, srIdx = 0)((f, i) => ((f * 19 + i * 7) % 256).toByte)

  test("CBR round trip: frames, sample rate, channels, bitrate, duration") {
    val m = Mp3.scan(cbr(5, 9)) // 128 kbps @ 44100
    assert(m.frames == 5 && m.sampleRate == 44100 && m.channels == 2)
    assert(m.bitrateKbps == 128 && m.cbr)
    assert(m.durationMs == 5L * 1152 * 1000 / 44100) // 130 ms
  }

  test("ID3v2 prefix is skipped via its syncsafe size; ID3v1 tail tolerated") {
    val frames = cbr(3, 8)
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 5) ++
      Array.fill(0x85)(0x61.toByte) // syncsafe 0x85 = 133 tag bytes
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ Array.fill(125)(0.toByte)
    val m = Mp3.scan(id3v2 ++ frames ++ id3v1)
    assert(m.frames == 3 && m.bitrateKbps == 112 && m.cbr)
  }

  test("ID3v2.4 footer flag adds 10 bytes not counted in the syncsafe size") {
    val frames = cbr(3, 8)
    // flags byte 0x10 = footer present; body 0x20 bytes + 10-byte footer
    val header = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 0x20)
    val body = Array.fill(0x20)(0x61.toByte)
    val footer = Array[Byte]('3', 'D', 'I', 4, 0, 0x10, 0, 0, 0, 0x20)
    val m = Mp3.scan(header ++ body ++ footer ++ frames)
    assert(m.frames == 3 && m.bitrateKbps == 112 && m.cbr)
  }

  test("VBR: a bitrate change mid-stream clears the CBR flag") {
    val m = Mp3.scan(cbr(2, 9) ++ cbr(2, 11)) // 128 then 192 kbps
    assert(m.frames == 4 && !m.cbr && m.bitrateKbps == 128) // first frame's rate
  }

  test("guards: desync, truncation, Layer II refusal; tryScan never throws") {
    val ok = cbr(2, 9)
    // flip a sync byte mid-stream -> lost sync, refused
    val bad = ok.clone(); bad(417) = 0x00 // frame 2's header starts at 417
    val e1 = intercept[IllegalArgumentException](Mp3.scan(bad))
    assert(e1.getMessage.contains("lost sync"), e1.getMessage)
    // truncated final frame
    assert(Mp3.tryScan(ok.take(ok.length - 5)).isEmpty)
    // Layer II header bits (layer = 10) refused
    val l2 = ok.clone(); l2(1) = 0xfd.toByte
    val e3 = intercept[IllegalArgumentException](Mp3.scan(l2))
    assert(e3.getMessage.contains("Layer III"), e3.getMessage)
    // non-MP3 bytes -> None
    assert(Mp3.tryScan("hello world, not audio".getBytes("US-ASCII")).isEmpty)
  }

  private def silence(n: Int, bIdx: Int) =
    Mp3.mp3SilencePayload(n, bIdx, srIdx = 0)((f, i) => ((f * 19 + i * 7) % 256).toByte)

  test("decodePcm: silence frames decode to exact-zero PCM through the full bitstream walk") {
    val p = silence(4, 9) // 128 kbps @ 44100, mono
    val d = Mp3.decodePcm(p)
    assert(d.frames == 4 && d.sampleRate == 44100 && d.channels == 1)
    assert(d.samples.length == 4 * 1152)
    assert(d.samples.forall(_ == 0))
    // the same payload still scans (header layer is shared)
    val m = Mp3.scan(p)
    assert(m.frames == 4 && m.channels == 1 && m.cbr)
  }

  test("decodePcm: the bit reservoir resolves main_data_begin into the previous frame") {
    // frame 2's main data begins 4 bytes BACK: its quad bits live in
    // frame 1's ancillary region. Craft: take two silence frames, move
    // frame 2's 4 main-data bytes into the END of frame 1, and point
    // main_data_begin at them.
    val p = silence(2, 9)
    val frameLen = p.length / 2
    // frame 2: main_data_begin = 4 -> first 9 side-info bits 000000100
    p(frameLen + 4) = 0x02.toByte // 00000010 (top 8 of main_data_begin)
    p(frameLen + 5) = (p(frameLen + 5) & 0x7f).toByte // 9th bit 0
    // its own main-data slots become ancillary; the real bits sit at
    // the end of frame 1
    p(frameLen - 4) = 0xff.toByte; p(frameLen - 3) = 0xff.toByte
    p(frameLen - 2) = 0xff.toByte; p(frameLen - 1) = 0xff.toByte
    val d = Mp3.decodePcm(p)
    assert(d.frames == 2 && d.samples.length == 2 * 1152 && d.samples.forall(_ == 0))
    // main_data_begin reaching BEFORE the reservoir start refuses
    val first = silence(1, 9)
    first(4) = 0x02.toByte // main_data_begin = 4 on the FIRST frame
    first(5) = (first(5) & 0x7f).toByte
    val e = intercept[IllegalArgumentException](Mp3.decodePcm(first))
    assert(e.getMessage.contains("reservoir"), e.getMessage)
  }

  test("decodePcm honesty guards: nonzero spectra, foreign tables, stereo all refuse loudly") {
    // a count1-B quad with a nonzero entry (code 0111 -> quad 1000 +
    // sign bit): the synthesis stage is not transcribed -> refuse
    val nz = silence(1, 9)
    nz(21) = 0x7f.toByte // first quad code 0111 -> v=1, sign bit rides next
    val e1 = intercept[IllegalArgumentException](Mp3.decodePcm(nz))
    assert(e1.getMessage.contains("nonzero spectral"), e1.getMessage)
    // count1 table A refuses by name
    val ta = silence(1, 9)
    ta(20) = (ta(20) & 0xfe).toByte // gr0 count1table_select bit -> 0 (table A)
    val e2 = intercept[IllegalArgumentException](Mp3.decodePcm(ta))
    assert(e2.getMessage.contains("table A"), e2.getMessage)
    // stereo refuses (the scan metadata path still reads it)
    val st = Mp3.mp3Payload(2, 9, 0)((f, i) => 0.toByte)
    val e3 = intercept[IllegalArgumentException](Mp3.decodePcm(st))
    assert(e3.getMessage.contains("MONO"), e3.getMessage)
  }

  // ----------------------------------- spectrum decode (encoder twin)

  private def randomGranule(seed: Int): (Array[Int], Array[Int], Int) = {
    val rnd = new scala.util.Random(seed)
    val lines = Array.tabulate(576)(_ =>
      rnd.nextInt(5) match { case 0 => 1; case 1 => -1; case _ => 0 })
    val sfl = Array.tabulate(21)(_ => rnd.nextInt(8))
    (lines, sfl, 150 + rnd.nextInt(100))
  }

  test("decodeSpectrum round-trips table-1 + count1-B spectra bit-exactly (encoder twin)") {
    val grans = (0 until 6).map(randomGranule) // 3 frames
    val payload = Mp3.mp3SpectrumPayload(grans, bigValuePairs = 200)
    val dec = Mp3.decodeSpectrum(payload)
    assert(dec.frames == 3 && dec.sampleRate == 44100 && dec.granules.size == 6)
    dec.granules.zip(grans).zipWithIndex.foreach { case ((got, (lines, sfl, gain)), gi) =>
      assert(got.lines.toSeq == lines.toSeq, s"granule $gi integer lines differ")
      // requantization, recomputed independently from the B.8 band
      // table: xr = sign * 2^((gain-210)/4 - sfl(band)/2) for |is|=1
      val widths = Seq(4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10,
        12, 16, 20, 24, 28, 34, 42, 50, 54, 76)
      val bounds = widths.scanLeft(0)(_ + _)
      (0 until 576).foreach { j =>
        val v = lines(j)
        val expect =
          if (v == 0) 0.0
          else {
            val band = bounds.lastIndexWhere(_ <= j) // 21 = past-last tail
            val sf = if (band < 21) sfl(band) * 0.5 else 0.0
            math.signum(v.toDouble) * math.pow(2.0, 0.25 * (gain - 210) - sf)
          }
        assert(got.xr(j) == expect, s"granule $gi xr($j)")
      }
    }
  }

  test("decodeSpectrum: table-0 big-value region with a count1 tail; silence stays zero") {
    // big-value region all zero -> the twin selects table 0 (zero
    // bits); the only energy lives in the count1 quadruples
    val lines = new Array[Int](576)
    lines(500) = 1; lines(503) = -1; lines(570) = 1
    val sfl = new Array[Int](21)
    val grans = Seq((lines, sfl, 210), (new Array[Int](576), sfl, 210))
    val dec = Mp3.decodeSpectrum(Mp3.mp3SpectrumPayload(grans, bigValuePairs = 200))
    assert(dec.granules.head.lines.toSeq == lines.toSeq)
    assert(dec.granules.head.xr(500) == 1.0 && dec.granules.head.xr(503) == -1.0)
    assert(dec.granules(1).lines.forall(_ == 0) && dec.granules(1).xr.forall(_ == 0.0))
    // the silence writer twin decodes through the same path to zeros
    val sdec = Mp3.decodeSpectrum(silence(2, 9))
    assert(sdec.granules.size == 4 && sdec.granules.forall(_.xr.forall(_ == 0.0)))
    // preflag / scalefac_scale route through requantization
    val one = new Array[Int](576); one(100) = 1 // band 11 (pretab 1)
    val d2 = Mp3.decodeSpectrum(Mp3.mp3SpectrumPayload(
      Seq((one, sfl, 210), (one, sfl, 210)), bigValuePairs = 60,
      preflag = true, scalefacScale = 1))
    assert(d2.granules.head.xr(100) == math.pow(2.0, -1.0)) // -(1+1)*0.5... pretab(11)=1, mult=1
  }

  test("decodeSpectrum honesty guards: untranscribed tables, 32 kHz bands, short blocks refuse") {
    // an untranscribed big-values table refuses BY INDEX: patch the
    // twin's table_select (gr0 starts at side-info bit 20+59... easier:
    // decodePcm's foreign-table fixture exercises the same registry)
    val grans = Seq((new Array[Int](576), new Array[Int](21), 210),
      (new Array[Int](576), new Array[Int](21), 210))
    // 32 kHz: the band table is not transcribed
    val e1 = intercept[IllegalArgumentException](
      Mp3.decodeSpectrum(Mp3.mp3SpectrumPayload(grans, bigValuePairs = 0, srIdx = 2)))
    assert(e1.getMessage.contains("not transcribed"), e1.getMessage)
    // foreign table index (patch gr0's first table_select to 7):
    // side info starts at byte 4; the field sits 20+47 bits in —
    // reuse the silence payload whose layout the writer pins, flipping
    // table bits directly
    val p = Mp3.mp3SpectrumPayload(grans.map { case (l, s, g) =>
      val l2 = l.clone(); l2(0) = 1; (l2, s, g) }, bigValuePairs = 2)
    // gr0 table_select(0) occupies bits 67..71 of the side info
    // (9+5+4+12+9+8+4+1 = 52 into granule 0, +15 header fields = 67)
    val bitBase = 4 * 8 + 9 + 5 + 4 + 12 + 9 + 8 + 4 + 1
    def setBit(arr: Array[Byte], bit: Int, v: Int): Unit = {
      if (v == 1) arr(bit / 8) = (arr(bit / 8) | (1 << (7 - bit % 8))).toByte
      else arr(bit / 8) = (arr(bit / 8) & ~(1 << (7 - bit % 8))).toByte
    }
    val patched = p.clone()
    Seq(0, 0, 1, 1, 1).zipWithIndex.foreach { case (v, i) =>
      setBit(patched, bitBase + i, v) } // table_select(0) = 7
    val e2 = intercept[IllegalArgumentException](Mp3.decodeSpectrum(patched))
    assert(e2.getMessage.contains("not transcribed"), e2.getMessage)
  }
}
