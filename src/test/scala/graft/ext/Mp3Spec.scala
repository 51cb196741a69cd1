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
}
