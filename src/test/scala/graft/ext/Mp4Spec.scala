package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[Mp4]] — ISO-BMFF demuxer + writer twin: round trip through the
  * writer's deterministic layout, the general stsc→stsz→stco sample
  * resolution on a hand-assembled MULTI-CHUNK file (the writer only
  * emits one chunk, so the chain logic needs its own fixture), and
  * the loud-fail guards.
  */
class Mp4Spec extends AnyFunSuite {

  private def frames(docId: Long, n: Int): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate(5 + f)(i => ((docId * 11 + f * 17 + i * 13) % 256).toByte))

  test("writer -> demuxer round trip: brand, track, dims, timing, exact sample extraction") {
    val fs = frames(7L, 3)
    val payload = Mp4.mp4Payload(64, 48, fs, timescale = 1000, delta = 40)
    val m = Mp4.demux(payload)
    assert(m.majorBrand == "isom" && m.handler == "vide" && m.codec == "mp4v")
    assert(m.width == 64 && m.height == 48)
    assert(m.timescale == 1000 && m.duration == 120)
    assert(m.sampleSizes.toSeq == fs.map(_.length.toLong))
    (0 until 3).foreach { i =>
      assert(Mp4.sample(payload, m, i).sameElements(fs(i)), s"sample $i mismatch")
    }
    // the dispatcher recognizes it; non-MP4 bytes stay None
    assert(Mp4.tryDemux(payload).isDefined)
    assert(Mp4.tryDemux("not an mp4 at all".getBytes("US-ASCII")).isEmpty)
  }

  test("multi-chunk stsc chain: samples resolve across chunk runs") {
    // hand-assembled minimal file: 5 samples in 3 chunks laid out as
    // stsc runs [(firstChunk=1, 2/chunk), (firstChunk=3, 1/chunk)] —
    // chunks 1,2 carry 2 samples each, chunk 3 carries 1
    val bo = new java.io.ByteArrayOutputStream()
    def be4(v: Long): Unit = {
      bo.write(((v >> 24) & 0xff).toInt); bo.write(((v >> 16) & 0xff).toInt)
      bo.write(((v >> 8) & 0xff).toInt); bo.write((v & 0xff).toInt)
    }
    def tag(t: String): Unit = bo.write(t.getBytes("US-ASCII"), 0, 4)
    val sizes = Seq(3L, 4L, 5L, 6L, 7L)
    val data = Array.tabulate(25)(i => (i + 1).toByte) // 3+4+5+6+7
    be4(24); tag("ftyp"); tag("isom"); be4(512); tag("isom"); tag("mp42")
    be4(8 + 25); tag("mdat"); bo.write(data, 0, 25)
    // chunk offsets inside mdat payload (starts at 32): chunk1 at 32
    // (samples 0,1 = 7 bytes), chunk2 at 39 (samples 2,3 = 11 bytes),
    // chunk3 at 50 (sample 4)
    val stszSz = 20 + 4 * 5
    val stscSz = 8 + 4 + 4 + 2 * 12
    val stcoSz = 8 + 4 + 4 + 3 * 4
    val stbl = 8 + 102 + 24 + stscSz + stszSz + stcoSz
    val minf = 8 + 20 + 36 + stbl
    val mdia = 8 + 32 + 33 + minf
    val trak = 8 + 92 + mdia
    be4(8 + 108 + trak); tag("moov")
    be4(108); tag("mvhd"); be4(0); be4(0); be4(0); be4(1000); be4(200)
    be4(0x10000); bo.write(1); bo.write(0); bo.write(0); bo.write(0)
    be4(0); be4(0)
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(be4)
    (0 until 6).foreach(_ => be4(0)); be4(2)
    be4(trak); tag("trak")
    be4(92); tag("tkhd"); be4(7); be4(0); be4(0); be4(1); be4(0); be4(200)
    be4(0); be4(0); be4(0); be4(0)
    Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(be4)
    be4(16L << 16); be4(16L << 16)
    be4(mdia); tag("mdia")
    be4(32); tag("mdhd"); be4(0); be4(0); be4(0); be4(1000); be4(200)
    bo.write(0x55); bo.write(0xc4); bo.write(0); bo.write(0)
    be4(33); tag("hdlr"); be4(0); be4(0); tag("vide"); be4(0); be4(0); be4(0); bo.write(0)
    be4(minf); tag("minf")
    be4(20); tag("vmhd"); be4(1); be4(0); be4(0)
    be4(36); tag("dinf"); be4(28); tag("dref"); be4(0); be4(1); be4(12); tag("url "); be4(1)
    be4(stbl); tag("stbl")
    be4(102); tag("stsd"); be4(0); be4(1); be4(86); tag("mp4v")
    (0 until 6).foreach(_ => bo.write(0))
    bo.write(0); bo.write(1) // data ref index
    bo.write(0); bo.write(0); bo.write(0); bo.write(0)
    (0 until 3).foreach(_ => be4(0))
    bo.write(0); bo.write(16); bo.write(0); bo.write(16) // w, h
    be4(0x480000); be4(0x480000); be4(0)
    bo.write(0); bo.write(1)
    (0 until 32).foreach(_ => bo.write(0))
    bo.write(0); bo.write(0x18); bo.write(0xff); bo.write(0xff)
    be4(24); tag("stts"); be4(0); be4(1); be4(5); be4(40)
    be4(stscSz); tag("stsc"); be4(0); be4(2)
    be4(1); be4(2); be4(1) // chunks 1..2: 2 samples each
    be4(3); be4(1); be4(1) // chunks 3..: 1 sample
    be4(stszSz); tag("stsz"); be4(0); be4(0); be4(5); sizes.foreach(be4)
    be4(stcoSz); tag("stco"); be4(0); be4(3); be4(32); be4(39); be4(50)
    val bytes = bo.toByteArray
    val m = Mp4.demux(bytes)
    assert(m.sampleOffsets.toSeq == Seq(32L, 35L, 39L, 44L, 50L))
    assert(m.sampleSizes.toSeq == sizes)
    // extraction inverts: concatenated samples == the mdat payload
    val cat = (0 until 5).flatMap(i => Mp4.sample(bytes, m, i))
    assert(cat == data.toSeq)
  }

  test("guards: 64-bit size, overrunning box, v1 tkhd, incomplete tables") {
    val ok = Mp4.mp4Payload(16, 16, frames(1L, 2), 1000, 40)
    // size == 1 (64-bit largesize) refused
    val big = ok.clone()
    big(0) = 0; big(1) = 0; big(2) = 0; big(3) = 1
    val e1 = intercept[IllegalArgumentException](Mp4.demux(big))
    assert(e1.getMessage.contains("64-bit"), e1.getMessage)
    // truncation: a box overruns its container
    val cut = ok.take(ok.length - 10)
    assert(Mp4.tryDemux(cut).isEmpty)
    // tkhd version 1 refused (find the tkhd box, bump its version)
    val v1 = ok.clone()
    val at = (0 until v1.length - 8).find(i =>
      v1(i + 4) == 't' && v1(i + 5) == 'k' && v1(i + 6) == 'h' && v1(i + 7) == 'd').get
    v1(at + 8) = 1
    val e3 = intercept[IllegalArgumentException](Mp4.demux(v1))
    assert(e3.getMessage.contains("tkhd version 1"), e3.getMessage)
  }
}
