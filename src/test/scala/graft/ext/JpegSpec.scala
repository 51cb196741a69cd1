package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** [[Jpeg]] — the baseline-DCT codec — proven three independent ways:
  * (1) pixel-exact against a STORED MATRIX (regression pin: any change
  * to the Huffman walk, dequant, IDCT or color convert moves at least
  * one of the 192 bytes); (2) exact-by-construction round trips
  * (even-gray images quantize to a lone losslessly-divisible DC, so
  * decode(encode(x)) == x bit-for-bit, including 4:2:0 subsampling and
  * non-MCU-aligned edge replication); (3) cross-checked BOTH WAYS
  * against the JDK's ImageIO JPEG codec (libjpeg lineage) — our bytes
  * through their decoder, their writer's bytes through ours — with
  * tolerances that are the known decoder freedoms (±1 IDCT rounding;
  * chroma-edge differences from libjpeg's triangle upsampling vs our
  * spec-conforming replication).
  */
class JpegSpec extends AnyFunSuite {

  /** Decoded pixels of encode(8x8 pattern (i·7+31) mod 256, 4:4:4) —
    * captured from a verified run (ImageIO agreed within ±1 on the
    * same bytes). A codec regression moves these.
    */
  private val StoredMatrix: Array[Int] = Array(
    25, 44, 50, 68, 64, 81, 71, 45, 72, 136, 113, 141, 106, 104, 125, 122,
    136, 149, 160, 168, 181, 181, 179, 192, 193, 189, 203, 250, 243, 255,
    233, 235, 250, 0, 7, 14, 3, 49, 49, 57, 97, 99, 56, 60, 72, 114, 85,
    107, 73, 143, 132, 116, 146, 148, 177, 159, 175, 191, 158, 179, 232,
    218, 233, 184, 199, 204, 212, 248, 248, 0, 24, 23, 35, 7, 29, 49, 31,
    47, 76, 84, 86, 52, 94, 82, 76, 135, 117, 121, 158, 150, 153, 135,
    151, 221, 156, 190, 173, 222, 218, 236, 239, 244, 252, 201, 216, 136,
    63, 80, 50, 0, 4, 73, 46, 53, 64, 59, 66, 73, 75, 87, 120, 80, 106,
    127, 93, 109, 150, 135, 132, 178, 190, 168, 174, 200, 173, 216, 219,
    210, 255, 238, 255, 127, 34, 78, 0, 46, 42, 28, 43, 40, 119, 96, 90,
    104, 70, 58, 114, 93, 76, 157, 151, 139, 107, 102, 106, 172, 161,
    177, 150, 186, 186, 211, 234, 226, 199, 214, 193, 231, 255, 219, 0,
    20, 0, 16, 46, 20, 72, 74, 73, 106, 78, 100)

  private def maxChannelDiff(
      ours: Multimodal.RasterImage, theirs: java.awt.image.BufferedImage): Int = {
    var m = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width) {
      val p = theirs.getRGB(x, y)
      val o = (y * ours.width + x) * 3
      m = math.max(m, math.abs(((p >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
      m = math.max(m, math.abs(((p >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
      m = math.max(m, math.abs((p & 0xff) - (ours.pixels(o + 2) & 0xff)))
    }
    m
  }

  private def imageIoRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  test("stored matrix: crafted baseline bytes decode pixel-exact") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 7 + 31) % 256).toByte)
    val img = Jpeg.decode(Jpeg.encode(8, 8, rgb, subsample = false))
    assert(img.width == 8 && img.height == 8)
    assert(img.pixels.map(_ & 0xff).toSeq == StoredMatrix.toSeq)
  }

  test("even-gray round trips are EXACT: lone DC, losslessly divisible quant") {
    // Y = c for gray (c,c,c); Cb = Cr = 128 -> 0; DC = 8(c-128) which
    // QLuma(0)=16 divides iff c is even -> reconstruction is exact math
    for ((w, h, sub) <- Seq((8, 8, false), (21, 13, true), (16, 16, true), (7, 5, false))) {
      val c = 130.toByte
      val const = Array.fill(w * h * 3)(c)
      val img = Jpeg.decode(Jpeg.encode(w, h, const, subsample = sub))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(const),
        s"${w}x$h subsample=$sub: even-gray round trip must be exact")
    }
  }

  test("fill bytes and standalone markers before SOS are legal (T.81 B.1.1.2)") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 7 + 31) % 256).toByte)
    val clean = Jpeg.encode(8, 8, rgb, subsample = false)
    // after SOI: two 0xFF fill bytes, then a standalone TEM (FF 01),
    // then one more fill byte gluing onto the original first marker's FF
    val doctored = clean.take(2) ++
      Array(0xff.toByte, 0xff.toByte, 0x01.toByte, 0xff.toByte) ++ clean.drop(2)
    val img = Jpeg.decode(doctored)
    assert(img.pixels.sameElements(Jpeg.decode(clean).pixels),
      "fill bytes + TEM must not change the decode")
  }

  test("our encoder's bytes agree with the JDK ImageIO decoder within IDCT rounding") {
    val rgb = Array.tabulate(24 * 16 * 3)(i => ((i * 11 + 5) % 256).toByte)
    val payload = Jpeg.encode(24, 16, rgb, subsample = false)
    val ours = Jpeg.decode(payload)
    val theirs = imageIoRead(payload)
    assert(theirs != null, "ImageIO refused our stream")
    assert(theirs.getWidth == 24 && theirs.getHeight == 16)
    assert(maxChannelDiff(ours, theirs) <= 2,
      "4:4:4: only IDCT + color-convert rounding may differ between conforming decoders")
  }

  test("the JDK ImageIO WRITER's bytes (4:2:0, real Huffman stream) decode within tolerance") {
    val src = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val r = (x * 8) & 0xff; val g = (y * 10) & 0xff; val b = ((x + y) * 4) & 0xff
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "jpg", bos)
    val jb = bos.toByteArray
    val ours = Jpeg.decode(jb)
    val theirs = imageIoRead(jb)
    assert(ours.width == 32 && ours.height == 24)
    // libjpeg's "fancy" triangle chroma upsampling vs our spec-simple
    // replication: a few LSBs near chroma gradients, nothing more
    assert(maxChannelDiff(ours, theirs) <= 12,
      "4:2:0 upsampling freedom exceeded the expected envelope")
  }

  test("grayscale single-component JPEG decodes (raw-raster compare, within rounding)") {
    val gs = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 9; x <- 0 until 17) {
      val v = (x * 13 + y * 7) & 0xff
      gs.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val gos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gs, "jpg", gos)
    val bytes = gos.toByteArray
    val ours = Jpeg.decode(bytes)
    val theirs = imageIoRead(bytes)
    assert(ours.width == 17 && ours.height == 9)
    var maxD = 0
    for (y <- 0 until 9; x <- 0 until 17) {
      // raw raster sample — getRGB on TYPE_BYTE_GRAY applies a
      // gray->sRGB conversion that would poison the compare
      val p = theirs.getRaster.getSample(x, y, 0)
      val o = (y * 17 + x) * 3
      maxD = math.max(maxD, math.abs(p - (ours.pixels(o) & 0xff)))
      // single-component decode replicates gray into all 3 channels
      assert(ours.pixels(o) == ours.pixels(o + 1) && ours.pixels(o) == ours.pixels(o + 2))
    }
    assert(maxD <= 1, s"grayscale decode off by $maxD")
  }

  test("restart markers: DRI/RSTn streams round-trip and agree with ImageIO") {
    // exactness survives restarts (predictor resets re-encode the DC)
    val const = Array.fill(40 * 24 * 3)(130.toByte)
    val cimg = Jpeg.decode(Jpeg.encode(40, 24, const, subsample = false, restartInterval = 3))
    assert(cimg.pixels.sameElements(const), "even-gray with restarts must stay exact")
    // and a third-party decoder accepts our DRI layout byte-for-byte
    val rgb = Array.tabulate(40 * 24 * 3)(i => ((i * 11 + 5) % 256).toByte)
    val payload = Jpeg.encode(40, 24, rgb, subsample = false, restartInterval = 2)
    val ours = Jpeg.decode(payload)
    val theirs = imageIoRead(payload)
    assert(theirs != null, "ImageIO refused our restart-marker stream")
    assert(maxChannelDiff(ours, theirs) <= 2)
  }

  test("refusals: progressive SOF2, truncated stream, non-JPEG bytes") {
    val rgb = Array.fill(8 * 8 * 3)(100.toByte)
    val ok = Jpeg.encode(8, 8, rgb, subsample = false)
    // corrupt SOF0 (0xC0) into SOF2 (0xC2): progressive must refuse
    val prog = ok.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e.getMessage.contains("SOF"), e.getMessage)
    // tryDecode: truncation and alien bytes -> None, no throw
    assert(Jpeg.tryDecode(ok.take(ok.length / 2)).isEmpty)
    assert(Jpeg.tryDecode("not a jpeg".getBytes("US-ASCII")).isEmpty)
    // and the Multimodal dispatch picks JPEG up as the fourth codec
    assert(Multimodal.tryDecodeImage(ok).exists(i => i.width == 8 && i.height == 8))
  }
}
