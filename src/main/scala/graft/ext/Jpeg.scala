package graft.ext

import graft.ext.Multimodal.RasterImage

/** Baseline JPEG (ITU T.81 sequential DCT, Huffman entropy coding) —
  * decoder and encoder twin, pure JVM, zero native deps. This closes
  * the last marked IMAGE stub in [[Multimodal]]: PPM/BMP/PNG were
  * already real; JPEG was the one remaining entropy-coded format
  * (MP3/MP4 stay honestly stubbed — audio codecs and container
  * demuxing are out of scope in this container).
  *
  * Decoder scope (guarded loudly): baseline SOF0 only (progressive
  * SOF2, arithmetic coding, lossless modes are refused), 8-bit
  * precision, 1 or 3 components, sampling factors 1-2 in each axis
  * (grayscale, 4:4:4, 4:2:2, 4:2:0), restart markers (DRI/RSTn),
  * multi-segment DHT/DQT. Tables are read FROM the file, so streams
  * written by real encoders (libjpeg via ImageIO, optimized-table
  * writers) decode — `MultimodalSpec` cross-checks both directions
  * against the JDK's ImageIO codec. Chroma upsampling is sample
  * replication (the spec's simplest conforming choice; libjpeg's
  * "fancy" triangle filter differs by a few LSBs near chroma edges,
  * which is why the ImageIO cross-check uses a tolerance while the
  * own-encoder round trip is pinned exactly where the math is exact).
  *
  * Encoder: Annex K quantization + Huffman tables, 4:4:4 or 4:2:0,
  * edge-replicated MCU padding, byte-stuffed entropy stream. The
  * encoder exists for the same reason `pngPayload`/`bmpPayload` do:
  * round-trip proof and deterministic fixtures (`x_jpeg_roundtrip`
  * crafts images whose reconstruction is EXACT by construction —
  * even-gray blocks quantize to a lone DC coefficient that the Annex
  * K table divides without loss, so the decoder must reproduce the
  * source byte-for-byte, hash-checked against the DuckDB oracle).
  *
  * Scale shape: one record in → one decode out, map-side inside a
  * partition iterator; no shuffle, no driver involvement (same
  * contract as the other codecs in [[Multimodal]]).
  */
object Jpeg {

  /** Natural-order index of each zigzag position (T.81 Figure A.6). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — the separable DCT
    * basis shared by the forward and inverse transforms.
    */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ----- Annex K tables (the public spec's example tables) -----

  private val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray

  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  // =================================================================
  // Decoder
  // =================================================================

  /** Canonical Huffman table in the spec's decode shape: per code
    * length, the smallest/largest code and the index of its first
    * symbol (T.81 F.2.2.3 DECODE procedure).
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // bits is 1-indexed by code length 1..16
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l)
          k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** MSB-first bit reader over the entropy-coded segment, transparent
    * to 0xFF00 byte stuffing; any real marker under the cursor is
    * surfaced via [[atMarker]]/[[readMarker]] (restart handling).
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "JPEG: entropy stream truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "JPEG: entropy stream truncated at 0xFF")
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) pos += 1
          else throw new IllegalArgumentException(
            f"JPEG: unexpected marker 0xFF$b2%02X inside entropy data")
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def byteAlign(): Unit = nbits = 0
    /** After byteAlign: true iff the next two bytes are the marker. */
    def readRestart(): Int = {
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff,
        "JPEG: expected restart marker")
      val m = bytes(pos + 1) & 0xff
      require(m >= 0xd0 && m <= 0xd7, f"JPEG: expected RSTn, got 0xFF$m%02X")
      pos += 2
      m
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (l < 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
        code = (code << 1) | nextBit()
        l += 1
      }
      require(t.maxCode(l) >= 0 && code <= t.maxCode(l), "JPEG: invalid Huffman code")
      t.value(l, code)
    }
  }

  /** EXTEND (T.81 F.2.2.1): map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(
      id: Int, h: Int, v: Int, tq: Int, var td: Int = 0, var ta: Int = 0)

  private def be2(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  def decode(bytes: Array[Byte]): RasterImage = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "JPEG: bad SOI")
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var i = 2
    var scanStart = -1

    while (scanStart < 0) {
      require(i + 2 <= bytes.length, "JPEG: truncated before SOS")
      require((bytes(i) & 0xff) == 0xff, f"JPEG: expected marker at $i, got 0x${bytes(i) & 0xff}%02X")
      // T.81 B.1.1.2: any number of 0xFF fill bytes may precede the marker code
      while (i + 2 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
      val marker = bytes(i + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        // standalone markers (TEM, stray RSTn): no length field follows
        i += 2
      } else {
      require(i + 4 <= bytes.length, "JPEG: truncated before SOS")
      val len = be2(bytes, i + 2)
      val seg = i + 4
      marker match {
        case 0xdb => // DQT — possibly several tables per segment
          var p = seg
          while (p < seg + len - 2) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "JPEG: 16-bit quantization tables not supported")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = bytes(p + 1 + k) & 0xff; k += 1 }
            qt(tq) = t
            p += 65
          }
        case 0xc4 => // DHT — possibly several tables per segment
          var p = seg
          while (p < seg + len - 2) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = bytes(p + l) & 0xff; n += bits(l); l += 1 }
            val vals = new Array[Int](n)
            var k = 0
            while (k < n) { vals(k) = bytes(p + 17 + k) & 0xff; k += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          require(comps == null, "JPEG: multiple SOF segments")
          require((bytes(seg) & 0xff) == 8, "JPEG: only 8-bit precision supported")
          height = be2(bytes, seg + 1)
          width = be2(bytes, seg + 3)
          val nc = bytes(seg + 5) & 0xff
          require(nc == 1 || nc == 3, s"JPEG: $nc components not supported (1 or 3)")
          comps = Array.tabulate(nc) { c =>
            val id = bytes(seg + 6 + c * 3) & 0xff
            val hv = bytes(seg + 7 + c * 3) & 0xff
            val comp = Comp(id, hv >> 4, hv & 0x0f, bytes(seg + 8 + c * 3) & 0xff)
            require(comp.h >= 1 && comp.h <= 2 && comp.v >= 1 && comp.v <= 2,
              s"JPEG: sampling factor ${comp.h}x${comp.v} not supported")
            comp
          }
        case m if m == 0xc1 || m == 0xc2 || m == 0xc3 || (m >= 0xc5 && m <= 0xcf && m != 0xc8) =>
          throw new IllegalArgumentException(
            f"JPEG: SOF 0x$m%02X not supported (baseline sequential SOF0 only)")
        case 0xdd => restartInterval = be2(bytes, seg)
        case 0xda => // SOS
          require(comps != null, "JPEG: SOS before SOF0")
          val ns = bytes(seg) & 0xff
          require(ns == comps.length, "JPEG: partial scans not supported (baseline interleaved)")
          var c = 0
          while (c < ns) {
            val cs = bytes(seg + 1 + c * 2) & 0xff
            val comp = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"JPEG: SOS references unknown component $cs"))
            comp.td = (bytes(seg + 2 + c * 2) & 0xff) >> 4
            comp.ta = bytes(seg + 2 + c * 2) & 0x0f
            c += 1
          }
          scanStart = seg + 1 + ns * 2 + 3
        case 0xd9 => throw new IllegalArgumentException("JPEG: EOI before SOS")
        case _ => () // APPn, COM, others: skip
      }
      if (scanStart < 0) i += 2 + len
      }
    }

    require(width > 0 && height > 0, "JPEG: zero dimensions")
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val single = comps.length == 1
    // non-interleaved single-component scans ignore sampling factors
    val mcusX = if (single) (width + 7) / 8 else (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = if (single) (height + 7) / 8 else (height + 8 * maxV - 1) / (8 * maxV)
    final case class Plane(blocksW: Int, blocksH: Int, samples: Array[Int])
    val planes = comps.map { c =>
      val bw = if (single) mcusX else mcusX * c.h
      val bh = if (single) mcusY else mcusY * c.v
      Plane(bw, bh, new Array[Int](bw * 8 * bh * 8))
    }
    val preds = new Array[Int](comps.length)
    val reader = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val sampleRow = new Array[Double](8)

    def decodeBlock(ci: Int, blockX: Int, blockY: Int): Unit = {
      val c = comps(ci)
      val q = qt(c.tq)
      require(q != null, s"JPEG: missing quantization table ${c.tq}")
      require(dcT(c.td) != null && acT(c.ta) != null, "JPEG: missing Huffman table")
      java.util.Arrays.fill(coef, 0)
      val s = reader.decodeHuff(dcT(c.td))
      preds(ci) += extend(reader.receive(s), s)
      coef(0) = preds(ci) * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = reader.decodeHuff(acT(c.ta))
        val r = rs >> 4
        val sz = rs & 0x0f
        if (sz == 0) {
          if (r == 15) k += 16 else done = true
        } else {
          k += r
          require(k < 64, "JPEG: AC run past block end")
          coef(ZigZag(k)) = extend(reader.receive(sz), sz) * q(ZigZag(k))
          k += 1
        }
      }
      // separable IDCT: rows in u then columns in v
      val tmp = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) { acc += Cos(x)(u) * coef(y * 8 + u); u += 1 }
          tmp(y * 8 + x) = acc
          x += 1
        }
        y += 1
      }
      val plane = planes(ci)
      val stride = plane.blocksW * 8
      var x = 0
      while (x < 8) {
        var v = 0
        while (v < 8) { sampleRow(v) = tmp(v * 8 + x); v += 1 }
        y = 0
        while (y < 8) {
          var acc = 0.0
          var v = 0
          while (v < 8) { acc += Cos(y)(v) * sampleRow(v); v += 1 }
          val px = (math.round(acc) + 128).toInt
          plane.samples((blockY * 8 + y) * stride + blockX * 8 + x) =
            if (px < 0) 0 else if (px > 255) 255 else px
          y += 1
        }
        x += 1
      }
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        reader.byteAlign()
        reader.readRestart()
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val (hh, vv) = if (single) (1, 1) else (c.h, c.v)
        var bv = 0
        while (bv < vv) {
          var bh = 0
          while (bh < hh) {
            decodeBlock(ci, mx * hh + bh, my * vv + bv)
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }

    val out = new Array[Byte](width * height * 3)
    if (single) {
      val p = planes(0)
      val stride = p.blocksW * 8
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          val g = p.samples(yy * stride + xx).toByte
          val o = (yy * width + xx) * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g
          xx += 1
        }
        yy += 1
      }
    } else {
      val py = planes(0); val pb = planes(1); val pr = planes(2)
      val sy = py.blocksW * 8; val sb = pb.blocksW * 8; val sr = pr.blocksW * 8
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          val yv = py.samples((yy * cy.v / maxV) * sy + xx * cy.h / maxH)
          val cbv = pb.samples((yy * cb.v / maxV) * sb + xx * cb.h / maxH) - 128
          val crv = pr.samples((yy * cr.v / maxV) * sr + xx * cr.h / maxH) - 128
          def clamp(d: Double): Byte = {
            val r = math.round(d).toInt
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          val o = (yy * width + xx) * 3
          out(o) = clamp(yv + 1.402 * crv)
          out(o + 1) = clamp(yv - 0.344136 * cbv - 0.714136 * crv)
          out(o + 2) = clamp(yv + 1.772 * cbv)
          xx += 1
        }
        yy += 1
      }
    }
    RasterImage(width, height, out)
  }

  def tryDecode(bytes: Array[Byte]): Option[RasterImage] =
    if (bytes.length < 3 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8 ||
        (bytes(2) & 0xff) != 0xff) None
    else
      try Some(decode(bytes))
      catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }

  // =================================================================
  // Encoder
  // =================================================================

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var l = len - 1
      while (l >= 0) {
        acc = (acc << 1) | ((code >> l) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0
          nbits = 0
        }
        l -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) put(0x7f, 8 - nbits) // pad with 1s
  }

  /** (code, length) per symbol from a BITS/HUFFVAL pair — canonical
    * assignment, the encoder-side mirror of [[HuffTable]].
    */
  private def encTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val t = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var j = 0
      while (j < bits(l)) {
        t(vals(k)) = (code, l)
        code += 1
        k += 1
        j += 1
      }
      code <<= 1
      l += 1
    }
    t
  }

  private lazy val EncDcLuma = encTable(DcLumaBits, DcLumaVals)
  private lazy val EncDcChroma = encTable(DcChromaBits, DcChromaVals)
  private lazy val EncAcLuma = encTable(AcLumaBits, AcLumaVals)
  private lazy val EncAcChroma = encTable(AcChromaBits, AcChromaVals)

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode top-down RGB as baseline JFIF: Annex K tables, 4:4:4
    * (`subsample = false`) or 4:2:0 (2x2 chroma averaging), edge
    * replication to MCU multiples. `restartInterval > 0` emits a DRI
    * segment and RSTn markers every N MCUs with DC-predictor resets —
    * the error-resilience layout real camera streams use, and the
    * decoder path that would otherwise go untested.
    */
  def encode(width: Int, height: Int, rgbTopDown: Array[Byte], subsample: Boolean,
      restartInterval: Int = 0): Array[Byte] = {
    require(rgbTopDown.length == width * height * 3,
      s"jpeg encode: ${rgbTopDown.length} bytes for ${width}x$height")
    val mcuW = if (subsample) 16 else 8
    val mcuH = if (subsample) 16 else 8
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    val padW = mcusX * mcuW
    val padH = mcusY * mcuH

    // full-resolution YCbCr planes with edge replication
    val yP = new Array[Double](padW * padH)
    val bP = new Array[Double](padW * padH)
    val rP = new Array[Double](padW * padH)
    var y = 0
    while (y < padH) {
      val sy = math.min(y, height - 1)
      var x = 0
      while (x < padW) {
        val sx = math.min(x, width - 1)
        val o = (sy * width + sx) * 3
        val r = rgbTopDown(o) & 0xff
        val g = rgbTopDown(o + 1) & 0xff
        val b = rgbTopDown(o + 2) & 0xff
        val i = y * padW + x
        yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
        bP(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        rP(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        x += 1
      }
      y += 1
    }
    // chroma planes at coded resolution
    val cW = if (subsample) padW / 2 else padW
    val cH = if (subsample) padH / 2 else padH
    def subPlane(src: Array[Double]): Array[Double] =
      if (!subsample) src
      else Array.tabulate(cW * cH) { i =>
        val cx = (i % cW) * 2
        val cy = (i / cW) * 2
        (src(cy * padW + cx) + src(cy * padW + cx + 1) +
          src((cy + 1) * padW + cx) + src((cy + 1) * padW + cx + 1)) / 4.0
      }
    val cbP = subPlane(bP)
    val crP = subPlane(rP)

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      body.foreach(b => out.write(b & 0xff))
    }
    marker(0xd8) // SOI
    seg(0xe0, Array(0x4a, 0x46, 0x49, 0x46, 0x00, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // JFIF APP0
    seg(0xdb, 0 +: (0 until 64).map(k => QLuma(ZigZag(k))).toArray)
    seg(0xdb, 1 +: (0 until 64).map(k => QChroma(ZigZag(k))).toArray)
    val (h1, v1) = if (subsample) (2, 2) else (1, 1)
    seg(0xc0, Array(8, (height >> 8) & 0xff, height & 0xff, (width >> 8) & 0xff, width & 0xff, 3,
      1, (h1 << 4) | v1, 0, 2, 0x11, 1, 3, 0x11, 1))
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(0xc4, ((tc << 4) | th) +: (bits.drop(1) ++ vals))
    dht(0, 0, DcLumaBits, DcLumaVals)
    dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals)
    dht(1, 1, AcChromaBits, AcChromaVals)
    if (restartInterval > 0)
      seg(0xdd, Array((restartInterval >> 8) & 0xff, restartInterval & 0xff))
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)

    def encodeBlock(plane: Array[Double], stride: Int, bx: Int, by: Int,
        q: Array[Int], dc: Array[(Int, Int)], ac: Array[(Int, Int)], ci: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          block(yy * 8 + xx) = plane((by * 8 + yy) * stride + bx * 8 + xx) - 128.0
          xx += 1
        }
        yy += 1
      }
      // forward DCT: F(u,v) = ΣΣ s(x,y)·Cos(x)(u)·Cos(y)(v)
      val tmp = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var yy2 = 0
        while (yy2 < 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) { acc += block(yy2 * 8 + x) * Cos(x)(u); x += 1 }
          tmp(yy2 * 8 + u) = acc
          yy2 += 1
        }
        u += 1
      }
      var v = 0
      while (v < 8) {
        u = 0
        while (u < 8) {
          var acc = 0.0
          var yy2 = 0
          while (yy2 < 8) { acc += tmp(yy2 * 8 + u) * Cos(yy2)(v); yy2 += 1 }
          coef(v * 8 + u) = math.round(acc / q(v * 8 + u)).toInt
          u += 1
        }
        v += 1
      }
      // DC
      val diff = coef(0) - preds(ci)
      preds(ci) = coef(0)
      val s = category(diff)
      val (dcCode, dcLen) = dc(s)
      bw.put(dcCode, dcLen)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC with run-lengths
      var k = 1
      var run = 0
      while (k < 64) {
        val c = coef(ZigZag(k))
        if (c == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = ac(0xf0); bw.put(z, zl); run -= 16 }
          val sz = category(c)
          val (code, len) = ac((run << 4) | sz)
          bw.put(code, len)
          bw.put(if (c < 0) c + (1 << sz) - 1 else c, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (e, el) = ac(0x00); bw.put(e, el) }
    }

    val yStride = padW
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + ((mcu / restartInterval - 1) % 8)) // RSTn, cycling 0..7
          java.util.Arrays.fill(preds, 0)
        }
        if (subsample) {
          var bv = 0
          while (bv < 2) {
            var bh = 0
            while (bh < 2) {
              encodeBlock(yP, yStride, mx * 2 + bh, my * 2 + bv, QLuma, EncDcLuma, EncAcLuma, 0)
              bh += 1
            }
            bv += 1
          }
          encodeBlock(cbP, cW, mx, my, QChroma, EncDcChroma, EncAcChroma, 1)
          encodeBlock(crP, cW, mx, my, QChroma, EncDcChroma, EncAcChroma, 2)
        } else {
          encodeBlock(yP, yStride, mx, my, QLuma, EncDcLuma, EncAcLuma, 0)
          encodeBlock(cbP, cW, mx, my, QChroma, EncDcChroma, EncAcChroma, 1)
          encodeBlock(crP, cW, mx, my, QChroma, EncDcChroma, EncAcChroma, 2)
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
