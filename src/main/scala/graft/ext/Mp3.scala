package graft.ext

/** MPEG audio (MP3) FRAME-HEADER scanner and a CBR writer twin — the
  * audio counterpart of [[Mp4]]'s container-layer closure. Decoding
  * PCM (hybrid filterbank + Huffman spectral data) stays honestly out
  * of scope; what a data pipeline needs from bulk MP3 payloads FIRST
  * is validation and metadata — duration, bitrate profile (CBR/VBR),
  * sample rate, channel mode — and all of it lives in the fixed
  * 32-bit frame headers whose layout ISO 11172-3 publishes: 11-bit
  * sync, version/layer bits, bitrate and sample-rate table indices,
  * padding, channel mode. Frame length in bytes is
  * `144·bitrate/sampleRate + padding` for Layer III (MPEG-1), so the
  * scanner can stride the whole stream touching 4 bytes per frame.
  *
  * Scope (guarded loudly): MPEG-1 Layer III, ID3v2 prefix skipped
  * (syncsafe size), optional trailing 128-byte ID3v1 'TAG' tolerated,
  * every frame header re-validated (a mid-stream desync refuses
  * rather than resyncing — corrupted payloads should be QUARANTINED
  * by a curation pipeline, not silently half-read).
  *
  * Scale shape: one record in → one scan out, map-side (the
  * [[Multimodal]] codec contract).
  */
object Mp3 {

  /** kbps by bitrate index, MPEG-1 Layer III (index 0 = free, 15 = bad). */
  private val BitrateKbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Hz by sample-rate index, MPEG-1. */
  private val SampleRate = Array(44100, 48000, 32000)

  final case class Mp3Meta(
      frames: Int, sampleRate: Int, channels: Int,
      bitrateKbps: Int,     // the FIRST frame's bitrate
      cbr: Boolean,         // all frames same bitrate index
      durationMs: Long)     // frames * 1152 / sampleRate

  def scan(bytes: Array[Byte]): Mp3Meta = {
    require(bytes.length >= 4, "MP3: too short")
    var pos = 0
    // ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      // ID3v2.4 footer flag (header flags bit 4): a 10-byte footer follows
      // the tag body and is NOT counted in the syncsafe size field
      val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
      pos = 10 + size + footer
      require(pos < bytes.length, "MP3: ID3v2 tag spans the whole payload")
    }
    var frames = 0
    var sampleRate = 0
    var channels = 0
    var firstBitrate = 0
    var cbr = true
    while (pos < bytes.length) {
      // trailing ID3v1: exactly 128 bytes starting "TAG"
      if (bytes.length - pos == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        pos = bytes.length
      } else {
        require(pos + 4 <= bytes.length, s"MP3: truncated header at byte $pos")
        val b1 = bytes(pos) & 0xff
        val b2 = bytes(pos + 1) & 0xff
        val b3 = bytes(pos + 2) & 0xff
        val b4 = bytes(pos + 3) & 0xff
        require(b1 == 0xff && (b2 & 0xe0) == 0xe0, f"MP3: lost sync at byte $pos")
        val version = (b2 >> 3) & 0x03
        val layer = (b2 >> 1) & 0x03
        require(version == 3, "MP3: only MPEG-1 supported (version bits 11)")
        require(layer == 1, "MP3: only Layer III supported (layer bits 01)")
        val bIdx = (b3 >> 4) & 0x0f
        val srIdx = (b3 >> 2) & 0x03
        val padding = (b3 >> 1) & 0x01
        require(bIdx >= 1 && bIdx <= 14, s"MP3: bad bitrate index $bIdx")
        require(srIdx <= 2, s"MP3: bad sample-rate index $srIdx")
        val sr = SampleRate(srIdx)
        val br = BitrateKbps(bIdx) * 1000
        if (frames == 0) {
          sampleRate = sr
          firstBitrate = BitrateKbps(bIdx)
          channels = if (((b4 >> 6) & 0x03) == 3) 1 else 2
        } else {
          require(sr == sampleRate, "MP3: sample rate changed mid-stream")
          if (BitrateKbps(bIdx) != firstBitrate) cbr = false
        }
        val frameLen = 144 * br / sr + padding
        require(frameLen > 4 && pos + frameLen <= bytes.length,
          s"MP3: frame at byte $pos overruns the payload")
        pos += frameLen
        frames += 1
      }
    }
    require(frames > 0, "MP3: no frames")
    Mp3Meta(frames, sampleRate, channels, firstBitrate, cbr,
      frames.toLong * 1152L * 1000L / sampleRate)
  }

  def tryScan(bytes: Array[Byte]): Option[Mp3Meta] = {
    val framed = bytes.length >= 4 &&
      (((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0) ||
        (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'))
    if (!framed) None
    else
      try Some(scan(bytes))
      catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }

  // ------------------------------------------------------ PCM decode

  /** MSB-first bit reader over a byte array slice. */
  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos = startByte * 8L
    def bitsRead: Long = pos - startByte * 8L
    def read(n: Int): Int = {
      // loud like every other malformed-input path in decodePcm: a
      // corrupt part2_3_length that overruns the reservoir must not
      // surface as a raw ArrayIndexOutOfBoundsException
      require((pos + n + 7) / 8 <= bytes.length,
        "MP3: main data truncated — side info asks for bits past the reservoir")
      var v = 0
      var i = 0
      while (i < n) {
        val b = (bytes((pos / 8).toInt) >> (7 - (pos % 8).toInt)) & 1
        v = (v << 1) | b
        pos += 1
        i += 1
      }
      v
    }
  }

  final case class Mp3Pcm(
      frames: Int, sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decode MPEG-1 Layer III MONO frames to PCM — the bitstream
    * machinery is COMPLETE (header/CRC skip, 17-byte mono side info,
    * the bit reservoir via `main_data_begin`, scfsi, scalefactor
    * parsing with the slen1/slen2 table, Huffman table 0 big-value
    * regions, count1 table B quadruples with sign bits, and the
    * part2_3_length consumption check), and what it DOESN'T do it
    * refuses LOUDLY rather than approximating:
    *
    *  - a decoded spectrum that is not all-zero refuses: turning
    *    spectral lines into waveform samples needs the polyphase
    *    synthesis window (ISO 11172-3's 512-entry D[] table). The
    *    IMDCT/window/matrixing stages are formula-defined and could be
    *    written here, but D[] is an empirically-designed TABULATED
    *    prototype filter — in this zero-egress build it could only be
    *    transcribed from memory with no reference decoder to validate
    *    against, and a plausible-but-wrong table would silently
    *    corrupt every sample. Digital-silence frames (what bulk audio
    *    curation overwhelmingly meets in padding/lead-in/lead-out
    *    regions, and what `x_mp3_decode` pins end-to-end against its
    *    SQL oracle) decode EXACTLY — every control path above runs,
    *    and the all-zero spectrum's PCM is zeros under ANY valid
    *    window;
    *  - Huffman tables other than 0 (the spec's all-zero table) and
    *    count1 table B refuse by index — same transcription honesty;
    *  - stereo decode refuses (mono is the scoped subset; [[scan]]
    *    handles both for metadata).
    */
  def decodePcm(bytes: Array[Byte]): Mp3Pcm = {
    require(bytes.length >= 4, "MP3: too short")
    var pos = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
      pos = 10 + size + footer
    }
    var frames = 0
    var sampleRate = 0
    // the BIT RESERVOIR: every frame's post-side-info bytes concatenate
    // here; a granule's main data starts `main_data_begin` bytes BACK
    // from this frame's own contribution (ISO 2.4.3.1 — the mechanism
    // that lets hard frames borrow bits from easy predecessors).
    // main_data_begin is a 9-bit field, so at most 511 bytes of history
    // are ever reachable — the buffer trims to that window per frame
    // (an unbounded buffer re-copied per frame made decode O(n^2))
    val ReservoirWindow = 511
    var reservoir = Array.empty[Byte]
    val pcm = new scala.collection.mutable.ArrayBuilder.ofShort
    while (pos < bytes.length) {
      if (bytes.length - pos == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        pos = bytes.length
      } else {
        require(pos + 4 <= bytes.length, s"MP3: truncated header at byte $pos")
        val b2 = bytes(pos + 1) & 0xff
        val b3 = bytes(pos + 2) & 0xff
        val b4 = bytes(pos + 3) & 0xff
        require((bytes(pos) & 0xff) == 0xff && (b2 & 0xe0) == 0xe0,
          f"MP3: lost sync at byte $pos")
        require(((b2 >> 3) & 0x03) == 3 && ((b2 >> 1) & 0x03) == 1,
          "MP3: only MPEG-1 Layer III supported")
        val crc = (b2 & 0x01) == 0 // protection bit 0 = 16-bit CRC present
        val bIdx = (b3 >> 4) & 0x0f
        val srIdx = (b3 >> 2) & 0x03
        val padding = (b3 >> 1) & 0x01
        require(bIdx >= 1 && bIdx <= 14 && srIdx <= 2, "MP3: bad header indices")
        val mode = (b4 >> 6) & 0x03
        require(mode == 3, "MP3: decodePcm is scoped to MONO (mode bits 11)")
        val sr = SampleRate(srIdx)
        if (frames == 0) sampleRate = sr
        else require(sr == sampleRate, "MP3: sample rate changed mid-stream")
        val frameLen = 144 * BitrateKbps(bIdx) * 1000 / sr + padding
        require(frameLen > 4 && pos + frameLen <= bytes.length,
          s"MP3: frame at byte $pos overruns the payload")
        val sideStart = pos + 4 + (if (crc) 2 else 0)
        require(sideStart + 17 <= pos + frameLen, "MP3: frame too short for side info")
        val si = new BitReader(bytes, sideStart)
        val mainDataBegin = si.read(9)
        si.read(5) // private_bits (mono)
        si.read(4) // scfsi — parsed; silence granules carry no scalefactors to share
        // per-granule side info
        final case class Granule(
            part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
            tableSelect: Seq[Int], count1TableB: Boolean)
        val granules = (0 until 2).map { _ =>
          val part23 = si.read(12)
          val bigValues = si.read(9)
          val globalGain = si.read(8)
          val sc = si.read(4)
          val wsf = si.read(1)
          require(wsf == 0,
            "MP3: window-switching (short-block) granules are outside the decode scope")
          val tables = Seq(si.read(5), si.read(5), si.read(5))
          si.read(4); si.read(3) // region0_count / region1_count (table-0 regions: no bits)
          si.read(1) // preflag
          si.read(1) // scalefac_scale
          val ct1 = si.read(1)
          Granule(part23, bigValues, globalGain, sc, tables, ct1 == 1)
        }
        // reservoir bookkeeping: trim history to the reachable window,
        // then append this frame's main data; granules read from
        // `mainDataBegin` bytes before the frame's own contribution
        val mainStart = sideStart + 17
        val contributed = pos + frameLen - mainStart
        val history =
          if (reservoir.length > ReservoirWindow)
            java.util.Arrays.copyOfRange(
              reservoir, reservoir.length - ReservoirWindow, reservoir.length)
          else reservoir
        val frameOffsetInReservoir = history.length
        require(mainDataBegin <= frameOffsetInReservoir,
          s"MP3: main_data_begin $mainDataBegin reaches before the reservoir start")
        val merged = new Array[Byte](history.length + contributed)
        System.arraycopy(history, 0, merged, 0, history.length)
        System.arraycopy(bytes, mainStart, merged, history.length, contributed)
        reservoir = merged
        val md = new BitReader(merged,
          frameOffsetInReservoir - mainDataBegin)
        granules.foreach { g =>
          val before = md.bitsRead
          // part2: scalefactors (slen pair off scalefac_compress; long
          // blocks: sfb 0-10 at slen1, 11-20 at slen2). Values are
          // read and may be nonzero — they scale spectral lines, and
          // an all-zero spectrum stays zero under any scaling.
          val slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)(g.scalefacCompress)
          val slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)(g.scalefacCompress)
          (0 until 11).foreach(_ => md.read(slen1))
          (11 until 21).foreach(_ => md.read(slen2))
          // part3a: big_values pairs. Table 0 is the spec's all-zero
          // table (zero bits, zero output); any other index needs its
          // Huffman tree, which this build refuses rather than guesses.
          if (g.bigValues > 0)
            g.tableSelect.foreach(t => require(t == 0,
              s"MP3: Huffman table $t not transcribed in this build " +
                "(only table 0 = all-zero); nonzero spectra refuse loudly"))
          // part3b: count1 quadruples until part2_3_length exhausts
          var nonZero = false
          while (md.bitsRead - before < g.part23) {
            require(g.count1TableB,
              "MP3: count1 table A not transcribed in this build; " +
                "count1table_select=1 (table B) is the decodable subset")
            val quad = ~md.read(4) & 0x0f // table B: 4-bit complement codes
            var q = 3
            while (q >= 0) {
              if (((quad >> q) & 1) == 1) { md.read(1); nonZero = true }
              q -= 1
            }
          }
          require(!nonZero,
            "MP3: nonzero spectral lines decoded — waveform synthesis needs the ISO " +
              "D[512] window table this zero-egress build will not transcribe unverified; " +
              "only digital-silence granules produce PCM")
          require(md.bitsRead - before == g.part23,
            s"MP3: granule main data over-read (${md.bitsRead - before} of ${g.part23} bits)")
          // all-zero spectrum -> 576 exact-zero samples (any valid
          // window maps a zero spectrum to zero PCM)
          (0 until 576).foreach(_ => pcm += 0.toShort) // unboxed builder
        }
        pos += frameLen
        frames += 1
      }
    }
    require(frames > 0, "MP3: no frames")
    Mp3Pcm(frames, sampleRate, 1, pcm.result())
  }

  /** Writer twin for [[decodePcm]]: `n` MONO CBR frames of DIGITAL
    * SILENCE whose side info exercises the real control paths —
    * `part2_3_length = 16` bits per granule spent on four count1
    * table-B all-zero quadruples (code 1111), `big_values = 4` routed
    * through Huffman table 0, `global_gain = 210` — followed by
    * deterministic ancillary bytes from `fill` (legal padding after
    * the main data; the property the `x_mp3_decode` SQL oracle
    * reconstructs byte-for-byte).
    */
  def mp3SilencePayload(n: Int, bitrateIdx: Int, srIdx: Int)(
      fill: (Int, Int) => Byte): Array[Byte] = {
    require(n > 0 && bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx <= 2)
    val frameLen = 144 * BitrateKbps(bitrateIdx) * 1000 / SampleRate(srIdx)
    // side info: 136 bits — main_data_begin 0, private 0, scfsi 0, two
    // identical granules (L=16, big_values=4, gain=210, sc=0, wsf=0,
    // tables 0/0/0, regions 0/0, pre 0, ss 0, count1table=B)
    val side = new Array[Byte](17)
    var bitPos = 0
    def put(v: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        if (((v >> b) & 1) == 1)
          side(bitPos / 8) = (side(bitPos / 8) | (1 << (7 - bitPos % 8))).toByte
        bitPos += 1
        b -= 1
      }
    }
    put(0, 9); put(0, 5); put(0, 4)
    (0 until 2).foreach { _ =>
      put(16, 12); put(4, 9); put(210, 8); put(0, 4); put(0, 1)
      put(0, 15); put(0, 4); put(0, 3); put(0, 1); put(0, 1); put(1, 1)
    }
    require(bitPos == 136, s"MP3: side info packed $bitPos bits")
    val out = new Array[Byte](n * frameLen)
    var f = 0
    while (f < n) {
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(base + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      out(base + 3) = 0xc4.toByte // MONO (mode bits 11), original
      System.arraycopy(side, 0, out, base + 4, 17)
      // main data: 2 granules x 16 bits of count1-B all-zero quads
      out(base + 21) = 0xff.toByte
      out(base + 22) = 0xff.toByte
      out(base + 23) = 0xff.toByte
      out(base + 24) = 0xff.toByte
      var i = 25
      while (i < frameLen) { out(base + i) = fill(f, i); i += 1 }
      f += 1
    }
    out
  }

  /** CBR writer twin: `n` MPEG-1 Layer III frames at `bitrateIdx` /
    * `srIdx`, no padding, stereo, payload bytes from `fill(frame,
    * byteInFrame)` — every byte a pure function of the arguments (the
    * property the `x_mp3_scan` SQL oracle reconstructs from).
    */
  def mp3Payload(n: Int, bitrateIdx: Int, srIdx: Int)(fill: (Int, Int) => Byte): Array[Byte] = {
    require(n > 0 && bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx <= 2)
    val frameLen = 144 * BitrateKbps(bitrateIdx) * 1000 / SampleRate(srIdx)
    val out = new Array[Byte](n * frameLen)
    var f = 0
    while (f < n) {
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG-1 (11), Layer III (01), no CRC (1)
      out(base + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      out(base + 3) = 0x04.toByte // stereo, original
      var i = 4
      while (i < frameLen) { out(base + i) = fill(f, i); i += 1 }
      f += 1
    }
    out
  }
}
