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

  // ------------------------------------------- spectrum decode (r16)

  /** Long-block SCALEFACTOR-BAND widths (ISO 11172-3 Table B.8,
    * MPEG-1): 21 bands summing to 576 lines. Transcribed for 44.1 and
    * 48 kHz and SUM-CHECKED at load; 32 kHz is not transcribed in
    * this zero-egress build and refuses.
    */
  private val SfbWidthsLong: Map[Int, Array[Int]] = Map(
    44100 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10,
      12, 16, 20, 24, 28, 34, 42, 50, 54, 76),
    48000 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10,
      12, 16, 18, 22, 28, 34, 40, 46, 54, 54))
  SfbWidthsLong.foreach { case (sr, w) =>
    require(w.length == 21 && w.sum == 576 - (if (sr == 48000) 192 else 158),
      s"MP3: sfb table for $sr does not cover the spectrum") }
  // the 22nd "band" is the tail past the last scalefactor band
  private def sfbBounds(sr: Int): Array[Int] = {
    val w = SfbWidthsLong.getOrElse(sr, throw new IllegalArgumentException(
      s"MP3: scalefactor-band table for $sr Hz not transcribed in this build"))
    w.scanLeft(0)(_ + _) :+ 576
  }

  /** preflag's per-band scalefactor addend (ISO 2.4.3.4.7.1 pretab). */
  private val Pretab = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  /** One transcribed big-values Huffman table: (x, y) -> (code, bits).
    * `linbits` escape extensions are machinery-supported but no
    * linbits table is transcribed yet.
    */
  private final case class BigValueTable(
      linbits: Int, codes: Map[(Int, Int), (Int, Int)]) {
    val maxLen: Int = if (codes.isEmpty) 0 else codes.values.map(_._2).max
    val decode: Map[(Int, Int), (Int, Int)] =
      codes.map { case (xy, cl) => cl -> xy }
    require(decode.size == codes.size, "MP3: Huffman table is not prefix-unique")
  }

  /** The transcribed big-values tables, keyed by `table_select`
    * (ISO 11172-3 Table B.7). Table 0 is the spec's all-zero table
    * (zero bits); table 1 is the 2x2 tree transcribed here and
    * ROUND-TRIP VERIFIED against [[mp3SpectrumPayload]] (the repo's
    * encoder-twin contract — the same verification the JPEG/PNG
    * codecs use in this zero-egress build). Absent indices refuse
    * loudly rather than guessing a tree.
    */
  private val BigValueTables: Map[Int, BigValueTable] = Map(
    0 -> BigValueTable(0, Map.empty),
    1 -> BigValueTable(0, Map(
      (0, 0) -> (1, 1), // 1
      (1, 0) -> (1, 2), // 01
      (0, 1) -> (1, 3), // 001
      (1, 1) -> (0, 3)))) // 000

  final case class Mp3Granule(lines: Array[Int], xr: Array[Double])
  final case class Mp3Spectrum(
      frames: Int, sampleRate: Int, granules: Seq[Mp3Granule])

  /** Decode MONO Layer III frames to REQUANTIZED SPECTRA — the stage
    * past [[decodePcm]]'s silence scope (r15 verdict item 6): real
    * big-values Huffman decode through the transcribed-table registry
    * (sign bits, escape/linbits machinery), count1 table-B quadruples,
    * and the spec's formula-defined requantization
    * `xr = sign·|is|^(4/3) · 2^((gain-210)/4) ·
    * 2^(-(scalefac_scale+1)/2 · (sfl(sfb) + preflag·pretab(sfb)))` —
    * per-band scalefactors applied through the sum-checked B.8 band
    * table. What stays out, loudly: the polyphase SYNTHESIS filterbank
    * (the tabulated D[512] window this zero-egress build will not
    * transcribe unverified — so spectra never silently become wrong
    * PCM), untranscribed Huffman tables, count1 table A, short
    * blocks, stereo, and 32 kHz band layout.
    */
  def decodeSpectrum(bytes: Array[Byte]): Mp3Spectrum = {
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
    val ReservoirWindow = 511
    var reservoir = Array.empty[Byte]
    val grans = Seq.newBuilder[Mp3Granule]
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
        val crc = (b2 & 0x01) == 0
        val bIdx = (b3 >> 4) & 0x0f
        val srIdx = (b3 >> 2) & 0x03
        val padding = (b3 >> 1) & 0x01
        require(bIdx >= 1 && bIdx <= 14 && srIdx <= 2, "MP3: bad header indices")
        require(((b4 >> 6) & 0x03) == 3, "MP3: decodeSpectrum is scoped to MONO")
        val sr = SampleRate(srIdx)
        if (frames == 0) sampleRate = sr
        else require(sr == sampleRate, "MP3: sample rate changed mid-stream")
        val bounds = sfbBounds(sr)
        val frameLen = 144 * BitrateKbps(bIdx) * 1000 / sr + padding
        require(frameLen > 4 && pos + frameLen <= bytes.length,
          s"MP3: frame at byte $pos overruns the payload")
        val sideStart = pos + 4 + (if (crc) 2 else 0)
        require(sideStart + 17 <= pos + frameLen, "MP3: frame too short for side info")
        val si = new BitReader(bytes, sideStart)
        val mainDataBegin = si.read(9)
        si.read(5); si.read(4) // private_bits, scfsi (no sharing: one frame's granules)
        final case class G(
            part23: Int, bigValues: Int, globalGain: Int, scalefacCompress: Int,
            tableSelect: Seq[Int], region0: Int, region1: Int,
            preflag: Boolean, scalefacScale: Int, count1TableB: Boolean)
        val side = (0 until 2).map { _ =>
          val part23 = si.read(12)
          val bigValues = si.read(9)
          val globalGain = si.read(8)
          val sc = si.read(4)
          require(si.read(1) == 0,
            "MP3: window-switching (short-block) granules are outside the decode scope")
          val tables = Seq(si.read(5), si.read(5), si.read(5))
          val r0 = si.read(4); val r1 = si.read(3)
          val pre = si.read(1)
          val ss = si.read(1)
          val ct1 = si.read(1)
          G(part23, bigValues, globalGain, sc, tables, r0, r1, pre == 1, ss, ct1 == 1)
        }
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
        val md = new BitReader(merged, frameOffsetInReservoir - mainDataBegin)
        side.foreach { g =>
          val before = md.bitsRead
          val slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)(g.scalefacCompress)
          val slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)(g.scalefacCompress)
          val sfl = new Array[Int](21)
          (0 until 11).foreach(i => sfl(i) = md.read(slen1))
          (11 until 21).foreach(i => sfl(i) = md.read(slen2))
          val lines = new Array[Int](576)
          // big_values pairs through the three regions' tables; region
          // boundaries are SFB indices resolved via the band table
          require(2 * g.bigValues <= 576, s"MP3: big_values ${g.bigValues} overruns")
          val r0End = bounds(math.min(g.region0 + 1, 21))
          val r1End = bounds(math.min(g.region0 + 1 + g.region1 + 1, 21))
          def tableFor(line: Int): BigValueTable = {
            val t = if (line < r0End) g.tableSelect(0)
              else if (line < r1End) g.tableSelect(1)
              else g.tableSelect(2)
            BigValueTables.getOrElse(t, throw new IllegalArgumentException(
              s"MP3: Huffman table $t not transcribed in this build " +
                s"(transcribed: ${BigValueTables.keys.toSeq.sorted.mkString(",")}); " +
                "refusing rather than guessing a code tree"))
          }
          def readBigValue(tab: BigValueTable): (Int, Int) = {
            if (tab.codes.isEmpty) return (0, 0) // table 0: zero bits, zero output
            var code = 0
            var len = 0
            while (!tab.decode.contains((code, len))) {
              require(len < tab.maxLen,
                "MP3: bit pattern matches no code in the transcribed table")
              code = (code << 1) | md.read(1)
              len += 1
            }
            val (x0, y0) = tab.decode((code, len))
            // ESCAPE (linbits) machinery: a 15 reads linbits more, then
            // a sign bit; the transcribed tables carry linbits = 0
            def full(v: Int): Int = {
              val esc = if (v == 15 && tab.linbits > 0) v + md.read(tab.linbits) else v
              if (esc != 0 && md.read(1) == 1) -esc else esc
            }
            (full(x0), full(y0))
          }
          var i = 0
          while (i < 2 * g.bigValues) {
            val (x, y) = readBigValue(tableFor(i))
            lines(i) = x
            lines(i + 1) = y
            i += 2
          }
          // count1 quadruples until part2_3_length exhausts
          while (md.bitsRead - before < g.part23) {
            require(g.count1TableB,
              "MP3: count1 table A not transcribed in this build; " +
                "count1table_select=1 (table B) is the decodable subset")
            require(i + 4 <= 576, "MP3: count1 region overruns the spectrum")
            val quad = ~md.read(4) & 0x0f
            var q = 3
            while (q >= 0) {
              if (((quad >> q) & 1) == 1) {
                val neg = md.read(1) == 1
                lines(i + (3 - q)) = if (neg) -1 else 1
              }
              q -= 1
            }
            i += 4
          }
          require(md.bitsRead - before == g.part23,
            s"MP3: granule main data over-read (${md.bitsRead - before} of ${g.part23} bits)")
          // requantization (formula-defined, ISO 2.4.3.4.7.1)
          val xr = new Array[Double](576)
          val mult = (g.scalefacScale + 1) * 0.5
          var sfb = 0
          var j = 0
          while (j < 576) {
            while (sfb < 21 && j >= bounds(sfb + 1)) sfb += 1
            // lines past the last defined band (the B.8 tail) carry no
            // scalefactor — gain-only requantization
            val bandScale =
              if (j < bounds(21))
                mult * (sfl(sfb) + (if (g.preflag) Pretab(sfb) else 0))
              else 0.0
            val scale = 0.25 * (g.globalGain - 210) - bandScale
            val v = lines(j)
            if (v != 0)
              xr(j) = math.signum(v.toDouble) *
                math.pow(math.abs(v.toDouble), 4.0 / 3.0) * math.pow(2.0, scale)
            j += 1
          }
          grans += Mp3Granule(lines, xr)
        }
        pos += frameLen
        frames += 1
      }
    }
    require(frames > 0, "MP3: no frames")
    Mp3Spectrum(frames, sampleRate, grans.result())
  }

  /** ENCODER TWIN for [[decodeSpectrum]]: one MONO frame per input
    * granule pair, each granule's 576 integer lines (|v| <= 1 — the
    * transcribed table-1 / count1-B domain) Huffman-packed exactly as
    * the decoder walks them: `bigValuePairs` pairs through table 1
    * (table 0 when all zero), the rest through count1 table-B
    * quadruples up to the last nonzero line, `part2_3_length`
    * counted bit-exactly, per-band scalefactors at
    * `scalefac_compress=15` (4+3 bits), global gain / preflag /
    * scalefac_scale as asked. The round-trip property tests pin the
    * transcription: any disagreement between this packer and the
    * decoder's tree surfaces as a loud over/under-read.
    */
  def mp3SpectrumPayload(
      granules: Seq[(Array[Int], Array[Int], Int)], // (lines, sfl(21), globalGain)
      bigValuePairs: Int, bitrateIdx: Int = 14, srIdx: Int = 0,
      preflag: Boolean = false, scalefacScale: Int = 0): Array[Byte] = {
    require(granules.nonEmpty && granules.size % 2 == 0,
      "MP3: granules come in frame pairs")
    require(bigValuePairs >= 0 && 2 * bigValuePairs <= 576 && bigValuePairs % 2 == 0,
      "MP3: bigValuePairs must be even so count1 quadruples stay aligned")
    granules.foreach { case (lines, sfl, _) =>
      require(lines.length == 576 && lines.forall(v => math.abs(v) <= 1),
        "MP3: twin domain is |line| <= 1 (table 1 / count1-B)")
      require(sfl.length == 21 && sfl.forall(v => v >= 0 && v <= 7),
        "MP3: scalefactors are 4/3-bit fields at scalefac_compress=15 — " +
          "cap at 7 so both slen widths hold any band's value")
    }
    val frameLen = 144 * BitrateKbps(bitrateIdx) * 1000 / SampleRate(srIdx)
    val nFrames = granules.size / 2
    val out = new Array[Byte](nFrames * frameLen)
    (0 until nFrames).foreach { f =>
      val base = f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte
      out(base + 2) = ((bitrateIdx << 4) | (srIdx << 2)).toByte
      out(base + 3) = 0xc4.toByte // MONO
      // bit packer over the whole frame tail (side info + main data)
      var bitPos = (base + 4) * 8
      def put(v: Int, bits: Int): Unit = {
        var b = bits - 1
        while (b >= 0) {
          if (((v >> b) & 1) == 1)
            out(bitPos / 8) = (out(bitPos / 8) | (1 << (7 - bitPos % 8))).toByte
          bitPos += 1
          b -= 1
        }
      }
      val pair = Seq(granules(2 * f), granules(2 * f + 1))
      // main-data bits per granule, counted the way the decoder reads
      def mainBits(lines: Array[Int]): Int = {
        var bits = 11 * 4 + 10 * 3 // scalefactors at compress=15
        // table 0 (an all-zero big-value region) writes ZERO bits —
        // counting table-1 codes for it would declare a part2_3_length
        // the packer never fills and send the decoder past the region
        val tab = if (lines.take(2 * bigValuePairs).forall(_ == 0)) 0 else 1
        var i = 0
        while (tab == 1 && i < 2 * bigValuePairs) {
          val (x, y) = (math.abs(lines(i)), math.abs(lines(i + 1)))
          bits += BigValueTables(1).codes((x, y))._2 + x + y // sign bit per nonzero
          i += 2
        }
        i = 2 * bigValuePairs
        val lastNz = lines.lastIndexWhere(_ != 0)
        while (i <= lastNz) {
          bits += 4 + (0 until 4).count(q => lines(i + q) != 0)
          i += 4
        }
        bits
      }
      // side info: 136 bits
      put(0, 9); put(0, 5); put(0, 4)
      pair.foreach { case (lines, _, gain) =>
        put(mainBits(lines), 12)
        put(bigValuePairs, 9)
        put(gain, 8)
        put(15, 4) // scalefac_compress = 15 -> slen 4 / 3
        put(0, 1)  // long blocks
        val tab = if (lines.take(2 * bigValuePairs).forall(_ == 0)) 0 else 1
        put(tab, 5); put(tab, 5); put(tab, 5)
        put(7, 4); put(7, 3) // region counts (all regions same table)
        put(if (preflag) 1 else 0, 1)
        put(scalefacScale, 1)
        put(1, 1) // count1 table B
      }
      require(bitPos == (base + 21) * 8, "MP3: twin side info mispacked")
      // main data
      pair.foreach { case (lines, sfl, _) =>
        (0 until 11).foreach(i => put(sfl(i), 4))
        (11 until 21).foreach(i => put(sfl(i), 3))
        val tab = if (lines.take(2 * bigValuePairs).forall(_ == 0)) 0 else 1
        var i = 0
        while (i < 2 * bigValuePairs) {
          if (tab == 1) {
            val (x, y) = (math.abs(lines(i)), math.abs(lines(i + 1)))
            val (code, len) = BigValueTables(1).codes((x, y))
            put(code, len)
            if (x != 0) put(if (lines(i) < 0) 1 else 0, 1)
            if (y != 0) put(if (lines(i + 1) < 0) 1 else 0, 1)
          }
          i += 2
        }
        val lastNz = lines.lastIndexWhere(_ != 0)
        while (i <= lastNz) {
          // count1 table B: 4-bit complement of the nonzero mask
          var mask = 0
          (0 until 4).foreach { q => if (lines(i + q) != 0) mask |= (1 << (3 - q)) }
          put(~mask & 0x0f, 4)
          (0 until 4).foreach { q =>
            if (lines(i + q) != 0) put(if (lines(i + q) < 0) 1 else 0, 1) }
          i += 4
        }
        require(bitPos <= (base + frameLen) * 8, "MP3: twin main data overruns the frame")
      }
    }
    out
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
