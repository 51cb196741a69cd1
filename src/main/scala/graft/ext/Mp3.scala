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
