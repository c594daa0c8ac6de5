package graft.functions

/** Pure-JVM media container header parsing — the real decode step of
  * the multimodal M2 operator (no codec libraries needed: format,
  * width and height live in the leading bytes of every mainstream
  * container). Covers PNG (IHDR), GIF (87a/89a logical screen
  * descriptor) and JPEG (SOF marker scan across leading segments) —
  * the formats a crawl-scale image corpus is overwhelmingly made of.
  *
  * Anything unparseable returns None: a training-data pipeline treats
  * that as "unknown format" and routes the blob to quarantine rather
  * than failing the stage.
  */
object MediaHeader {

  final case class MediaInfo(format: String, width: Int, height: Int)

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (length ‖ "IHDR" ‖
    * width u32 BE ‖ height u32 BE ‖ …). IHDR is REQUIRED first by the
    * spec, so a fixed-offset read is correct, not a shortcut. */
  private def png(b: Array[Byte]): Option[MediaInfo] =
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = u32be(b, 16); val h = u32be(b, 20)
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(MediaInfo("png", w.toInt, h.toInt))
      else None
    } else None

  /** GIF: "GIF87a"/"GIF89a" ‖ logical screen width/height, u16 LE. */
  private def gif(b: Array[Byte]): Option[MediaInfo] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = u16le(b, 6); val h = u16le(b, 8)
      if (w > 0 && h > 0) Some(MediaInfo("gif", w, h)) else None
    } else None

  /** JPEG: SOI (FFD8), then marker segments (FF xx ‖ u16 BE length
    * covering itself). Dimensions live in the first SOFn frame header
    * (C0-C3, C5-C7, C9-CB, CD-CF — not DHT/DAC/RST): precision u8,
    * height u16 BE, width u16 BE. Fill bytes (FF padding) are legal
    * between segments; the scan stops at SOS/EOI or on corruption. */
  private def jpeg(b: Array[Byte]): Option[MediaInfo] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost sync
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 4 < b.length) { i += 1; m = b(i + 1) & 0xff }
      if (m == 0xd9 || m == 0xda) return None // EOI / SOS before SOF
      val len = u16be(b, i + 2)
      if (len < 2) return None
      val isSof = (m >= 0xc0 && m <= 0xcf) &&
        m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSof) {
        if (i + 9 >= b.length) return None
        val h = u16be(b, i + 5); val w = u16be(b, i + 7)
        return if (w > 0 && h > 0) Some(MediaInfo("jpeg", w, h)) else None
      }
      i += 2 + len
    }
    None
  }

  /** Sniff + parse a payload's leading bytes. */
  def parse(bytes: Array[Byte]): Option[MediaInfo] =
    png(bytes).orElse(gif(bytes)).orElse(jpeg(bytes))

  // ---- audio (WAV/RIFF) ----

  final case class AudioInfo(format: String, sampleRate: Int,
      channels: Int, bitsPerSample: Int, dataBytes: Long) {
    /** Seconds of audio the data chunk holds — computed in bits so
      * sub-byte sample widths (4-bit ADPCM) divide correctly instead
      * of hitting an integer-division zero. */
    def durationSec: Double =
      if (sampleRate <= 0 || channels <= 0 || bitsPerSample <= 0) 0.0
      else (dataBytes.toDouble * 8) /
        (sampleRate.toDouble * channels * bitsPerSample)
  }

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** WAV: "RIFF" ‖ u32 LE size ‖ "WAVE", then a chunk walk — each
    * chunk is [4cc ‖ u32 LE size ‖ payload (padded to even)]. The
    * `fmt ` chunk carries PCM format/channels/rate/bits; `data`'s SIZE
    * is the payload length (the bytes themselves may be truncated away
    * in a header-only read — corpus metadata needs the size, not the
    * samples). Both chunks must appear or the parse returns None. */
  def parseWav(b: Array[Byte]): Option[AudioInfo] = {
    def cc(i: Long, s: String): Boolean =
      i >= 0 && i + 4 <= b.length &&
        s.indices.forall(k => b(i.toInt + k) == s(k).toByte)
    if (b.length < 12 || !cc(0, "RIFF") || !cc(8, "WAVE")) return None
    // Long offsets: a hostile u32 chunk size must not overflow Int and
    // walk backwards — it just runs the cursor past the buffer and
    // terminates the loop
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var dataBytes: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val size = u32le(b, i.toInt + 4)
      if (cc(i, "fmt ")) {
        // the declared chunk must actually HOLD the 16 PCM-format
        // bytes — reading past a short fmt chunk would take
        // channels/rate/bits from the next chunk's header
        if (size < 16 || i + 8 + 16 > b.length) return None
        val p = i.toInt
        val ch = u16le(b, p + 10)
        val rate = u32le(b, p + 12).toInt
        val bits = u16le(b, p + 22)
        fmt = Some((ch, rate, bits))
      } else if (cc(i, "data")) {
        dataBytes = Some(size)
      }
      // chunks pad to even length per RIFF
      i += 8L + size + (size & 1L)
    }
    for ((ch, rate, bits) <- fmt; d <- dataBytes
        if ch > 0 && rate > 0 && bits > 0)
      yield AudioInfo("wav", rate, ch, bits, d)
  }

  // ---- video (MP4 / ISO-BMFF) ----

  final case class VideoInfo(format: String, width: Int, height: Int,
      durationMs: Long)

  /** MP4: top-level box walk ([u32 BE size ‖ 4cc]) to `moov`, then
    * inside it `mvhd` (version-0 layout: timescale u32 BE at +12,
    * duration u32 BE at +16 past the box header) for duration and the
    * first `trak`→`tkhd` (width/height as 16.16 fixed point at +76/+80
    * past the box header) for dimensions. Header-only read: `mdat` is
    * never touched. Version-1 (64-bit) boxes return None — the corpus
    * route is quarantine, not a guess. */
  def parseMp4(b: Array[Byte]): Option[VideoInfo] = {
    def cc(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(k => b(i + k) == s(k).toByte)
    // Long cursor: a hostile u32 box size must not overflow Int into a
    // backwards step (that loops forever) — it walks past `to` and
    // terminates
    def walk(from: Int, to: Int, name: String): Option[Int] = {
      var i = from.toLong
      while (i + 8 <= to) {
        val size = u32be(b, i.toInt)
        if (size < 8) return None
        if (cc(i.toInt + 4, name)) return Some(i.toInt)
        i += size
      }
      None
    }
    if (b.length < 12 || !cc(4, "ftyp")) return None
    for {
      moov <- walk(0, b.length, "moov")
      moovEnd = math.min(b.length.toLong,
        moov + u32be(b, moov)).toInt
      mvhd <- walk(moov + 8, moovEnd, "mvhd")
      // every mvhd field read below must sit inside the buffer — a
      // truncated header-only blob quarantines, it doesn't throw
      if mvhd + 8 + 20 <= b.length
      if b(mvhd + 8) == 0 // version 0 only
      trak <- walk(moov + 8, moovEnd, "trak")
      trakEnd = math.min(moovEnd.toLong,
        trak + u32be(b, trak)).toInt
      tkhd <- walk(trak + 8, trakEnd, "tkhd")
      if tkhd + 92 <= b.length
      if b(tkhd + 8) == 0
    } yield {
      val timescale = u32be(b, mvhd + 8 + 12)
      val duration = u32be(b, mvhd + 8 + 16)
      val w = (u32be(b, tkhd + 8 + 76) >> 16).toInt // 16.16 fixed
      val h = (u32be(b, tkhd + 8 + 80) >> 16).toInt
      val ms = if (timescale > 0) duration * 1000L / timescale else 0L
      VideoInfo("mp4", w, h, ms)
    }
  }
}
