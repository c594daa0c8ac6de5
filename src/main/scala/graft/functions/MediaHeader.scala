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
}
