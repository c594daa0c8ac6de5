package graft

import graft.functions.MediaHeader
import graft.functions.MediaHeader.MediaInfo
import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Golden header vectors for the pure-JVM media parser (M2's decode
  * step), independent of the query path's synthesized payloads —
  * including the canonical 1×1 PNG every image library ships as a test
  * vector, progressive JPEG, and the corruption corners. */
class MediaHeaderSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: canonical 1x1 header + larger dims, big-endian") {
    // the standard minimal 1×1 RGBA PNG prefix (sig + IHDR)
    val onePx = hex(
      "89504e470d0a1a0a 0000000d 49484452 00000001 00000001 0806000000 1f15c489")
    assert(MediaHeader.parse(onePx).contains(MediaInfo("png", 1, 1)))
    // 640×480: width/height are u32 BE at offsets 16/20
    val vga = hex(
      "89504e470d0a1a0a 0000000d 49484452 00000280 000001e0 0802000000 00000000")
    assert(MediaHeader.parse(vga).contains(MediaInfo("png", 640, 480)))
  }

  test("GIF: 87a and 89a, little-endian screen descriptor") {
    val g87 = "GIF87a".getBytes ++ hex("0201 0300 000000") // LE: 258 × 3
    assert(MediaHeader.parse(g87).contains(MediaInfo("gif", 258, 3)))
    val g89 = "GIF89a".getBytes ++ hex("1000 2000 f70000") // 16 × 32
    assert(MediaHeader.parse(g89).contains(MediaInfo("gif", 16, 32)))
  }

  test("JPEG: SOF behind APP/comment segments; DHT is not a SOF") {
    // SOI ‖ APP0 (JFIF, len 16) ‖ COM (len 4) ‖ DHT (len 4) ‖
    // SOF2 progressive (len 11): 8-bit, h=0x0100=256, w=0x0180=384
    val jpg = hex("ffd8" +
      "ffe0 0010 4a46494600 0101 0000010001 0000" +
      "fffe 0004 abcd" +
      "ffc4 0004 0000" +
      "ffc2 000b 08 0100 0180 01 11 00")
    assert(MediaHeader.parse(jpg).contains(MediaInfo("jpeg", 384, 256)))
  }

  test("unparseable payloads quarantine as None, never throw") {
    assert(MediaHeader.parse("NOTMEDIA!".getBytes).isEmpty)
    assert(MediaHeader.parse(Array.empty[Byte]).isEmpty)
    // truncated PNG (sig only)
    assert(MediaHeader.parse(hex("89504e470d0a1a0a")).isEmpty)
    // JPEG that hits SOS before any SOF
    assert(MediaHeader.parse(hex("ffd8 ffda 0002")).isEmpty)
    // JPEG with a lost-sync byte between segments
    assert(MediaHeader.parse(hex("ffd8 00ff 0004 0000")).isEmpty)
    // PNG with zero width
    assert(MediaHeader.parse(hex(
      "89504e470d0a1a0a 0000000d 49484452 00000000 00000001 0806000000 00000000"))
      .isEmpty)
  }

  test("synthesized payloads round-trip through the real parser") {
    for (id <- 0L until 100L) {
      val info = MediaHeader.parse(MultimodalOps.synthPayload(id))
      val w = (1 + id % 4093).toInt
      val h = (1 + (id * 7) % 4093).toInt
      (id % 4) match {
        case 0 => assert(info.contains(MediaInfo("png", w, h)), s"id=$id")
        case 1 => assert(info.contains(MediaInfo("gif", w, h)), s"id=$id")
        case 2 => assert(info.contains(MediaInfo("jpeg", w, h)), s"id=$id")
        case _ => assert(info.isEmpty, s"id=$id")
      }
    }
  }

  test("WAV: fmt+data chunk walk, padding, quarantine cases") {
    // synth round-trip incl. the garbage route
    for (id <- 0L until 60L) {
      val info = MediaHeader.parseWav(MultimodalOps.synthWav(id))
      if (id % 5 == 0) assert(info.isEmpty, s"id=$id")
      else {
        val a = info.get
        assert(a.sampleRate == Seq(8000, 16000, 44100)((id % 3).toInt))
        assert(a.channels == 1 + (id % 2).toInt)
        assert(a.bitsPerSample == 16)
        val nSamples = (id % 1000).toInt * 10 + 100
        assert(a.dataBytes == nSamples.toLong * a.channels * 2)
        assert(math.abs(a.durationSec - nSamples.toDouble /
          a.sampleRate) < 1e-12)
      }
    }
    def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    // an ODD-size chunk before fmt: the walk must pad to even (RIFF
    // rule) or it loses sync
    val odd = "RIFF".getBytes ++ u32le(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ u32le(3) ++ Array[Byte](1, 2, 3, 0) ++ // pad
      "fmt ".getBytes ++ u32le(16) ++ u16le(1) ++ u16le(2) ++
      u32le(44100) ++ u32le(44100 * 4) ++ u16le(4) ++ u16le(16) ++
      "data".getBytes ++ u32le(800)
    val a = MediaHeader.parseWav(odd).get
    assert(a.sampleRate == 44100 && a.channels == 2 && a.dataBytes == 800)
    // missing data chunk / non-WAVE RIFF / truncation → quarantine
    assert(MediaHeader.parseWav(odd.dropRight(8)).isEmpty) // no data cc
    assert(MediaHeader.parseWav(
      "RIFF".getBytes ++ u32le(4) ++ "AVI ".getBytes).isEmpty)
    assert(MediaHeader.parseWav(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("MP4: box walk to mvhd/tkhd, fixed-point dims, quarantine") {
    for (id <- 0L until 40L) {
      val info = MediaHeader.parseMp4(MultimodalOps.synthMp4(id))
      if (id % 4 == 3) assert(info.isEmpty, s"id=$id")
      else {
        val v = info.get
        assert(v.width == (1 + id % 1920).toInt, s"id=$id")
        assert(v.height == (1 + (id * 3) % 1080).toInt)
        assert(v.durationMs == (id % 3600) * 1000 + 500)
      }
    }
    // truncated inside tkhd → None, not a garbage parse
    val ok = MultimodalOps.synthMp4(1L)
    assert(MediaHeader.parseMp4(ok.dropRight(6)).isEmpty)
    // no moov → None
    assert(MediaHeader.parseMp4(ok.take(16)).isEmpty)
  }

  test("hostile container sizes terminate as None, never loop or throw") {
    def u32be(v: Long) = Array((v >>> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32le(v: Long) = u32be(v).reverse
    // mp4 box size near u32-max used to overflow Int into a BACKWARDS
    // step — an infinite loop on one adversarial blob
    val evil = MultimodalOps.synthMp4(1L).take(16) ++
      u32be(0xFFFFFFF0L) ++ "free".getBytes
    assert(MediaHeader.parseMp4(evil).isEmpty)
    // wav chunk size near Int.MaxValue used to overflow the cursor
    // negative → ArrayIndexOutOfBounds
    val evilWav = "RIFF".getBytes ++ u32le(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ u32le(0x7FFFFFF0L)
    assert(MediaHeader.parseWav(evilWav).isEmpty)
    // fmt chunk DECLARING fewer bytes than the 16 PCM fields → None,
    // not format values read out of the next chunk
    def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val shortFmt = "RIFF".getBytes ++ u32le(60) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ u32le(8) ++ u16le(1) ++ u16le(2) ++
      u32le(44100) ++
      "data".getBytes ++ u32le(4)
    assert(MediaHeader.parseWav(shortFmt).isEmpty)
    // truncated right after the mvhd box header → None, not AIOOBE
    val mvhdShort = MultimodalOps.synthMp4(1L).take(16) ++
      u32be(24) ++ "moov".getBytes ++ u32be(16) ++ "mvhd".getBytes
    assert(MediaHeader.parseMp4(mvhdShort).isEmpty)
    // sub-byte sample width divides in bits (4-bit ADPCM), not
    // integer-zero bytes
    val adpcm = MediaHeader.AudioInfo("wav", 8000, 1, 4, 4000)
    assert(math.abs(adpcm.durationSec - 1.0) < 1e-12)
  }
}
