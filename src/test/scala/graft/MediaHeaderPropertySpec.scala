package graft

import graft.functions.MediaHeader
import graft.functions.MediaHeader.MediaInfo
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the media header parser: headers BUILT at
  * arbitrary dimensions (full u16 range for GIF/JPEG, wide u31 range
  * for PNG) with randomized skippable segment noise must round-trip,
  * and random byte garbage must never parse or throw. */
class MediaHeaderPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def u16be(v: Int) =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32be(v: Int) = Array((v >>> 24).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private val dim16 = Gen.chooseNum(1, 65535)
  private val dim31 = Gen.chooseNum(1, Int.MaxValue)

  test("PNG round-trips any positive u31 dimensions") {
    check(Prop.forAll(dim31, dim31) { (w, h) =>
      val b = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte) ++ u32be(13) ++ "IHDR".getBytes ++
        u32be(w) ++ u32be(h) ++ Array[Byte](8, 6, 0, 0, 0) ++ u32be(0)
      MediaHeader.parse(b).contains(MediaInfo("png", w, h))
    })
  }

  test("GIF round-trips any u16 dimensions in both variants") {
    check(Prop.forAll(dim16, dim16, Gen.oneOf("GIF87a", "GIF89a")) {
      (w, h, sig) =>
        val b = sig.getBytes ++ Array((w & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((h >> 8) & 0xff).toByte) ++ Array[Byte](0, 0, 0)
        MediaHeader.parse(b).contains(MediaInfo("gif", w, h))
    })
  }

  test("JPEG round-trips behind 0-4 random skippable segments") {
    val seg: Gen[Array[Byte]] = for {
      // APPn/COM markers, all length-prefixed and skippable
      m <- Gen.oneOf((0xe0 to 0xef) :+ 0xfe)
      n <- Gen.chooseNum(0, 20)
      body <- Gen.listOfN(n, Gen.chooseNum(0, 255))
    } yield Array(0xff.toByte, m.toByte) ++ u16be(n + 2) ++
      body.map(_.toByte).toArray
    val sofMarker = Gen.oneOf(0xc0, 0xc1, 0xc2, 0xc3)
    check(Prop.forAll(dim16, dim16, Gen.listOfN(4, seg),
        Gen.chooseNum(0, 4), sofMarker) { (w, h, segs, k, sof) =>
      val b = Array(0xff, 0xd8).map(_.toByte) ++
        segs.take(k).flatten.toArray ++
        Array(0xff.toByte, sof.toByte) ++ u16be(11) ++
        Array[Byte](8) ++ u16be(h) ++ u16be(w) ++ Array[Byte](1, 0x11, 0)
      MediaHeader.parse(b).contains(MediaInfo("jpeg", w, h))
    })
  }

  test("random garbage never parses and never throws") {
    check(Prop.forAll(
        Gen.listOf(Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)) {
      bytes =>
        // exclude byte strings that happen to start with a real
        // signature (astronomically unlikely but possible)
        val sig = bytes.length >= 6 &&
          ((bytes(0) & 0xff) == 0x89 || (bytes(0) == 'G') ||
            (bytes(0) & 0xff) == 0xff)
        sig || MediaHeader.parse(bytes).isEmpty
    })
  }
}
