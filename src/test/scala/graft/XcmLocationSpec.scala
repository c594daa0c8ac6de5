package graft

import graft.functions.{Codec, XcmLocation}
import org.scalatest.funsuite.AnyFunSuite

/** XCM MultiLocation encoding pinned by the reference's PUBLIC golden
  * vector (xcmmanager.js:985 comment): the descend-origin derivative of
  * (paraID 1000, AccountKey20 0x4423…) — one exact hash match validates
  * the whole SCALE chain (enum indices, compact ints, network byte,
  * hash framing). Interior-key parsing covers the testmultilocation.js
  * shapes.
  */
class XcmLocationSpec extends AnyFunSuite {

  test("descend-origin derivative matches the reference golden vector") {
    val (a20, a32) = XcmLocation.multilocationDerivative(
      Some(1000L), Some("0x44236223aB4291b93EEd10E4B511B37a398DEE55"))
    assert(Codec.bytesToHex(a20) ==
      "0x5c27c4bb7047083420eddff9cddac4a0a120b45c")
    assert(Codec.bytesToHex(a32) ==
      "0x5c27c4bb7047083420eddff9cddac4a0a120b45cdfa7831175e442b8f14391aa")
  }

  test("SCALE encoding of the junction subset") {
    // {parents:1, X2:[Parachain(1000), AccountKey20(Any, 0x4423…)]}
    val bytes = XcmLocation.encode(1, Seq(
      XcmLocation.Parachain(1000),
      XcmLocation.AccountKey20(None,
        Codec.hexToBytes("0x44236223aB4291b93EEd10E4B511B37a398DEE55"))))
    assert(Codec.bytesToHex(bytes) ==
      "0x0102" + // parents=1, X2
        "00a10f" + // Parachain ++ compact(1000)
        "0300" + // AccountKey20 ++ NetworkId::Any
        "44236223ab4291b93eed10e4b511b37a398dee55")
    // Here
    assert(Codec.bytesToHex(XcmLocation.encode(1, Seq.empty)) == "0x0100")
  }

  test("interior keys parse into the expected junction lists") {
    // the five testmultilocation.js shapes
    assert(XcmLocation.parseInteriorKey("here") == Seq.empty)
    assert(XcmLocation.parseInteriorKey("""{"parachain":2048}""") ==
      Seq(XcmLocation.Parachain(2048)))
    assert(XcmLocation.parseInteriorKey(
      """[{"parachain":888},{"palletInstance":3}]""") ==
      Seq(XcmLocation.Parachain(888), XcmLocation.PalletInstance(3)))
    val gk = XcmLocation.parseInteriorKey(
      """ [{"parachain":2000},{"generalKey":"0x0081"}]""")
    assert(gk.head == XcmLocation.Parachain(2000))
    assert(gk(1).asInstanceOf[XcmLocation.GeneralKey].bytes
      .sameElements(Array(0x00.toByte, 0x81.toByte)))
    val gi = XcmLocation.parseInteriorKey(
      """[{"parachain":1000},{"palletInstance":36},{"generalIndex":"0xfd9d0bf45a2947a519a741c4b9e99eb6"}]""")
    assert(gi.size == 3)
    assert(gi(2) == XcmLocation.GeneralIndex(
      BigInt("fd9d0bf45a2947a519a741c4b9e99eb6", 16)))
    // relay suffix form
    assert(XcmLocation.parseInteriorKey(
      """[{"parachain":1000},{"palletInstance":3}]~moonbase-relay""") ==
      Seq(XcmLocation.Parachain(1000), XcmLocation.PalletInstance(3)))
  }

  test("interiorKeyToBytesHex and destParaId are guarded-null") {
    // parents=01, X1=01, Parachain=00, compact(2048) = (2048<<2)|0b01
    // = 0x2001 → LE 0120
    assert(XcmLocation.interiorKeyToBytesHex(
      """{"parachain":2048}""") == "0x0101000120")
    assert(XcmLocation.destParaId("""[{"parachain":888},{"palletInstance":3}]""") == 888L)
    assert(XcmLocation.destParaId("here") == -1L)
    assert(XcmLocation.interiorKeyToBytesHex("not json") == null)
    assert(XcmLocation.destParaId("{\"plurality\":1}") == null)
    assert(XcmLocation.interiorKeyToBytesHex(null) == null)
  }

  test("ss58 and 32-byte-hex addresses produce AccountId32 derivatives") {
    val pk = "0x" + "11" * 32
    val (h20a, _) = XcmLocation.multilocationDerivative(Some(2000L), Some(pk))
    val ss58 = Codec.ss58Encode(Codec.hexToBytes(pk), 0)
    val (h20b, _) = XcmLocation.multilocationDerivative(Some(2000L), Some(ss58))
    assert(h20a.sameElements(h20b)) // same account either spelling
  }
}
