package graft.plans

import graft.functions.{Codec, XcmLocation}
import org.apache.spark.unsafe.types.UTF8String

/** Null-guarded scalar kernels behind the codegen'd SQL function
  * surface: [[graft.functions.Udfs.register]] exposes these through
  * Catalyst `StaticInvoke` expressions instead of Scala UDFs, so the
  * per-row conversions Dump's six projections run on EVERY exported
  * row (address render, decimal scaling, asset canonicalization)
  * participate in whole-stage codegen — same motivation as
  * [[CompactDecode]], applied to the §2.8 scalar surface.
  *
  * Contract (unchanged from the UDF era): null in → null out
  * (StaticInvoke propagateNull), malformed input → null (guards
  * here), never an exception — one bad row must not kill an export
  * stage. */
object CodecKernels {

  private def guard[T >: Null](f: => T): T =
    try f catch {
      case _: IllegalArgumentException | _: NumberFormatException |
           _: IndexOutOfBoundsException => null
    }

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  def ss58Encode(pubkeyHex: UTF8String, network: Int): UTF8String =
    utf8(guard(
      Codec.ss58Encode(Codec.hexToBytes(pubkeyHex.toString), network)))

  def ss58Pubkey(address: UTF8String): UTF8String =
    utf8(guard(
      Codec.bytesToHex(Codec.ss58Decode(address.toString)._2)))

  def twox128Hex(s: UTF8String): UTF8String =
    utf8(Codec.bytesToHex(
      Codec.twox128(s.toString.getBytes("UTF-8")), prefix = false))

  def blake2b256Hex(hex: UTF8String): UTF8String =
    utf8(guard(Codec.bytesToHex(
      Codec.blake2b256(Codec.hexToBytes(hex.toString)), prefix = false)))

  def toBaseUnit(rawHex: UTF8String, decimals: Int): java.lang.Double =
    guard(java.lang.Double.valueOf(Codec.toBaseUnit(
      BigInt(1, Codec.hexToBytes(rawHex.toString)), decimals)))

  def assetChain(asset: UTF8String, chainId: Int): UTF8String =
    utf8(graft.decode.ChainParser.forChain(chainId)
      .assetKey(asset.toString))

  def pubkeyToH160(pubkeyHex: UTF8String): UTF8String =
    utf8(guard(Codec.bytesToHex(
      Codec.pubkeyToH160(Codec.hexToBytes(pubkeyHex.toString)))))

  def h160ToPubkey(h160Hex: UTF8String): UTF8String =
    utf8(guard(Codec.bytesToHex(
      Codec.h160ToPubkey(Codec.hexToBytes(h160Hex.toString)))))

  def xcmLocBytes(key: UTF8String): UTF8String =
    utf8(XcmLocation.interiorKeyToBytesHex(key.toString))
}
