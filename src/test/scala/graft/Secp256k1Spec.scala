package graft

import graft.functions.{Codec, Secp256k1 => S}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** secp256k1 anchored by PUBLIC vectors: the curve constants, 2G's
  * published coordinates, the private-key-1 EVM address, and a
  * sign→recover round-trip property over random keys/nonces.
  */
class Secp256k1Spec extends AnyFunSuite {

  test("curve anchors: G on curve, 2G matches the published value") {
    assert(S.onCurve(S.G))
    val twoG = S.add(S.G, S.G)
    assert(S.onCurve(twoG))
    assert(twoG.get._1 == BigInt(
      "c6047f9441ed7d6d3045406e95c07cd85c778e4b8cef3ca7abac09b95c709ee5", 16))
    // n·G = infinity
    assert(S.mul(S.N, S.G).isEmpty)
  }

  test("private key 1 yields the well-known EVM address") {
    assert(Codec.bytesToHex(S.ethAddress(S.G)) ==
      "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf")
    // private key 2 → the published 2nd address
    assert(Codec.bytesToHex(S.ethAddress(S.mul(2, S.G))) ==
      "0x2b5ad5c4795c026514f8317c7a215e218dccd6cf")
  }

  test("sign→recover round-trips across keys, nonces, and hashes") {
    val big = Gen.choose(1L, Long.MaxValue).map(BigInt(_))
    val prop = Prop.forAll(big, big, big) { (d0, k0, h0) =>
      val d = d0.mod(S.N - 1) + 1
      val k = k0.mod(S.N - 1) + 1
      val h = Codec.hexToBytes(f"${h0}%064x")
      val (recId, r, s) = S.signWithNonce(h, d, k)
      val q = S.recover(h, recId, r, s)
      q.nonEmpty && q == S.mul(d, S.G)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("ethereum v=27/28 form and guarded-null malformed inputs") {
    val h = Codec.hexToBytes("0x" + "ab" * 32)
    val (recId, r, s) = S.signWithNonce(h, BigInt(7), BigInt(13))
    val addr = Codec.bytesToHex(S.ethAddress(S.mul(7, S.G)))
    assert(S.recoverAddressHex("0x" + "ab" * 32, recId + 27,
      f"${r}%064x", f"${s}%064x") == addr)
    // EIP-155 replay-protected v: 35 + 2·chainId + parity (chainId 1)
    assert(S.recoverAddressHex("0x" + "ab" * 32, recId + 35 + 2,
      f"${r}%064x", f"${s}%064x") == addr)
    // r out of range → null, not an exception
    assert(S.recoverAddressHex("0x" + "ab" * 32, 27,
      "00" * 32, f"${s}%064x") == null)
    assert(S.recoverAddressHex("not hex", 27, "0x01", "0x01") == null)
  }

  test("EIP-155 v beyond Int range (Palm/Aurora-class chainIds)") {
    val h = Codec.hexToBytes("0x" + "ab" * 32)
    val (recId, r, s) = S.signWithNonce(h, BigInt(7), BigInt(13))
    val addr = Codec.bytesToHex(S.ethAddress(S.mul(7, S.G)))
    // Palm chainId 11297108109 → v = 2·chainId + 35 + parity ≈ 2.26e10,
    // far past Int.MaxValue; an Int v would wrap and either alias into
    // a valid recId (wrong address) or flip parity
    val chainId = 11297108109L
    val v = 2L * chainId + 35L + recId
    assert(v > Int.MaxValue)
    assert(S.recoverAddressHex("0x" + "ab" * 32, v,
      f"${r}%064x", f"${s}%064x") == addr)
    // the WRONG parity at the same chainId recovers a different (or no)
    // address — proving parity is computed from the full Long v
    val wrong = S.recoverAddressHex("0x" + "ab" * 32, v + 1,
      f"${r}%064x", f"${s}%064x")
    assert(wrong != addr)
  }
}
