package graft

import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based round-trips and invariants for the codec layer — the
  * SURVEY §7.2 M0 "highest-risk fidelity area". Golden vectors (CodecSpec)
  * pin known answers; these properties pin TOTALITY: every byte string /
  * value in the domain must survive encode∘decode unchanged.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val byteArrays: Gen[Array[Byte]] =
    Gen.choose(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  private val bytes32: Gen[Array[Byte]] =
    Gen.listOfN(32, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("hex round-trips any byte string") {
    check(Prop.forAll(byteArrays) { b =>
      Codec.hexToBytes(Codec.bytesToHex(b)).sameElements(b) &&
        Codec.hexToBytes(Codec.bytesToHex(b, prefix = false))
          .sameElements(b)
    })
  }

  test("base58 round-trips any byte string") {
    check(Prop.forAll(byteArrays) { b =>
      Codec.base58Decode(Codec.base58Encode(b)).sameElements(b)
    })
  }

  test("ss58 round-trips any 32-byte pubkey on any registry network") {
    // one-byte (0..63) and two-byte (64..16383) network forms
    check(Prop.forAll(bytes32, Gen.choose(0, 16383)) { (pk, net) =>
      val (decNet, decPk) = Codec.ss58Decode(Codec.ss58Encode(pk, net))
      decNet == net && decPk.sameElements(pk)
    })
  }

  test("SCALE compact round-trips the full u64-ish domain") {
    val values = Gen.oneOf(
      Gen.choose(0L, 63L),             // single-byte mode
      Gen.choose(64L, 16383L),         // two-byte mode
      Gen.choose(16384L, 1073741823L), // four-byte mode
      Gen.choose(1073741824L, Long.MaxValue)) // big-integer mode
    check(Prop.forAll(values) { v =>
      val enc = Codec.compactEncode(BigInt(v))
      val (dec, consumed) = Codec.compactDecode(enc)
      dec == BigInt(v) && consumed == enc.length // no trailing slack
    })
  }

  test("H160 mappings: truncation prefix and hashed embedding invariants") {
    // NOT a round-trip pair by design (polkadot-js semantics):
    // pubkeyToH160 truncates an AccountId32 to its first 20 bytes;
    // h160ToPubkey embeds via blake2_256("evm:" ++ h160)
    val h160s = Gen.listOfN(20,
      Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    check(Prop.forAll(bytes32) { pk =>
      Codec.pubkeyToH160(pk).sameElements(pk.take(20))
    })
    check(Prop.forAll(h160s) { h =>
      val pk = Codec.h160ToPubkey(h)
      pk.length == 32 && pk.sameElements(Codec.h160ToPubkey(h)) // stable
    })
  }

  test("multisig derivation is signatory-order insensitive") {
    check(Prop.forAll(bytes32, bytes32, Gen.choose(1, 2)) { (a, b, thr) =>
      val ab = Codec.multisigAccount(Seq(a, b), thr)
      val ba = Codec.multisigAccount(Seq(b, a), thr)
      ab.sameElements(ba) && ab.length == 32
    })
  }

  test("mortal era decode yields only valid (period, phase) pairs") {
    check(Prop.forAll(Gen.choose(0, 255), Gen.choose(0, 255)) { (b0, b1) =>
      Codec.decodeMortalEra(b0, b1).forall { case (period, phase) =>
        period >= 4 && (period & (period - 1)) == 0 &&
          phase >= 0 && phase < period
      }
    })
  }
}
