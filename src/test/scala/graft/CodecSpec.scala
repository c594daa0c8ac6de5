package graft

import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Golden vectors + seeded property tests for the codec layer
  * (SURVEY §2.7; test strategy per FIXTURES.md "Property tests").
  * Golden values are public test vectors (XXH64 spec, RFC 7693,
  * substrate storage-key docs, the well-known Alice dev address). */
class CodecSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = Codec.bytesToHex(b, prefix = false)
  private val rnd = new scala.util.Random(42)

  test("xxh64 known vectors") {
    assert(Codec.xxh64(Array.empty, 0) == 0xef46db3751d8e999L)
    // twox128("System") / twox128("Account") — the System.Account
    // storage prefix every substrate tool hardcodes
    // (ref paraTool.js:1785; substrateetl.js:6619 storageKeys).
    assert(hex(Codec.twox128("System".getBytes(UTF_8))) ==
      "26aa394eea5630e07c48ae0c9558cef7")
    assert(hex(Codec.twox128("Account".getBytes(UTF_8))) ==
      "b99d880ec681799c0cf30e8886371da9")
  }

  test("xxh64 covers all tail-length branches") {
    // lengths hitting the 32-stripe loop, 8-, 4-, and 1-byte tails
    for (len <- Seq(0, 1, 3, 4, 7, 8, 12, 15, 16, 31, 32, 33, 63, 64, 100)) {
      val data = Array.tabulate[Byte](len)(i => (i * 31 + 7).toByte)
      val h1 = Codec.xxh64(data, 0)
      val h2 = Codec.xxh64(data, 0)
      assert(h1 == h2)
      if (len > 0)
        assert(Codec.xxh64(data, 1) != h1, s"seed must matter at len $len")
    }
  }

  test("blake2b known vectors") {
    assert(hex(Codec.blake2b512(Array.empty)).startsWith(
      "786a02f742015903c6c6fd852552d272"))
    assert(hex(Codec.blake2b256("abc".getBytes(UTF_8))) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
  }

  test("blake2b multi-block input") {
    // > 128 bytes forces the multi-compression path
    val long = Array.fill[Byte](300)(0x61)
    val h1 = Codec.blake2b256(long)
    assert(h1.length == 32)
    assert(hex(Codec.blake2b256(long)) == hex(h1))
    assert(hex(Codec.blake2b256(long.take(299))) != hex(h1))
    assert(hex(Codec.blake2b256(Array.fill[Byte](128)(1))) !=
      hex(Codec.blake2b256(Array.fill[Byte](129)(1))))
  }

  test("ss58 Alice round-trip (generic network 42)") {
    val alicePub =
      "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d"
    val addr = Codec.ss58Encode(Codec.hexToBytes(alicePub), 42)
    assert(addr == "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY")
    val (net, pub) = Codec.ss58Decode(addr)
    assert(net == 42 && hex(pub) == alicePub)
  }

  test("ss58 round-trips across networks incl. two-byte prefixes") {
    for (net <- Seq(0, 2, 42, 63, 64, 100, 2000, 16383); _ <- 1 to 5) {
      val pub = Array.fill[Byte](32)(rnd.nextInt().toByte)
      val (n2, p2) = Codec.ss58Decode(Codec.ss58Encode(pub, net))
      assert(n2 == net && java.util.Arrays.equals(p2, pub))
    }
  }

  test("ss58 rejects corrupted checksum") {
    val addr = Codec.ss58Encode(Array.fill[Byte](32)(7), 0)
    val bad = addr.init + (if (addr.last == '1') '2' else '1')
    intercept[IllegalArgumentException](Codec.ss58Decode(bad))
  }

  test("SCALE compact round-trips all four modes") {
    val cases = Seq[BigInt](0, 1, 63, 64, 16383, 16384, (1L << 30) - 1,
      BigInt(1) << 30, BigInt(Long.MaxValue),
      BigInt("340282366920938463463374607431768211455")) // u128 max
    cases.foreach { v =>
      val enc = Codec.compactEncode(v)
      val (dec, used) = Codec.compactDecode(enc)
      assert(dec == v, s"round trip $v")
      assert(used == enc.length)
    }
    for (_ <- 1 to 200) {
      val v = BigInt(rnd.nextLong()).abs
      val (dec, _) = Codec.compactDecode(Codec.compactEncode(v))
      assert(dec == v)
    }
  }

  test("SCALE compact known encodings") {
    assert(hex(Codec.compactEncode(1)) == "04")
    assert(hex(Codec.compactEncode(42)) == "a8")
    assert(hex(Codec.compactEncode(69)) == "1501")
    assert(hex(Codec.compactEncode(65535)) == "feff0300")
  }

  test("base58 round-trip with leading zeros") {
    for (_ <- 1 to 100) {
      val zeros = rnd.nextInt(4)
      val body = Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt().toByte)
      val b = Array.fill[Byte](zeros)(0) ++ body
      assert(java.util.Arrays.equals(
        Codec.base58Decode(Codec.base58Encode(b)), b))
    }
  }

  test("hex round-trip") {
    for (_ <- 1 to 100) {
      val bytes = Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      assert(java.util.Arrays.equals(
        Codec.hexToBytes(Codec.bytesToHex(bytes)), bytes))
    }
  }

  test("inverted ts key orders reverse-chronologically") {
    for (_ <- 1 to 100) {
      val a = math.abs(rnd.nextInt()).toLong
      val b = math.abs(rnd.nextInt()).toLong
      if (a < b)
        assert(Codec.invertedTsKey(a) > Codec.invertedTsKey(b))
    }
  }

  test("mortal era decode: spec example and immortal") {
    // the SCALE spec's worked example: bytes b5 03 → period 64, phase 59
    assert(Codec.decodeMortalEra(0xb5, 0x03).contains((64L, 59L)))
    assert(Codec.decodeMortalEra(0, 0).isEmpty) // immortal
    // large period uses the quantize factor
    val (p, ph) = Codec.decodeMortalEra(0xee, 0xff).get
    assert(p == 2L << 0xe)
    assert(ph % math.max(p >> 12, 1) == 0)
    // lifetime window contains the current block and aligns to phase
    val (birth, death) = Codec.eraLifetime(64, 59, 100000)
    assert(birth == 99963 && death == 100027 && birth % 64 == 59)
  }

  test("System.Account key pubkey extraction with hash check") {
    val pk = Codec.hexToBytes(
      "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d")
    val key = Codec.bytesToHex(
      Codec.twox128("System".getBytes(UTF_8)) ++
        Codec.twox128("Account".getBytes(UTF_8)) ++
        Codec.blake2b(pk, 16) ++ pk)
    assert(Codec.systemAccountKeyPubkey(key).map(hex) ==
      Some(hex(pk)))
    // corrupt the blake2_128 prefix → rejected
    val bad = key.substring(0, 2 + 64) + "00" * 16 +
      key.substring(2 + 64 + 32)
    assert(Codec.systemAccountKeyPubkey(bad).isEmpty)
    assert(Codec.systemAccountKeyPubkey("0x1234").isEmpty)
  }

  test("asset-chain key round-trip incl. '~' inside asset json") {
    val k = Codec.makeAssetChain("""{"Token":"A~B"}""", 22000)
    assert(Codec.parseAssetChain(k) == (("""{"Token":"A~B"}""", 22000)))
  }

  test("multisig account: reference golden vector, order-independent") {
    // ref substrate/test/testMultisig.js: 5 signatories, threshold 3 →
    // 0xd9a5ff2f… (the polkadot-js createKeyMulti expected value);
    // independently recomputed from the public multi_account_id spec
    // (blake2_256("modlpy/utilisuba" ++ compact(n) ++ sorted pubkeys ++
    // u16-LE threshold)).
    val pks = Seq(
      "167786d637fe9977e2a2a20730cdc3a52938252a4938a700f98c2ace33078d77",
      "249ba1d951e5a861be11421b51b02b7cbb6b1ca7ac77a5ba7d85d9cdd5b89c50",
      "82dfe80393393d3b49d8434af052b88141325ca37ebc28905a2e6438a0839264",
      "ac9dcf4418d2e4bc92eec081a02e685250d7e82c4061b418b4897ca5a2c93074",
      "c018140d2c758a0afebfc62dab3cc964590a84ebb2e2ba551713ccb6114d325d"
    ).map(Codec.hexToBytes)
    val expect =
      "d9a5ff2fdd0af1479d2bb66375caaacc48ca0cd736a90304fbb5a24f1522e747"
    assert(hex(Codec.multisigAccount(pks, 3)) == expect)
    // input order must not matter (the runtime sorts signatories)
    assert(hex(Codec.multisigAccount(rnd.shuffle(pks), 3)) == expect)
    // threshold participates in the digest
    assert(hex(Codec.multisigAccount(pks, 2)) != expect)
    intercept[IllegalArgumentException] {
      Codec.multisigAccount(Seq(Array.fill[Byte](20)(1)), 1) // not 32 bytes
    }
  }

  test("sovereign account: para/sibl prefixes, u32-LE, zero padding") {
    // paraID 2000 → "para" ++ d0070000 ++ zeros (ref paraTool.js:889)
    assert(hex(Codec.sovereignAccount(2000L)) ==
      "70617261d0070000" + "0" * 48)
    assert(hex(Codec.sovereignAccount(2000L, sibling = true)) ==
      "7369626cd0070000" + "0" * 48)
    // 4-byte little-endian: 0x01020304 → 04030201
    assert(hex(Codec.sovereignAccount(0x01020304L)).startsWith(
      "7061726104030201"))
    intercept[IllegalArgumentException] {
      Codec.sovereignAccount(-1L)
    }
  }

  test("pubkey↔H160 mapping (AccountId20 chains)") {
    val pk = Codec.hexToBytes(
      "167786d637fe9977e2a2a20730cdc3a52938252a4938a700f98c2ace33078d77")
    // addressToEvm = 20-byte truncation
    assert(hex(Codec.pubkeyToH160(pk)) ==
      "167786d637fe9977e2a2a20730cdc3a52938252a")
    // evmToAddress = blake2_256("evm:" ++ h160); golden value computed
    // independently (python hashlib.blake2b) for the well-known Alith
    // dev account 0xf24ff3a9…
    val alith = Codec.hexToBytes("f24ff3a9cf04c71dbc94d0b566f7a27b94566cac")
    assert(hex(Codec.h160ToPubkey(alith)) ==
      "a02a00e549cb104f710d3fe6f2f83e91524d2a40c4ed831658a120883077f9a9")
    intercept[IllegalArgumentException] { Codec.pubkeyToH160(alith) }
    intercept[IllegalArgumentException] { Codec.h160ToPubkey(pk) }
  }

  test("chain parser dispatch: Moonbeam EVM specialization") {
    import graft.decode.{ChainParser, MoonbeamParser}
    val p = ChainParser.forChain(2004)
    assert(p.isInstanceOf[MoonbeamParser])
    assert(p.transferKind("ethereum", "Executed") == Some("evm"))
    assert(p.transferKind("balances", "Transfer") == Some("native"))
    // H160 asset ids canonicalize to lowercase; other ids pass through
    assert(p.assetKey("0xF24FF3a9CF04c71Dbc94D0b566f7A27B94566cAc") ==
      "0xf24ff3a9cf04c71dbc94d0b566f7a27b94566cac~2004")
    assert(p.assetKey("GLMR") == "GLMR~2004")
    assert(p.asInstanceOf[MoonbeamParser].accountH160(
      "0x167786d637fe9977e2a2a20730cdc3a52938252a4938a700f98c2ace33078d77")
      == "0x167786d637fe9977e2a2a20730cdc3a52938252a")
    // generic chains keep the generic parser
    assert(!ChainParser.forChain(0).isInstanceOf[MoonbeamParser])
  }

  test("toBaseUnit scales by decimals") {
    assert(Codec.toBaseUnit(BigInt("12345678901"), 10) == 1.2345678901)
  }

  test("pubkeyAscii: module-account name decode (paraTool.js:378)") {
    // sovereign para account: "para" ++ u32-LE(2000) ++ zero padding
    assert(Codec.pubkeyAscii("0x70617261d007" + "00" * 26)
      == "para:2000")
    // sibling variant, para 2004
    assert(Codec.pubkeyAscii("0x7369626cd407" + "00" * 26)
      == "sibl:2004")
    // pallet account: "modl" ++ "py/trsry" ++ padding — pure ASCII,
    // no numeric remainder
    val modl = Codec.bytesToHex(
      "modlpy/trsry".getBytes("US-ASCII")) + "00" * 20
    assert(Codec.pubkeyAscii(modl) == "modlpy/trsry")
    // unprefixed pubkeys are not module accounts
    assert(Codec.pubkeyAscii("0x" + "11" * 32) == null)
    assert(Codec.pubkeyAscii(null) == null)
    assert(Codec.pubkeyAscii("0x7061") == null) // < 4 bytes
    // >2 leftover non-ASCII bytes: the ":<int>" suffix is dropped
    // (the reference's remaining.length <= 4 guard)
    assert(Codec.pubkeyAscii("0x70617261d0d1d2" + "00" * 25) == "para")
    // malformed hex must NEVER throw — this runs as the keep gate
    // over the full holder scan (non-hex pair, odd length)
    assert(Codec.pubkeyAscii("0x70617261zz" + "00" * 26) == "para")
    assert(Codec.pubkeyAscii("0x70617261d07") == null)
  }
}
