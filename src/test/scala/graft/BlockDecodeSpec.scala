package graft

import graft.decode.BlockDecode
import graft.decode.BlockDecode.{CallMeta, EventMeta, RuntimeMeta}
import graft.etl.Dump
import graft.functions.Codec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Raw SCALE block decode (P1 subset) → Dump end-to-end: the fixtures
  * here are genuine SCALE bytes (compact ints, v4 envelopes, u128-LE
  * event fields) ENCODED by the test and DECODED by BlockDecode — with
  * a runtime upgrade mid-fixture that shifts the balances pallet index,
  * so a correct decode is only possible through the spec-version as-of
  * dimension. */
class BlockDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- test-side SCALE encoder ----
  private def cp(v: BigInt): Array[Byte] = Codec.compactEncode(v)
  private def cp(v: Long): Array[Byte] = Codec.compactEncode(BigInt(v))
  private def u32le(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def u128le(v: BigInt): Array[Byte] = {
    val le = v.toByteArray.dropWhile(_ == 0).reverse
    le ++ Array.fill[Byte](16 - le.length)(0)
  }
  private def b(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray

  private val alice = Codec.hexToBytes(
    "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d")
  private val bob = Codec.hexToBytes(
    "8eaf04151687736326c9fea17e25fc5287613693c912909cb226aa4794f26a48")
  private val sig = Array.fill[Byte](64)(1)

  // spec 100: balances at pallet 4; spec 101 (runtime upgrade): pallet 5
  private def meta(spec: Int, balancesPallet: Int) = RuntimeMeta(spec, 10,
    calls = Seq(
      CallMeta(0, 1, "system", "remark"),
      CallMeta(3, 0, "timestamp", "set"),
      CallMeta(balancesPallet, 0, "balances", "transfer"),
      CallMeta(16, 0, "utility", "batch")),
    events = Seq(
      EventMeta(0, 0, "system", "ExtrinsicSuccess"),
      EventMeta(0, 1, "system", "ExtrinsicFailed"),
      EventMeta(balancesPallet, 2, "balances", "Transfer"),
      EventMeta(balancesPallet, 7, "balances", "Deposit")))
  private val m100 = meta(100, 4)
  private val m101 = meta(101, 5)

  private def envelope(signed: Boolean, call: Array[Byte]): String = {
    val body =
      if (signed)
        b(Array(0x84.toByte), Array(0.toByte), alice, sig,
          Array(0.toByte) /* immortal era */, cp(7) /* nonce */,
          cp(0) /* tip */, call)
      else b(Array(0x04.toByte), call)
    Codec.bytesToHex(b(cp(body.length), body))
  }

  private def tsSet(millis: Long) = b(Array(3.toByte, 0.toByte), cp(millis))
  private def transfer(pallet: Int, to: Array[Byte], amt: Long) =
    b(Array(pallet.toByte, 0.toByte), Array(0.toByte), to, cp(amt))

  private def success(exIdx: Int) =
    b(Array(0.toByte), u32le(exIdx), Array(0.toByte, 0.toByte),
      cp(1000), cp(0), Array(0.toByte, 0.toByte), cp(0))
  private def failed(exIdx: Int) =
    b(Array(0.toByte), u32le(exIdx), Array(0.toByte, 1.toByte),
      Array(3.toByte), Array(5.toByte), u32le(2),
      cp(1000), cp(0), Array(0.toByte, 0.toByte), cp(0))
  private def transferEv(exIdx: Int, pallet: Int, amt: BigInt) =
    b(Array(0.toByte), u32le(exIdx), Array(pallet.toByte, 2.toByte),
      alice, bob, u128le(amt), cp(0))
  private def eventsHex(evs: Array[Byte]*): String =
    Codec.bytesToHex(b(cp(evs.length.toLong) +: evs: _*))

  private def ts(s: String) = Timestamp.valueOf(s)

  // block 1 @spec100, blocks 2-3 @spec101 (balances pallet moved 4→5)
  private lazy val raw = Seq(
    (0, 1L, "0xb1", "0xb0", ts("2024-03-01 10:00:00"), true, "0xaa",
      Seq(envelope(signed = false, tsSet(1709287200000L)),
        envelope(signed = true, transfer(4, bob, 10000000000L))),
      eventsHex(success(0), transferEv(1, 4, BigInt(10000000000L)),
        success(1))),
    (0, 2L, "0xb2", "0xb1", ts("2024-03-01 11:00:00"), true, "0xaa",
      Seq(envelope(signed = false, tsSet(1709290800000L)),
        envelope(signed = true,
          b(Array(16.toByte, 0.toByte), cp(2),
            transfer(5, bob, 20000000000L),
            b(Array(0.toByte, 1.toByte), cp(2),
              "hi".getBytes("US-ASCII"))))),
      eventsHex(success(0), transferEv(1, 5, BigInt(20000000000L)),
        success(1))),
    (0, 3L, "0xb3", "0xb2", ts("2024-03-01 12:00:00"), true, "0xaa",
      Seq(envelope(signed = true, transfer(5, bob, 999L))),
      eventsHex(failed(0)))
  ).toDF("chain_id", "number", "hash", "parent_hash", "block_time",
    "finalized", "author_pub", "extrinsics_hex", "events_hex")

  private lazy val specVersions =
    Seq((1L, 100), (2L, 101)).toDF("block_number", "spec_version")

  private lazy val decoded =
    BlockDecode.decodeBlocks(raw, specVersions, Seq(m100, m101))

  private lazy val outRoot =
    java.nio.file.Files.createTempDirectory("graft_rawdump").toString
  private lazy val out = Dump.dumpDay(decoded.toDF(), "2024-03-01", outRoot)

  test("proxy.proxy unwraps recursively; staking.bond payee variants") {
    val mp = RuntimeMeta(100, 10,
      calls = m100.calls ++ Seq(CallMeta(29, 0, "proxy", "proxy"),
        CallMeta(6, 0, "staking", "bond")),
      events = m100.events)
    // proxy(real=bob, forceProxyType=Some(2), balances.transfer(bob, 5))
    val call = b(Array(29.toByte, 0.toByte), Array(0.toByte), bob,
      Array(1.toByte, 2.toByte),
      Array(4.toByte, 0.toByte), Array(0.toByte), bob, cp(5))
    val node = BlockDecode.decodeCall(
      new BlockDecode.Cursor(call), mp)
    assert(node.section == "proxy" && node.method == "proxy")
    assert(node.args.contains("\"forceProxyType\":2"))
    assert(node.args.contains(Codec.bytesToHex(bob)))
    assert(node.calls.size == 1)
    assert(node.calls.head.section == "balances")
    assert(node.calls.head.args.contains("\"value\":5"))
    // bond(value, payee=Account(bob)) and bond(value, payee=Staked)
    val bondAcct = b(Array(6.toByte, 0.toByte), cp(1000),
      Array(3.toByte), bob)
    val n2 = BlockDecode.decodeCall(new BlockDecode.Cursor(bondAcct), mp)
    assert(n2.args.contains("\"account\":\"" + Codec.bytesToHex(bob)))
    val bondStaked = b(Array(6.toByte, 0.toByte), cp(1000),
      Array(0.toByte))
    val n3 = BlockDecode.decodeCall(new BlockDecode.Cursor(bondStaked), mp)
    assert(n3.args.contains("\"variant\":0"))
  }

  test("staking and proxy events decode") {
    val me = RuntimeMeta(100, 10, calls = m100.calls,
      events = m100.events ++ Seq(
        EventMeta(6, 1, "staking", "Rewarded"),
        EventMeta(29, 1, "proxy", "ProxyExecuted")))
    val events = b(cp(3),
      // Rewarded(alice, 777) in extrinsic 0
      Array(0.toByte), u32le(0), Array(6.toByte, 1.toByte), alice,
      u128le(777), cp(0),
      // ProxyExecuted(Ok) in extrinsic 0
      Array(0.toByte), u32le(0), Array(29.toByte, 1.toByte),
      Array(0.toByte), cp(0),
      // ProxyExecuted(Err Module(pallet 5, code 3)) in extrinsic 1
      Array(0.toByte), u32le(1), Array(29.toByte, 1.toByte),
      Array(1.toByte, 3.toByte, 5.toByte), u32le(3), cp(0))
    val out = BlockDecode.decodeEvents(Codec.bytesToHex(events), me)
    assert(out.size == 3)
    assert(out(0).section == "staking" && out(0).method == "Rewarded")
    assert(out(0).data.contains("\"amount\":777"))
    assert(out(0).data.contains(Codec.bytesToHex(alice)))
    assert(out(1).data == """{"result":"ok"}""")
    assert(out(2).data.contains("\"result\":\"err\""))
    assert(out(2).data.contains("\"pallet\":5"))
  }

  test("spec-version as-of selects the right dispatch tables") {
    val specs = decoded.collect().map(bk => bk.number -> bk.spec_version).toMap
    assert(specs == Map(1L -> 100, 2L -> 101, 3L -> 101))
    // block 2's bytes are NOT decodable under spec-100 tables: the
    // balances pallet moved — proving the as-of join is load-bearing
    intercept[IllegalArgumentException] {
      BlockDecode.decodeExtrinsic(
        envelope(signed = true, transfer(5, bob, 1L)), m100)
    }
  }

  test("extrinsic envelope: signer, unsigned, hash = blake2_256(bytes)") {
    val ex = decoded.filter(_.number == 1L).head().extrinsics
    assert(!ex(0).signed && ex(0).section == "timestamp" &&
      ex(0).method == "set")
    assert(ex(1).signed &&
      ex(1).signer_pub == Codec.bytesToHex(alice))
    val rawHex = envelope(signed = true, transfer(4, bob, 10000000000L))
    assert(ex(1).hash ==
      Codec.bytesToHex(Codec.blake2b256(Codec.hexToBytes(rawHex))))
  }

  test("dump from raw bytes: extrinsic status from decoded events") {
    val e = out("extrinsics").orderBy("extrinsic_id").collect()
    val byId = e.map(r => r.getAs[String]("extrinsic_id") -> r).toMap
    assert(byId.keySet == Set("1-0", "1-1", "2-0", "2-1", "3-0"))
    assert(byId("1-1").getAs[Boolean]("status"))
    assert(!byId("3-0").getAs[Boolean]("status")) // ExtrinsicFailed
    assert(byId("1-0").getAs[String]("signer_ss58") == null)
    assert(byId("1-1").getAs[String]("signer_ss58") != null)
  }

  test("dump from raw bytes: transfers decoded from u128-LE event fields") {
    val t = out("transfers").orderBy("extrinsic_id").collect()
    assert(t.map(_.getAs[Double]("amount")).toSeq == Seq(1.0, 2.0))
    assert(t.map(_.getAs[String]("asset")).toSet == Set("native~0"))
    assert(t(0).getAs[String]("from_ss58") ==
      "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY") // Alice
  }

  test("dump from raw bytes: batch flattened, remark suppressed") {
    val c = out("calls").filter(col("extrinsic_id") === "2-1")
      .orderBy("call_id").collect()
    assert(c.map(_.getAs[String]("call_id")).toSeq == Seq("0", "0_0"))
    assert(c(0).getAs[String]("call_section") == "utility")
    assert(c(1).getAs[String]("call_method") == "transfer")
    // decoded compact arg survives into call_args JSON
    assert(c(1).getAs[String]("call_args").contains("20000000000"))
  }

  test("System.Account storage value decode") {
    val v = b(u32le(5), u32le(1), u32le(1), u32le(0),
      u128le(BigInt("123456789012345678901")), u128le(BigInt(7)),
      u128le(BigInt(0)), u128le(BigInt(0)))
    val a = BlockDecode.decodeAccountInfo(Codec.bytesToHex(v))
    assert(a.nonce == 5 && a.consumers == 1 && a.providers == 1)
    assert(a.free == BigInt("123456789012345678901"))
    assert(a.reserved == BigInt(7) && a.frozen == BigInt(0))
  }

  test("mortal-era signed envelope decodes (two-byte era consumed)") {
    // era = 0xc503 (a real two-byte mortal era; Codec.decodeMortalEra
    // golden family) instead of the immortal 0x00
    val call = transfer(4, bob, 777L)
    val body = b(Array(0x84.toByte), Array(0.toByte), alice, sig,
      Array(0xc5.toByte, 0x03.toByte), cp(7), cp(2) /* tip */, call)
    val hexStr = Codec.bytesToHex(b(cp(body.length), body))
    val d = BlockDecode.decodeExtrinsic(hexStr, m100)
    assert(d.signed && d.tip == BigInt(2))
    assert(d.call.method == "transfer" &&
      d.call.args.contains("777"))
  }

  test("block preceding the first spec entry is an error, not a null") {
    val pre = Seq((0, 0L, "0xb0", "0x", ts("2024-03-01 09:00:00"), true,
        "0xaa", Seq(envelope(signed = false, tsSet(1L))),
        eventsHex(success(0))))
      .toDF("chain_id", "number", "hash", "parent_hash", "block_time",
        "finalized", "author_pub", "extrinsics_hex", "events_hex")
    intercept[Exception] {
      BlockDecode.decodeBlocks(pre, specVersions, Seq(m100, m101)).collect()
    }
  }

  test("truncated System.Account value is rejected, not zero-padded") {
    val full = b(u32le(5), u32le(1), u32le(1), u32le(0),
      u128le(BigInt(100)), u128le(BigInt(0)), u128le(BigInt(0)))
    intercept[IllegalArgumentException] {
      BlockDecode.decodeAccountInfo(Codec.bytesToHex(full.take(40)))
    }
  }

  // ---- metadata-driven tier: pallets with NO hand dispatch table ----

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private lazy val metaPallets = {
    import graft.decode.MetaDecode._
    Seq(
      PalletDef(30, "multisig", calls = Seq(
        ItemDef(1, "asMulti", Seq(
          "threshold" -> U16,
          "otherSignatories" -> Vec(AccountId),
          "maybeTimepoint" -> Opt(Struct(Seq(
            "height" -> U32, "index" -> U32))),
          "call" -> CallType,
          "maxWeight" -> CompactInt)))),
      PalletDef(28, "identity", calls = Seq(
        ItemDef(1, "setIdentity", Seq(
          "display" -> Str, "legal" -> Opt(Str), "web" -> Opt(Str),
          "extra" -> Vec(Tup(Seq(Str, Bytes)))))),
        events = Seq(
          ItemDef(0, "IdentitySet", Seq("who" -> AccountId)),
          ItemDef(2, "JudgementGiven", Seq(
            "target" -> AccountId, "registrarIndex" -> U32,
            "judgement" -> Enum(Seq(
              "Unknown" -> Seq.empty, "FeePaid" -> Seq("fee" -> U128),
              "Reasonable" -> Seq.empty, "KnownGood" -> Seq.empty,
              "OutOfDate" -> Seq.empty, "LowQuality" -> Seq.empty,
              "Erroneous" -> Seq.empty)))))),
      PalletDef(29, "proxy", calls = Seq(
        ItemDef(1, "addProxy", Seq(
          "delegate" -> MultiAddress,
          "proxyType" -> Enum(Seq("Any" -> Seq.empty,
            "NonTransfer" -> Seq.empty, "Governance" -> Seq.empty,
            "Staking" -> Seq.empty)),
          "delay" -> U32))),
        events = Seq(
          ItemDef(2, "ProxyAdded", Seq(
            "delegator" -> AccountId, "delegatee" -> AccountId,
            "proxyType" -> Enum(Seq("Any" -> Seq.empty,
              "NonTransfer" -> Seq.empty, "Governance" -> Seq.empty,
              "Staking" -> Seq.empty)),
            "delay" -> U32)))))
  }

  private lazy val mMeta = RuntimeMeta(100, 10, calls = m100.calls,
    events = m100.events, pallets = metaPallets)

  test("metadata-only pallet decodes a call with no hand-written table") {
    // identity.setIdentity("alice", Some("Alice A"), None,
    //   [("twitter", 0xbeef)])
    def str(s: String) = b(cp(s.length.toLong), s.getBytes("UTF-8"))
    val call = b(Array(28.toByte, 1.toByte),
      str("alice"), Array(1.toByte), str("Alice A"), Array(0.toByte),
      cp(1), str("twitter"), cp(2), Array(0xbe.toByte, 0xef.toByte))
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), mMeta)
    assert(node.section == "identity" && node.method == "setIdentity")
    assert(node.args == """{"display":"alice","legal":"Alice A",""" +
      """"web":null,"extra":[["twitter","0xbeef"]]}""")
    assert(node.calls.isEmpty)
  }

  test("metadata tier recurses into hand-table nested calls") {
    // multisig.asMulti(2, [bob], Some((7, 1)), balances.transfer(bob, 5),
    //   maxWeight=1000) — the inner call decodes through the HAND table
    val call = b(Array(30.toByte, 1.toByte),
      u16le(2), cp(1), bob,
      Array(1.toByte), u32le(7), u32le(1),
      b(Array(4.toByte, 0.toByte), Array(0.toByte), bob, cp(5)),
      cp(1000))
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), mMeta)
    assert(node.section == "multisig" && node.method == "asMulti")
    assert(node.args.contains(""""threshold":2"""))
    assert(node.args.contains(
      s""""otherSignatories":["${Codec.bytesToHex(bob)}"]"""))
    assert(node.args.contains(""""maybeTimepoint":{"height":7,"index":1}"""))
    assert(node.args.contains(""""call":"<call:balances.transfer>""""))
    assert(node.calls.size == 1)
    assert(node.calls.head.section == "balances" &&
      node.calls.head.args.contains(""""value":5"""))
  }

  test("metadata-only events decode, incl. enum variants") {
    val events = b(cp(3),
      // IdentitySet(alice) in extrinsic 0
      Array(0.toByte), u32le(0), Array(28.toByte, 0.toByte), alice, cp(0),
      // JudgementGiven(bob, 4, FeePaid(123)) in extrinsic 0
      Array(0.toByte), u32le(0), Array(28.toByte, 2.toByte), bob,
      u32le(4), Array(1.toByte), u128le(BigInt(123)), cp(0),
      // ProxyAdded(alice, bob, Staking, delay=0) in extrinsic 1
      Array(0.toByte), u32le(1), Array(29.toByte, 2.toByte), alice, bob,
      Array(3.toByte), u32le(0), cp(0))
    val out = BlockDecode.decodeEvents(Codec.bytesToHex(events), mMeta)
    assert(out.size == 3)
    assert(out(0).section == "identity" && out(0).method == "IdentitySet")
    assert(out(0).data == s"""{"who":"${Codec.bytesToHex(alice)}"}""")
    assert(out(1).data.contains(""""variant":"FeePaid","fee":123"""))
    assert(out(2).section == "proxy" && out(2).method == "ProxyAdded")
    assert(out(2).data.contains(""""variant":"Staking""""))
    assert(out(2).transfer.isEmpty)
  }

  test("metadata-driven storage value decode matches the hand decoder") {
    import graft.decode.MetaDecode
    val v = b(u32le(5), u32le(1), u32le(1), u32le(0),
      u128le(BigInt("123456789012345678901")), u128le(BigInt(7)),
      u128le(BigInt(0)), u128le(BigInt(0)))
    val json = MetaDecode.decodeStorageValue(
      Codec.bytesToHex(v), MetaDecode.AccountInfoShape)
    assert(json == """{"nonce":5,"consumers":1,"providers":1,""" +
      """"sufficients":0,"data":{"free":123456789012345678901,""" +
      """"reserved":7,"frozen":0,"flags":0}}""")
    // agreement with the hand decoder on the same bytes
    val hand = BlockDecode.decodeAccountInfo(Codec.bytesToHex(v))
    assert(hand.nonce == 5 && hand.free == BigInt("123456789012345678901"))
    // a plain u128 storage value (tokens.totalIssuance shape)
    assert(MetaDecode.decodeStorageValue(
      Codec.bytesToHex(u128le(BigInt(42))), MetaDecode.U128) == "42")
    // trailing bytes are rejected, not truncated
    intercept[IllegalArgumentException] {
      MetaDecode.decodeStorageValue(
        Codec.bytesToHex(b(v, Array(1.toByte))),
        MetaDecode.AccountInfoShape)
    }
  }

  test("metadata tier rejects unknown indices and bad enum tags") {
    intercept[IllegalArgumentException] {
      BlockDecode.decodeCall(
        new BlockDecode.Cursor(Array(99.toByte, 0.toByte)), mMeta)
    }
    // proxy.addProxy with enum tag 9 (only 4 variants) must reject
    val bad = b(Array(29.toByte, 1.toByte), Array(0.toByte), bob,
      Array(9.toByte), u32le(0))
    intercept[IllegalArgumentException] {
      BlockDecode.decodeCall(new BlockDecode.Cursor(bad), mMeta)
    }
  }

  test("malformed input is rejected, not misdecoded") {
    // truncated extrinsic: length prefix larger than payload
    intercept[Exception] {
      BlockDecode.decodeExtrinsic(Codec.bytesToHex(b(cp(99), Array(4.toByte))), m100)
    }
    // trailing garbage after the call
    val good = Codec.hexToBytes(envelope(signed = false, tsSet(1L)))
    val withTrailing = b(cp(good.length - 1 + 1), good.drop(1), Array(9.toByte))
    intercept[Exception] {
      BlockDecode.decodeExtrinsic(Codec.bytesToHex(withTrailing), m100)
    }
  }
}
