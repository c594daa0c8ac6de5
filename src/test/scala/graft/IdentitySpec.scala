package graft

import graft.decode.BlockDecode
import graft.decode.BlockDecode.{CallMeta, EventMeta, RuntimeMeta}
import graft.decode.MetaDecode._
import graft.etl.{Dump, Identity}
import graft.functions.{Codec, Udfs}
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Identity registrar face end-to-end from raw bytes (ref
  * identityManager.js:40 dump_identity): setIdentity/clearIdentity/
  * addSub calls and JudgementGiven events decode through the metadata
  * tier, and the dimension resolves latest-wins identity state,
  * sub-identity edges, and judgement verification. */
class IdentitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def cp(v: Long): Array[Byte] = Codec.compactEncode(BigInt(v))
  private def u32le(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def u128le(v: BigInt): Array[Byte] = {
    val le = v.toByteArray.dropWhile(_ == 0).reverse
    le ++ Array.fill[Byte](16 - le.length)(0)
  }
  private def b(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray
  private def str(s: String) = b(cp(s.length.toLong), s.getBytes("UTF-8"))

  private val alice = Codec.hexToBytes(
    "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d")
  private val bob = Codec.hexToBytes(
    "8eaf04151687736326c9fea17e25fc5287613693c912909cb226aa4794f26a48")
  private val charlie = Codec.hexToBytes(
    "90b5ab205c6974c9ea841be688864633dc9ca8a357843eeacf2314649965fe22")
  private val sig = Array.fill[Byte](64)(1)
  private def hx(a: Array[Byte]) = Codec.bytesToHex(a)

  // the SHIPPED standard identity definition, onboarded by index alone
  private val meta = RuntimeMeta(100, 10,
    calls = Seq(CallMeta(4, 0, "balances", "transfer")),
    events = Seq(
      EventMeta(0, 0, "system", "ExtrinsicSuccess"),
      EventMeta(0, 1, "system", "ExtrinsicFailed")),
    pallets = Seq(StandardPallets.identity(28)))

  private def envelope(signer: Array[Byte], call: Array[Byte]): String = {
    val body = b(Array(0x84.toByte), Array(0.toByte), signer, sig,
      Array(0.toByte), cp(7), cp(0), call)
    Codec.bytesToHex(b(cp(body.length), body))
  }

  private def success(exIdx: Int) =
    b(Array(0.toByte), u32le(exIdx), Array(0.toByte, 0.toByte),
      cp(1000), cp(0), Array(0.toByte, 0.toByte), cp(0))
  private def judgement(exIdx: Int, target: Array[Byte], registrar: Long,
      variant: Int, fee: Option[BigInt] = None) =
    b(Array(0.toByte), u32le(exIdx), Array(28.toByte, 2.toByte), target,
      u32le(registrar), Array(variant.toByte),
      fee.map(u128le).getOrElse(Array.empty[Byte]), cp(0))
  private def eventsHex(evs: Array[Byte]*): String =
    Codec.bytesToHex(b(cp(evs.length.toLong) +: evs: _*))
  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val raw = Seq(
    (0, 1L, "0xb1", "0xb0", ts("2024-03-01 10:00:00"), true, "0xaa",
      Seq(
        envelope(alice, b(Array(28.toByte, 1.toByte), str("alice"),
          Array(1.toByte), str("Alice A"), Array(0.toByte))),
        envelope(bob, b(Array(28.toByte, 1.toByte), str("bobby"),
          Array(0.toByte), Array(0.toByte)))),
      eventsHex(success(0), success(1),
        judgement(0, alice, 0, 1, Some(BigInt(500))), // FeePaid(500)
        judgement(1, bob, 1, 2))), // Reasonable
    (0, 2L, "0xb2", "0xb1", ts("2024-03-01 11:00:00"), true, "0xaa",
      Seq(
        envelope(bob, Array(28.toByte, 3.toByte)), // clearIdentity
        envelope(alice, b(Array(28.toByte, 12.toByte), Array(0.toByte),
          charlie, str("alice/hot")))),
      eventsHex(success(0), success(1),
        judgement(0, alice, 0, 3))) // KnownGood supersedes FeePaid
  ).toDF("chain_id", "number", "hash", "parent_hash", "block_time",
    "finalized", "author_pub", "extrinsics_hex", "events_hex")

  private lazy val dim = {
    Udfs.register(spark)
    val decoded = BlockDecode.decodeBlocks(raw,
      Seq((1L, 100)).toDF("block_number", "spec_version"), Seq(meta)).toDF()
    Identity.identities(
      Dump.calls(decoded, "2024-03-01"),
      Dump.extrinsics(decoded, "2024-03-01"),
      Dump.events(decoded, "2024-03-01"))
  }

  test("identity dimension: latest-wins info, subs, judgements") {
    val rows = dim.collect()
      .map(r => r.getAs[String]("pubkey") -> r).toMap
    assert(rows.keySet == Set(hx(alice), hx(bob), hx(charlie)))
    val a = rows(hx(alice))
    assert(a.getAs[String]("display") == "alice")
    assert(a.getAs[String]("legal") == "Alice A")
    assert(a.getAs[Boolean]("verified")) // registrar 0: FeePaid→KnownGood
    assert(a.getAs[Long]("n_judgements") == 1)
    assert(!a.getAs[Boolean]("is_subidentity"))
    // bob cleared his identity but keeps his Reasonable judgement
    val bo = rows(hx(bob))
    assert(bo.getAs[String]("display") == null)
    assert(bo.getAs[Boolean]("verified"))
    // charlie exists only as alice's sub-identity
    val c = rows(hx(charlie))
    assert(c.getAs[Boolean]("is_subidentity"))
    assert(c.getAs[String]("parent_pub") == hx(alice))
    assert(c.getAs[String]("subname") == "alice/hot")
    assert(!c.getAs[Boolean]("verified"))
    // ss58 decoration present (Alice's well-known polkadot address)
    assert(a.getAs[String]("polkadot_ss58") ==
      "15oF4uVJwmo4TdGW7VfQxNLavjCXviqxT9S1MgbjMNHr6Sp5")
  }

  test("batch extrinsic: call path breaks latest-wins ties") {
    // setIdentity then clearIdentity INSIDE ONE utility.batch — same
    // (block, extrinsic), only the call path orders them; the tombstone
    // must win. The reversed batch must leave the identity set.
    Udfs.register(spark)
    val metaB = meta.copy(calls =
      meta.calls :+ CallMeta(16, 0, "utility", "batch"))
    val setId = b(Array(28.toByte, 1.toByte), str("dave"),
      Array(0.toByte), Array(0.toByte))
    val clearId = Array(28.toByte, 3.toByte)
    def block(calls: Seq[Array[Byte]]) = Seq(
      (0, 5L, "0xb5", "0xb4", ts("2024-03-02 10:00:00"), true, "0xaa",
        Seq(envelope(charlie,
          b((Array(16.toByte, 0.toByte) +: cp(calls.length.toLong) +:
            calls): _*))),
        eventsHex(success(0))))
      .toDF("chain_id", "number", "hash", "parent_hash", "block_time",
        "finalized", "author_pub", "extrinsics_hex", "events_hex")
    def infoOf(calls: Seq[Array[Byte]]) = {
      val decoded = BlockDecode.decodeBlocks(block(calls),
        Seq((1L, 100)).toDF("block_number", "spec_version"),
        Seq(metaB)).toDF()
      Identity.identityInfo(
        Dump.calls(decoded, "2024-03-02"),
        Dump.extrinsics(decoded, "2024-03-02")).collect()
    }
    assert(infoOf(Seq(setId, clearId)).isEmpty) // clear is later → wins
    val set = infoOf(Seq(clearId, setId)) // set is later → survives
    assert(set.length == 1 &&
      set.head.getAs[String]("display") == "dave")
  }

  test("decorate joins display + verified onto an account-keyed result") {
    val res = Seq(hx(alice), hx(charlie), hx(bob)).toDF("account_pub")
    val dec = Identity.decorate(res, dim, "account_pub")
      .collect()
      .map(r => r.getAs[String]("account_pub") ->
        ((r.getAs[String]("identity_display"),
          r.getAs[Boolean]("identity_verified")))).toMap
    assert(dec(hx(alice)) == (("alice", true)))
    assert(dec(hx(charlie)) == ((null, false)))
    assert(dec(hx(bob)) == ((null, true)))
  }

  test("published identity/exchanges/knownpubs dims + serve lookup " +
      "(ref identityManager.js:41, substrateetl.js:671)") {
    // polkadot = the end-to-end dim; kusama = empty (outer-join nulls)
    val kusama = dim.limit(0)
    val identity = Identity.identityExport(dim, kusama)
    val rows = identity.collect()
      .map(r => r.getAs[String]("pubkey") -> r).toMap
    // charlie is alice's sub: inherits name/verified, "parent/sub"
    // fullname, and both ss58 renderings carry the REAL prefixes
    val c = rows(hx(charlie))
    assert(c.getAs[Boolean]("polkadot_is_subidentity"))
    assert(c.getAs[String]("polkadot_name") == "alice")
    assert(c.getAs[String]("polkadot_fullname") == "alice/alice/hot")
    assert(c.getAs[Boolean]("polkadot_judgement_verified"))
    assert(c.getAs[String]("polkadot_parent") == hx(alice))
    val (net0, back) = Codec.ss58Decode(c.getAs[String]("polkadot_ss58"))
    assert(net0 == 0 && Codec.bytesToHex(back) == hx(charlie))
    assert(Codec.ss58Decode(c.getAs[String]("kusama_ss58"))._1 == 2)
    // kusama side is all-null on an empty relay
    assert(c.get(c.fieldIndex("kusama_name")) == null &&
      c.get(c.fieldIndex("kusama_judgement_verified")) == null)
    // alice: own identity, info JSON rendered, verified by KnownGood
    val a = rows(hx(alice))
    assert(a.getAs[String]("polkadot_info")
      .contains(""""display":"alice""""))
    assert(a.get(a.fieldIndex("polkadot_is_subidentity")) == null)

    // attribution: real ss58 addresses round-trip through the pubkey
    // gate; the malformed row drops
    val labels = Seq(
      (Codec.ss58Encode(charlie, 0), "Kraken", "Exchange"),
      (Codec.ss58Encode(alice, 2), "W3F", "Foundation"),
      (Codec.ss58Encode(bob, 42), "Joe", "User"),
      ("not-an-address", "X", "Exchange")
    ).toDF("address", "label", "kind")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dims").toString
    val out = Identity.dumpIdentityDims(identity,
      Identity.attributedAccounts(labels), dir)
    assert(out("exchanges").count() == 1)      // Kraken only
    assert(out("knownpubs").count() == 2)      // User + malformed drop
    // serve lookup over the WRITTEN layout: identity + attribution
    val hit = graft.serve.Serve.accountLabel(out("identity"),
      out("knownpubs"), hx(charlie)).collect()
    assert(hit.length == 1)
    assert(hit.head.getAs[String]("polkadot_fullname") ==
      "alice/alice/hot")
    assert(hit.head.getAs[String]("address_nickname") ==
      "Kraken Exchange")
    assert(hit.head.getAs[String]("account_type") == "Exchange")
  }
}
