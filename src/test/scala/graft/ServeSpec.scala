package graft

import graft.serve.Serve
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Serving-layer semantics over dump-layout tables (Q1/Q2/Q4/Q9 of
  * SURVEY §2.10), incl. keyset pagination continuity. */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val blocks = Seq(
    (0, 100L, "0xb100"), (0, 101L, "0xb101"), (2000, 7L, "0xk7")
  ).toDF("chain_id", "number", "hash")

  private lazy val extrinsics = Seq(
    (0, 100L, "100-0", "0xe0"), (0, 100L, "100-1", "0xe1"),
    (0, 101L, "101-0", "0xe2")
  ).toDF("chain_id", "block_number", "extrinsic_id", "hash")

  private lazy val transfers = Seq(
    (0, "a", "b", ts("2024-03-01 10:00:00"), "100-1", 1.0),
    // three transfers share one timestamp — blocks 99/100 interleave to
    // exercise numeric (not lexicographic) extrinsic ordering and the
    // composite keyset
    (0, "b", "a", ts("2024-03-01 11:00:00"), "99-0", 1.5),
    (0, "a", "c", ts("2024-03-01 11:00:00"), "101-0", 2.0),
    (0, "c", "a", ts("2024-03-01 11:00:00"), "101-2", 2.5),
    (2000, "a", "c", ts("2024-03-02 00:30:00"), "7-0", 3.0)
  ).toDF("chain_id", "from_pub_key", "to_pub_key", "block_time",
    "extrinsic_id", "amount")

  test("getBlock returns the block with its extrinsics") {
    val out = Serve.getBlock(blocks, extrinsics, 0, 100L)
    assert(out.count() == 2)
    assert(out.select("hash").distinct().count() == 1)
  }

  test("account timeline: numeric desc order, chain filter, composite keyset") {
    def page(n: Int, before: Option[Serve.Cursor]) =
      Serve.accountTimeline(transfers, "a", None, n, before)
        .select(unix_micros(col("block_time")), col("chain_id"),
          col("extrinsic_id"))
        .collect()
        .map(r => Serve.Cursor(r.getLong(0), r.getInt(1), r.getString(2)))
        .toSeq
    val p1 = page(2, None)
    // newest first; within the shared 11:00 timestamp, block 101 before
    // block 99 NUMERICALLY (lexicographic order would put "99-0" first)
    assert(p1.map(_.extrinsicId) == Seq("7-0", "101-2"))
    // page 2 resumes from the full sort-key cursor — rows sharing the
    // boundary timestamp are NOT skipped
    val p2 = page(2, Some(p1.last))
    assert(p2.map(_.extrinsicId) == Seq("101-0", "99-0"))
    val p3 = page(2, Some(p2.last))
    assert(p3.map(_.extrinsicId) == Seq("100-1"))
    val filtered = Serve.accountTimeline(transfers, "a", Some(Seq(2000)),
      10, None).select("extrinsic_id").collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("7-0"))
    // an externally-supplied malformed cursor fails fast and clearly
    intercept[IllegalArgumentException](
      Serve.Cursor(0L, 0, "not-a-valid-id"))
  }

  test("searchByHash disambiguates block vs extrinsic hits") {
    val b = Serve.searchByHash(blocks, extrinsics, "0xb101").collect()
    assert(b.length == 1 && b(0).getString(0) == "block")
    val e = Serve.searchByHash(blocks, extrinsics, "0xe1").collect()
    assert(e.length == 1 && e(0).getString(0) == "extrinsic")
    assert(Serve.searchByHash(blocks, extrinsics, "0xnope").count() == 0)
  }

  test("latestActivity keeps one latest row per account (numeric id order)") {
    val out = Serve.latestActivity(transfers).collect()
      .map(r => r.getString(0) ->
        (r.getString(2), r.getString(3))).toMap
    assert(out("a") == ("7-0", "out"))   // 2024-03-02 outgoing wins
    // b's latest row is the 11:00 outgoing transfer at block 99
    assert(out("b") == ("99-0", "out"))
    assert(out("c") == ("7-0", "in"))
  }

  test("relatedAccounts serve face decorates relations with identity") {
    val proxy = Seq((0, "0xaa", "0xbb", "Staking", 0L, 5L))
      .toDF("chain_id", "delegator_pub", "delegate_pub", "proxy_type",
        "delay", "since_block")
    val multisig = Seq((0, "0xms", 2, "0xaa"), (0, "0xms", 2, "0xcc"))
      .toDF("chain_id", "multisig_pub", "threshold", "member_pub")
    val identities = Seq(
      ("0xbb", "warm-wallet", true), ("0xcc", "cosigner", false))
      .toDF("pubkey", "display", "verified")
    val out = Serve.relatedAccounts(proxy, multisig, identities, "0xaa")
      .collect()
      .map(r => (r.getAs[String]("relation"),
        r.getAs[String]("related_pub"),
        r.getAs[String]("identity_display"),
        r.getAs[Boolean]("identity_verified"))).toSet
    assert(out == Set(
      ("proxy_delegate", "0xbb", "warm-wallet", true),
      ("multisig_account", "0xms", null, false),
      ("multisig_comember", "0xcc", "cosigner", false)))
  }

  test("accountRewards: lookback bound + reverse-chronological history") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rewards = Seq(
      ("0xa", "1-0-1", ts("2024-03-01 10:00:00"), 123L, BigDecimal(700)),
      ("0xa", "2-0-9", ts("2024-03-02 10:00:00"), 124L, BigDecimal(500)),
      // same block_time as 2-0-9: the NUMERIC event ordering must rank
      // 2-0-87 first (string DESC would put 2-0-9 above it)
      ("0xa", "2-0-87", ts("2024-03-02 10:00:00"), 124L, BigDecimal(1)),
      ("0xa", "9-0-1", ts("2023-01-01 10:00:00"), 50L, BigDecimal(9)),
      ("0xb", "3-0-1", ts("2024-03-01 11:00:00"), 123L, BigDecimal(300)))
      .toDF("account_pub_key", "event_id", "block_time", "era",
        "amount_raw")
    val out = Serve.accountRewards(rewards, "0xa",
      ts("2024-03-10 00:00:00"), lookbackDays = 180).collect()
    // the stale 2023 row falls outside the lookback; 0xb excluded
    assert(out.map(_.getAs[String]("event_id")).toSeq ==
      Seq("2-0-87", "2-0-9", "1-0-1")) // newest first, numeric ties
  }

  test("accountFeed: cross-entity timeline, newest first, keyset page") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val transfers = Seq(
      ("0xa", "0xz", 0, ts("2024-03-01 10:00:00"), "5-1", 1.5, "DOT~0"),
      ("0xz", "0xa", 0, ts("2024-03-01 12:00:00"), "7-0", 2.5, "DOT~0"),
      ("0xz", "0xq", 0, ts("2024-03-01 13:00:00"), "8-0", 9.9, "DOT~0"))
      .toDF("from_pub_key", "to_pub_key", "chain_id", "block_time",
        "extrinsic_id", "amount", "asset")
    val rewards = Seq(
      ("0xa", 0, ts("2024-03-01 11:00:00"), "6-0", BigDecimal(700), 123L))
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "era")
    val crowdloan = Seq(
      ("0xa", 1, ts("2024-03-01 11:30:00"), "6-1", BigDecimal(888), 2024L))
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "para_id")
    val page1 = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
      pageSize = 3).collect()
    assert(page1.map(r => (r.getAs[String]("kind"),
      r.getAs[String]("extrinsic_id"))).toSeq == Seq(
      ("transfer_in", "7-0"), ("crowdloan", "6-1"), ("reward", "6-0")))
    // page 2 resumes from page 1's last row via the composite cursor
    // (incl. the kind — sources can tie on the whole timeline key)
    val last = page1.last
    val page2 = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
      pageSize = 3, before = Some(Serve.FeedCursor(
        last.getAs[java.sql.Timestamp]("block_time").getTime * 1000L,
        last.getAs[Int]("chain_id"),
        last.getAs[String]("extrinsic_id"),
        last.getAs[String]("kind"),
        last.getAs[Long]("disc")))).collect()
    assert(page2.map(_.getAs[String]("kind")).toSeq ==
      Seq("transfer_out")) // the stranger's 8-0 transfer never appears
  }

  test("accountFeed: full-key ties page without loss or duplication") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a contribute extrinsic emits BOTH a transfer row and a
    // Contributed row with the identical timeline key — only the kind
    // distinguishes them; every row must appear exactly once across
    // 1-row pages
    val transfers = Seq(
      ("0xa", "0xpool", 0, ts("2024-03-01 10:00:00"), "5-1", 1.0, "DOT~0"))
      .toDF("from_pub_key", "to_pub_key", "chain_id", "block_time",
        "extrinsic_id", "amount", "asset")
    val rewards = Seq.empty[(String, Int, java.sql.Timestamp, String,
      BigDecimal, Long)]
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "era")
    val crowdloan = Seq(
      ("0xa", 0, ts("2024-03-01 10:00:00"), "5-1", BigDecimal(10), 7L))
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "para_id")
    var cursor: Option[Serve.FeedCursor] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    var page = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
      pageSize = 1, before = cursor).collect()
    while (page.nonEmpty) {
      val r = page.head
      seen += r.getAs[String]("kind")
      cursor = Some(Serve.FeedCursor(
        r.getAs[java.sql.Timestamp]("block_time").getTime * 1000L,
        r.getAs[Int]("chain_id"), r.getAs[String]("extrinsic_id"),
        r.getAs[String]("kind"), r.getAs[Long]("disc")))
      page = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
        pageSize = 1, before = cursor).collect()
    }
    assert(seen.toSeq == Seq("transfer_out", "crowdloan")) // kind desc
  }

  test("accountFeed: same-kind rows in one extrinsic page by the disc") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // a utility.batch sends THREE transfers out in one extrinsic —
    // identical (block_time, chain_id, extrinsic_id, kind); without the
    // per-row discriminator the strictly-less cursor would drop the
    // later duplicates at a page boundary
    val transfers = Seq(
      ("0xa", "0xp", 0, ts("2024-03-01 10:00:00"), "5-1", 1.0, "DOT~0"),
      ("0xa", "0xq", 0, ts("2024-03-01 10:00:00"), "5-1", 2.0, "DOT~0"),
      ("0xa", "0xr", 0, ts("2024-03-01 10:00:00"), "5-1", 3.0, "DOT~0"))
      .toDF("from_pub_key", "to_pub_key", "chain_id", "block_time",
        "extrinsic_id", "amount", "asset")
    val rewards = Seq.empty[(String, Int, java.sql.Timestamp, String,
      BigDecimal, Long)]
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "era")
    val crowdloan = Seq.empty[(String, Int, java.sql.Timestamp, String,
      BigDecimal, Long)]
      .toDF("account_pub_key", "chain_id", "block_time", "extrinsic_id",
        "amount_raw", "para_id")
    var cursor: Option[Serve.FeedCursor] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
    var page = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
      pageSize = 1, before = cursor).collect()
    while (page.nonEmpty) {
      val r = page.head
      seen += r.getAs[Double]("amount")
      cursor = Some(Serve.FeedCursor(
        r.getAs[java.sql.Timestamp]("block_time").getTime * 1000L,
        r.getAs[Int]("chain_id"), r.getAs[String]("extrinsic_id"),
        r.getAs[String]("kind"), r.getAs[Long]("disc")))
      page = Serve.accountFeed(transfers, rewards, crowdloan, "0xa",
        pageSize = 1, before = cursor).collect()
    }
    // all three batch legs surface exactly once, no loss, no dupes
    assert(seen.sorted == Seq(1.0, 2.0, 3.0) && seen.size == 3)
  }

  test("accountXcmTransfers: outbound transfers off the export layout, " +
      "newest first with numeric identity ordering") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val xcm = Seq(
      ("0xa", "5-1", 0, 0, ts(5000), 2000, 1000.0),
      // same origination ts — block 101 must rank above block 99
      // NUMERICALLY (string desc would invert them)
      ("0xa", "99-0", 0, 0, ts(9000), 2004, 10.0),
      ("0xa", "101-0", 0, 0, ts(9000), 2004, 20.0),
      ("0xz", "7-0", 0, 0, ts(9500), 2001, 5.0))
      .toDF("origination_sender_pub_key", "origination_extrinsic_id",
        "origination_transfer_index", "origination_xcm_index",
        "origination_ts", "destination_para_id",
        "origination_amount_sent")
    val out = Serve.accountXcmTransfers(xcm, "0xa", limit = 2).collect()
      .map(_.getAs[String]("origination_extrinsic_id")).toSeq
    assert(out == Seq("101-0", "99-0")) // 0xz excluded, newest page
  }

  test("accountEvmTxs / accountEvmTransfers: both directions with " +
      "direction marker, newest first on the numeric block identity") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val txs = Seq(
      ("0xa", "0xb", 5L, 0, ts(5000)),
      ("0xc", "0xa", 9L, 1, ts(9000)), // received
      // same ts — block 11 must outrank block 9 numerically
      ("0xa", "0xa", 11L, 0, ts(9000)), // self-send reads "out"
      ("0xz", "0xq", 7L, 0, ts(9500))) // other account excluded
      .toDF("from_address", "to_address", "block_number",
        "transaction_index", "block_timestamp")
    val out = Serve.accountEvmTxs(txs, "0xa", limit = 2).collect()
    assert(out.map(_.getAs[Long]("block_number")).toSeq == Seq(11L, 9L))
    assert(out.map(_.getAs[String]("direction")).toSeq ==
      Seq("out", "in"))
    val tr = Seq(
      ("0xa", "0xb", 5L, 0, ts(5000), "ERC20"),
      ("0xb", "0xa", 5L, 2, ts(5000), "ERC721"))
      .toDF("from_address", "to_address", "block_number", "log_index",
        "block_timestamp", "transfer_type")
    val tout = Serve.accountEvmTransfers(tr, "0xa").collect()
    assert(tout.map(_.getAs[String]("transfer_type")).toSeq ==
      Seq("ERC721", "ERC20")) // log_index 2 first within the block
    assert(tout.map(_.getAs[String]("direction")).toSeq ==
      Seq("in", "out"))
  }

  test("addressForms: ss58 renders per network + the H160 truncation") {
    val alice =
      "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d"
    val out = Serve.addressForms(spark, alice).collect()
      .map(r => r.getAs[Int]("network") ->
        (r.getAs[String]("ss58"), r.getAs[String]("h160"))).toMap
    assert(out(42)._1 ==
      "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY")
    assert(out(0)._1.startsWith("1")) // polkadot network prefix
    assert(out(42)._2 == "0x" + alice.take(40)) // H160 = first 20 bytes
    assert(out.keySet == Set(0, 2, 42))
  }

  test("accountBalances: latest row per chain via struct-argmax") {
    val bal = Seq(
      ("0xa", 0, 10L, 5L, 1.0, 0.1, 0.0),
      ("0xa", 0, 20L, 6L, 9.0, 0.2, 0.0),
      // SAME block as the nonce-6 touch, later nonce, SMALLER free —
      // the monotonic nonce must break the tie, not the free value
      ("0xa", 0, 20L, 7L, 2.0, 0.2, 0.0),
      ("0xa", 2, 7L, 1L, 9.0, 0.0, 0.5),
      ("0xb", 0, 30L, 2L, 4.0, 0.0, 0.0))
      .toDF("address_pubkey", "chain_id", "bn", "nonce", "free",
        "reserved", "frozen")
    val out = Serve.accountBalances(bal, "0xa").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getLong(5)))
    assert(out.toSeq == Seq((0, 20L, 2.0, 7L), (2, 7L, 9.0, 1L)))
  }

  test("accountBalances serves straight off the DUMPED balances layout") {
    import spark.implicits._
    import graft.model.RawTrace
    // wire rows through the real trace dump, then the serving face
    // reads the written table — the dump→serve loop closed end to end
    val pfx = graft.functions.Codec.bytesToHex(
      graft.functions.Codec.twox128("System".getBytes("UTF-8")) ++
        graft.functions.Codec.twox128("Account".getBytes("UTF-8")),
      prefix = false)
    def acctVal(nonce: Int, freeLowByte: Int) =
      "0x" + "%02x000000".format(nonce) + "01000000" + "01000000" +
        "00000000" + "%02x00000000000000".format(freeLowByte) +
        "00" * 8 + "00" * 32
    val who = "cd" * 32
    def t(bn: Long, v: String) = RawTrace(0, bn, s"0xb$bn",
      java.sql.Timestamp.valueOf("2024-03-01 09:00:00"), 0,
      s"0x$pfx${"ab" * 16}$who", v, finalized = true)
    val rows = Seq(
      t(100L, acctVal(1, 50)), // superseded by the block-200 touch
      t(200L, acctVal(2, 70))).toDS().toDF()
    val dim = graft.decode.TraceDecode.keyedPrefixDim(spark, Seq(
      ("System", "Account", "blake2_128concat", 32)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_serve_dump").toString
    graft.etl.Dump.dumpTracesDay(rows, dim, "2024-03-01", dir)
    val out = Serve.accountBalances(
        spark.read.parquet(s"$dir/balances"), who,
        ordCol = "block_number").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("as_of_ord") == 200L)
    assert(out.head.getAs[Long]("nonce") == 2L)
    assert(out.head.getAs[Double]("free") == 70.0 / 1e10)
  }

  test("assetLookup: currency id, asset JSON, and precompile hop") {
    val key = "[{\"network\":\"polkadot\"},\"here\"]"
    val assets = Seq(
      (2004, "{\"Token\":\"xcDOT\"}", "42259045809535163221576417993425387648",
        "xcDOT", 10, key),
      (2004, "{\"Token\":\"GLMR\"}", null: String, "GLMR", 18,
        null: String),
      // same currency id on ANOTHER chain — the para filter must drop it
      (2000, "{\"Token\":\"DOT2\"}", "42259045809535163221576417993425387648",
        "DOT2", 10, key)
    ).toDF("para_id", "asset", "currency_id", "symbol", "decimals",
      "xcm_interior_key")
    val addr = "0x" + "f" * 8 + "0" * 32
    val xcm = Seq(
      (key, "DOT", 10, s"""{"2004":"$addr"}""")
    ).toDF("xcm_interior_key", "symbol", "decimals",
      "xc_contract_address")
    def one(q: String) =
      Serve.assetLookup(assets, xcm, 2004, q).collect()
    // by currency id — decorated with the registry symbol
    val byId = one("42259045809535163221576417993425387648")
    assert(byId.length == 1)
    assert(byId.head.getAs[String]("symbol") == "xcDOT")
    assert(byId.head.getAs[String]("xc_symbol") == "DOT")
    // by exact asset JSON — an asset with NO registry row keeps nulls
    val byAsset = one("{\"Token\":\"GLMR\"}")
    assert(byAsset.head.getAs[String]("symbol") == "GLMR")
    assert(byAsset.head.get(byAsset.head.fieldIndex("xc_symbol")) == null)
    // by precompile H160 — the xcContractAddress reverse hop
    val byAddr = one(addr)
    assert(byAddr.length == 1)
    assert(byAddr.head.getAs[String]("symbol") == "xcDOT")
    // a miss is an empty frame, not an error
    assert(one("{\"Token\":\"NOPE\"}").isEmpty)
  }
}
