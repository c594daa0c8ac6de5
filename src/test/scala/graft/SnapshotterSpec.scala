package graft

import graft.etl.Snapshotter
import graft.etl.Snapshotter.Placement
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-chain snapshot catalog (ref snapshot/snapshotter.js + the
  * per-chain subclasses): chain → extractor-set dispatch so one call
  * emits a chain's full rec union for a placement. The extractor
  * ARITHMETIC is pinned by AssetsSpec/StakingSpec/GovSpec and the
  * b5–b9 oracles; this spec pins the COMPOSITION — frame-gated
  * dispatch, the multi-chain write through one snapshots table, and
  * the (log_dt, chain_name, hr) partition isolation that makes
  * per-chain, per-hour publishes non-clobbering.
  */
class SnapshotterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def assetHubFrames: Snapshotter.Frames = Map(
    "assets.asset" -> Seq(
      ("1984", "USDT", BigDecimal("10000000000"), BigDecimal(10),
        BigDecimal(100), BigDecimal(10), BigDecimal(10), BigDecimal(0)))
      .toDF("currency_id", "symbol", "supply", "deposit", "min_balance",
        "accounts", "sufficients", "approvals"),
    "assets.account" -> Seq(
      ("1984", "USDT", 6, "0x" + "22" * 32, BigDecimal(7000000)))
      .toDF("currency_id", "symbol", "decimals", "address_pubkey",
        "balance_raw"))

  private def bifrostFrames: Snapshotter.Frames = Map(
    "tokens.totalIssuance" ->
      Seq(("\"BNC\"", BigDecimal("5000000000000")))
        .toDF("asset_key", "raw"),
    "registry.issuance" ->
      Seq(("\"BNC\"", "Bifrost", "BNC", 12))
        .toDF("asset_key", "name", "symbol", "decimals"),
    "vtokenMinting.tokenPool" ->
      Seq(("{\"Token\":\"DOT\"}", BigDecimal("990000000000")))
        .toDF("token_key", "raw"),
    "registry.tokens" ->
      Seq(("{\"Token\":\"DOT\"}", "DOT", "Polkadot", 10))
        .toDF("token_key", "symbol", "name", "decimals"))

  test("unknown chain fails loudly; absent frames skip their extractor") {
    intercept[IllegalArgumentException] {
      Snapshotter.handleSnapshot("NoSuchChain", Map.empty,
        Placement("NoSuchChain", "polkaholic", 1L, "0x1", 0L))
    }
    // HydraDx with ONLY the xyk frame: one extractor fires, the
    // tokens/omnipool/uniques walks (absent pallet frames) skip —
    // the reference's `if (res)` guard as input gating
    val onlyXyk = Map("xyk.pools" -> Seq(
      ("0x" + "ab" * 32, 7L, 0, 5, BigDecimal(1), BigDecimal(1),
        BigDecimal(1)))
      .toDF("pool_pubkey", "share_token", "asset_a", "asset_b",
        "total_liquidity", "free_a", "free_b"))
    val recs = Snapshotter.handleSnapshot("HydraDx", onlyXyk,
      Placement("HydraDx", "polkaholic", 44L, "0xh", 1700004000L, 63))
    assert(recs.length == 1)
    assert(recs.head.select("section", "storage").collect().head
      .toSeq == Seq("pools", "xyk"))
    // the registry dim is an UPGRADE, not a gate: issuance state
    // without "registry.issuance" still publishes bare-key recs
    val noReg = Map("tokens.totalIssuance" ->
      Seq(("\"GLMR\"", BigDecimal(123))).toDF("asset_key", "raw"))
    val moon = Snapshotter.handleSnapshot("Moonbeam", noReg,
      Placement("Moonbeam", "polkaholic", 9L, "0xm", 1700004000L))
    assert(moon.length == 1)
    val mrow = moon.head.collect().head
    assert(mrow.getAs[String]("track_val") == "\"GLMR\"" &&
      mrow.getAs[String]("pv").contains("\"raw\":123"))
    // a bundle matching NO extractor refuses to dump an empty day
    intercept[IllegalArgumentException] {
      Snapshotter.dumpChainSnapshot("HydraDx", Map.empty,
        Placement("HydraDx", "polkaholic", 44L, "0xh", 1700004000L),
        "2024-03-01", java.nio.file.Files
          .createTempDirectory("graft_snapcat0").toString)
    }
  }

  test("two chains' catalogs through ONE snapshots table: composed " +
      "union, per-chain partition isolation, hourly non-clobbering") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapcat").toString
    // AssetHub at 06:xx UTC, Bifrost at the same day
    val ah = Placement("Polkadot_AssetHub", "polkaholic", 7000000L,
      "0xahb", 1709272800L, ss58Prefix = 0)
    val bf = Placement("Bifrost", "polkaholic", 5300000L, "0xbfb",
      1709272800L, ss58Prefix = 6)
    val d1 = Snapshotter.dumpChainSnapshot("Polkadot_AssetHub",
      assetHubFrames, ah, "2024-03-01", dir)
    // asset.asset + asset.account (1 holder, small asset keeps it)
    assert(d1.count() == 2)
    val d2 = Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames,
      bf, "2024-03-01", dir)
    // Bifrost's publish lands beside AssetHub's, not over it:
    // balances.totalIssuance skipped (frame absent), tokens issuance +
    // tokenPool emitted
    assert(d2.count() == 4, d2.collect().mkString("\n"))
    assert(d2.filter(col("chain_name") === "Polkadot_AssetHub")
      .count() == 2)
    val sections = d2.filter(col("chain_name") === "Bifrost")
      .select("section", "storage").as[(String, String)]
      .collect().toSet
    assert(sections == Set(("tokens", "totalIssuance"),
      ("vtokenMinting", "tokenPool")))
    // re-publishing ONE chain-day replaces exactly its own rows
    val d3 = Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames,
      bf, "2024-03-01", dir)
    assert(d3.count() == 4, "re-run appended instead of replacing")
    // an HOURLY re-publish of the same chain-day at a LATER hour lands
    // beside the earlier hour (the round-12 review finding: an
    // hour-cadence publisher must not erase the day's earlier hours)
    val bfLater = bf.copy(blockNumber = 5301000L, tsSec = 1709283600L)
    val d4 = Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames,
      bfLater, "2024-03-01", dir)
    assert(d4.filter(col("chain_name") === "Bifrost").count() == 4,
      "the 09:00 publish erased the 06:00 rows")
    assert(d4.filter(col("chain_name") === "Bifrost")
      .select("block_number").distinct().count() == 2)
    // …and re-running THAT hour replaces only itself
    val d5 = Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames,
      bfLater, "2024-03-01", dir)
    assert(d5.count() == 6 &&
      d5.filter(col("chain_name") === "Bifrost").count() == 4)
  }

  test("snapshots layout: a (chain, hour) serve query prunes " +
      "partitions at the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapprune").toString
    val bf = Placement("Bifrost", "polkaholic", 5300000L, "0xbfb",
      1709272800L, ss58Prefix = 6)
    Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames, bf,
      "2024-03-01", dir)
    Snapshotter.dumpChainSnapshot("Bifrost", bifrostFrames,
      bf.copy(tsSec = 1709283600L), "2024-03-01", dir)
    val read = spark.read.parquet(s"$dir/snapshots")
      .filter(col("chain_name") === "Bifrost" && col("hr") === 9 &&
        col("log_dt") === "2024-03-01")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("hr") && !plan.replaceAll("\\s", "")
        .contains("PartitionFilters:[]"),
      s"the (log_dt, chain_name, hr) predicate must prune at the " +
        s"scan, not filter rows:\n$plan")
    assert(read.count() == 2) // one hour's recs only
  }

  test("external balances-feed transform: ss58/pubkey normalize, " +
      "bad-address drop, csv round trip (ref substrateetl.js:544)") {
    import graft.functions.Codec
    val pk = "0x" + "cd" * 32
    val ss = Codec.ss58Encode(Codec.hexToBytes(pk), 0)
    val feed = Seq(
      (ss, "10", "0", "1", "11"),          // ss58-form AccountId
      (pk, "5", "2", "0", "7"),            // pubkey-form AccountId
      ("not-an-address", "9", "9", "9", "9")) // drops
      .toDF("AccountId", "Free", "Locked", "Reserved", "Total")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snaptransform").toString + "/out"
    val out = graft.etl.Snapshot.transformBalancesFeed(feed, dir)
    assert(out.count() == 2, "undecodable address must drop")
    assert(out.select("address_pubkey").distinct().count() == 1,
      "ss58 and pubkey forms of ONE account normalize to one pubkey")
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2 && back.columns.toSeq == Seq(
      "address_ss58", "address_pubkey", "free", "locked", "reserved",
      "total"))
    assert(back.filter(col("address_ss58") === ss).count() == 2)
  }

  test("relay + dappStaking catalogs dispatch the gov/staking " +
      "extractor families") {
    // Astar with just the two singleton frames: exactly those recs
    val frames = Map(
      "dappStaking.activeProtocolState" ->
        Seq((742L, 5872888L, 8L, "BuildAndEarn", 763L, false))
          .toDF("era", "next_era_start", "period_number", "subperiod",
            "next_subperiod_start_era", "maintenance"),
      "dappStaking.currentEraInfo" ->
        Seq((1000.5, 2.25, 300.0, 700.5, 310.0, 690.5))
          .toDF("total_locked", "unlocking", "current_voting",
            "current_build_and_earn", "next_voting",
            "next_build_and_earn"))
    val recs = Snapshotter.handleSnapshot("Astar", frames,
      Placement("Astar", "polkaholic", 5700000L, "0xa57", 1700005000L,
        ss58Prefix = 5, era = 742L))
    assert(recs.length == 2)
    val got = recs.map(_.select("section", "storage").collect().head)
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("dappStaking", "activeProtocolState"),
      ("dappStaking", "currentEraInfo")))
    // Shibuya runs the same family as a subset — same frames dispatch
    assert(Snapshotter.handleSnapshot("Shibuya", frames,
      Placement("Shibuya", "polkaholic", 1L, "0xs", 1700005000L,
        ss58Prefix = 5, era = 1L)).length == 2)
    // the relay catalog wires the gov extractors: referenda frame only
    val refFrames = Map("referenda.referendumInfoFor" ->
      Seq((42L, "Ongoing", "0x" + "11" * 32, 10L, 20L, 100L, 200L, 5L))
        .toDF("ref_id", "status", "submission_depositor",
          "submission_deposit", "decision_deposit", "tally_ayes",
          "tally_nays", "tally_support"))
    val rel = Snapshotter.handleSnapshot("Polkadot", refFrames,
      Placement("Polkadot", "polkaholic", 20000000L, "0xp20",
        1709272800L, ss58Prefix = 0, era = 1400L))
    assert(rel.length == 1)
    assert(rel.head.select("section").collect().head.getString(0)
      == "referenda")
  }
}
