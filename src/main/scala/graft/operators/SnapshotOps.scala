package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B8/B9 — the AssetHub snapshot recs THROUGH THE CATALOG AND WRITER
  * (ref snapshot/polkadot_assethub.js: the `asset.asset` registry rec
  * per tracked currency and the `asset.account` holder walk with the
  * named/small/share keep gates and the small-holder rollup), dispatched
  * via [[graft.etl.Snapshotter]]'s Polkadot_AssetHub catalog and landed
  * through [[graft.etl.Snapshot.dumpSnapshots]]'s
  * (log_dt, chain_name, hr) partition layout.
  *
  * Both queries derive a synthetic asset book from `events`: each user
  * holds one of two stablecoins (even user_id → 1984/USDT, odd →
  * 1337/USDC); every 7th user is a whale (share ≫ 0.25% — kept), the
  * rest are minnows (kept only on the small asset); one hand-planted
  * sovereign account ("para:2000") exercises the module-name gate. The
  * registry's holder counts pin USDT above the 5000-holder small-asset
  * bound and USDC below it, so USDT minnows roll up while USDC's
  * publish whole — all four reference gates live in one fixture.
  *
  * The DuckDB twins replay the gates relationally. b8 compares the
  * kv/pv JSON character-exact (all-string values — the reference's
  * toNumWithoutComma strings); b9 extracts the fields, keeping
  * balance_raw as the exact integer TEXT from pv (never a decimal at
  * the query surface — the j13/a8/v3 driver-gate rule; the rollup's
  * float `balance` rendering is engine-specific and pinned by
  * AssetsSpec instead).
  */
object SnapshotOps {

  private def pk(e: Column): Column = synthPk(e.cast("string"))

  private val Para2000 = "0x70617261d007" + "00" * 26

  private def holdingsOf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.events(s, d).filter(col("event_id") < 800)
      .withColumn("cur",
        when(col("user_id") % 2 === 0, "1984").otherwise("1337"))
      .groupBy(col("cur").as("currency_id"), col("user_id"))
      .agg(sum(col("event_id")).as("esum"))
      .select(col("currency_id"),
        when(col("currency_id") === "1984", "USDT").otherwise("USDC")
          .as("symbol"),
        lit(6).as("decimals"),
        pk(col("user_id")).as("address_pubkey"),
        when(col("user_id") % 7 === 0, (col("esum") + 1) * 100000)
          .otherwise(col("user_id") % 97 + 1)
          .cast("decimal(38,0)").as("balance_raw"))
    base.unionByName(
      Seq(("1984", "USDT", 6, Para2000, "3"))
        .toDF("currency_id", "symbol", "decimals", "address_pubkey",
          "balance_raw")
        .withColumn("balance_raw",
          col("balance_raw").cast("decimal(38,0)")))
  }

  private def assetStateOf(holdings: DataFrame): DataFrame =
    holdings.groupBy(col("currency_id"), col("symbol"))
      .agg(sum(col("balance_raw")).cast("decimal(38,0)").as("supply"),
        count(lit(1)).as("deposit"),
        min(col("balance_raw")).as("min_balance"),
        max(col("balance_raw")).as("sufficients"))
      .withColumn("accounts",
        when(col("currency_id") === "1984", 6000L).otherwise(10L))
      .withColumn("approvals", lit(0L))

  /** One catalog dispatch + write per query run: b8 and b9 each dump
    * the same composed day into their OWN fresh temp dir (queryDumpDir
    * is per-call) and read their slice back — two independent
    * compose→write→read chains over identical data. (Writer replace
    * idempotence is exercised by SnapshotterSpec, not here.) */
  private def dumped(s: SparkSession, d: String): DataFrame = {
    val h = holdingsOf(s, d)
    graft.etl.Snapshotter.dumpChainSnapshot("Polkadot_AssetHub",
      Map("assets.asset" -> assetStateOf(h), "assets.account" -> h),
      graft.etl.Snapshotter.Placement("Polkadot_AssetHub",
        "polkaholic", 7000000L, "0xahb", 1709272800L, ss58Prefix = 0),
      "2024-03-01", queryDumpDir("graft_assethub_dump"))
  }

  private def b8(s: SparkSession, d: String): DataFrame =
    dumped(s, d).filter(col("storage") === "asset")
      .select(col("section"), col("storage"), col("track"),
        col("track_val"), col("kv"), col("pv"), col("block_number"),
        us(col("ts")).as("ts_us"), col("source"))
      .orderBy(col("track_val"))

  private val b8Sql =
    """WITH h0 AS (
      | SELECT CASE WHEN user_id % 2 = 0 THEN '1984' ELSE '1337' END
      |   AS cur, user_id, sum(event_id) AS esum
      | FROM events WHERE event_id < 800 GROUP BY 1, 2),
      |h AS (
      | SELECT cur,
      |  CAST(CASE WHEN user_id % 7 = 0 THEN (esum + 1) * 100000
      |   ELSE user_id % 97 + 1 END AS DECIMAL(38,0)) AS raw
      | FROM h0
      | UNION ALL SELECT '1984', CAST(3 AS DECIMAL(38,0))),
      |t AS (
      | SELECT cur, CASE WHEN cur = '1984' THEN 'USDT' ELSE 'USDC' END
      |   AS symbol,
      |  CAST(sum(raw) AS DECIMAL(38,0)) AS supply,
      |  count(*) AS deposit, min(raw) AS min_raw, max(raw) AS max_raw
      | FROM h GROUP BY 1, 2)
      |SELECT 'asset' AS section, 'asset' AS storage,
      | 'stablecoin' AS track, symbol AS track_val,
      | '{"currencyID":"' || cur || '","symbol":"' || symbol || '"}'
      |  AS kv,
      | '{"supply":"' || CAST(supply AS VARCHAR)
      |  || '","deposit":"' || CAST(deposit AS VARCHAR)
      |  || '","minBalance":"' || CAST(min_raw AS VARCHAR)
      |  || '","accounts":"'
      |  || CASE WHEN cur = '1984' THEN '6000' ELSE '10' END
      |  || '","sufficients":"' || CAST(max_raw AS VARCHAR)
      |  || '","approvals":"0"}' AS pv,
      | CAST(7000000 AS BIGINT) AS block_number,
      | CAST(1709272800 AS BIGINT) * 1000000 AS ts_us,
      | 'polkaholic' AS source
      |FROM t ORDER BY track_val""".stripMargin

  private def b9(s: SparkSession, d: String): DataFrame =
    dumped(s, d).filter(col("storage") === "account")
      .select(col("track_val"),
        get_json_object(col("kv"), "$.name").as("name"),
        col("address_pubkey"),
        // STRING surface, not decimal: pv already carries the exact
        // integer text, and Spark/DuckDB DECIMAL hash differently at
        // the driver gate even when numerically equal (the j13/a8/v3
        // rule, operators/package.scala dsumOut). A double would lose
        // whale balances past 2^53 at larger sf; the raw text is exact
        // at any magnitude.
        get_json_object(col("pv"), "$.balance_raw").as("balance_raw"),
        get_json_object(col("pv"), "$.holders").cast("bigint")
          .as("holders"),
        col("block_number"), us(col("ts")).as("ts_us"))
      .orderBy(col("track_val"), col("name").asc_nulls_first,
        col("address_pubkey").asc_nulls_first)

  private val b9Sql =
    s"""WITH h0 AS (
       | SELECT CASE WHEN user_id % 2 = 0 THEN '1984' ELSE '1337' END
       |   AS cur, user_id, sum(event_id) AS esum
       | FROM events WHERE event_id < 800 GROUP BY 1, 2),
       |h AS (
       | SELECT cur,
       |  '0x' || md5(CAST(user_id AS VARCHAR))
       |   || md5(CAST(user_id AS VARCHAR) || 'x') AS pk,
       |  CAST(CASE WHEN user_id % 7 = 0 THEN (esum + 1) * 100000
       |   ELSE user_id % 97 + 1 END AS DECIMAL(38,0)) AS raw,
       |  CAST(NULL AS VARCHAR) AS nm
       | FROM h0
       | UNION ALL
       | SELECT '1984', '$Para2000', CAST(3 AS DECIMAL(38,0)),
       |  'para:2000'),
       |t AS (
       | SELECT cur, CAST(sum(raw) AS DOUBLE) AS supply,
       |  CASE WHEN cur = '1984' THEN 6000 ELSE 10 END AS holder_cnt
       | FROM h GROUP BY 1),
       |k AS (
       | SELECT h.*,
       |  CASE WHEN h.cur = '1984' THEN 'USDT' ELSE 'USDC' END
       |   AS symbol,
       |  (nm IS NOT NULL OR holder_cnt <= 5000
       |   OR CAST(raw AS DOUBLE) > supply * 0.0025) AS keep
       | FROM h JOIN t ON h.cur = t.cur)
       |SELECT * FROM (
       | SELECT symbol AS track_val, nm AS name, pk AS address_pubkey,
       |  CAST(raw AS VARCHAR) AS balance_raw,
       |  CAST(NULL AS BIGINT) AS holders
       | FROM k WHERE keep
       | UNION ALL
       | SELECT symbol, 'holders', NULL,
       |  CAST(CAST(sum(raw) AS DECIMAL(38,0)) AS VARCHAR), count(*)
       | FROM k WHERE NOT keep GROUP BY symbol)
       |CROSS JOIN (SELECT CAST(7000000 AS BIGINT) AS block_number,
       | CAST(1709272800 AS BIGINT) * 1000000 AS ts_us)
       |ORDER BY track_val, name NULLS FIRST,
       | address_pubkey NULLS FIRST""".stripMargin

  // B10 — TWO chains' catalogs composed into ONE snapshots table
  // (the snapshotter dispatch itself, ref snapshot/snapshotter.js +
  // substrateetl.js picking the subclass per chain): AssetHub's day at
  // 06:00 and a synthetic Bifrost walk at 09:00 land through separate
  // dumpChainSnapshot calls into the same outRoot, and the query
  // aggregates the READ-BACK layout per (chain, section, storage, hr)
  // — so chain isolation, the hour-partition derivation, extractor
  // counts, and the registry-upgrade track_vals all compare
  // cross-engine.
  private def bifrostFramesOf(s: SparkSession, d: String)
      : Map[String, DataFrame] = {
    val t = (col("user_id") % 5).cast("int")
    val iss = Tables.events(s, d).filter(col("event_id") < 500)
      .groupBy(t.as("t"))
      .agg(sum(col("event_id")).cast("decimal(38,0)").as("raw"))
    val issuance = iss.select(
      concat(lit("\"T"), col("t"), lit("\"")).as("asset_key"),
      col("raw"))
    // registry knows the EVEN tokens only — odd keys publish bare
    val reg = iss.filter(col("t") % 2 === 0).select(
      concat(lit("\"T"), col("t"), lit("\"")).as("asset_key"),
      concat(lit("Token "), col("t")).as("name"),
      concat(lit("T"), col("t")).as("symbol"),
      lit(6).as("decimals"))
    // the tokenPool walk: keys for t < 3, registry for t < 2 — the
    // inner gate drops t=2 (the reference's `continue`)
    val pool = iss.filter(col("t") < 3).select(
      concat(lit("{\"Token\":\"T"), col("t"), lit("\"}"))
        .as("token_key"),
      (col("raw") + 7).as("raw"))
    val poolReg = iss.filter(col("t") < 2).select(
      concat(lit("{\"Token\":\"T"), col("t"), lit("\"}"))
        .as("token_key"),
      concat(lit("T"), col("t")).as("symbol"),
      concat(lit("Token "), col("t")).as("name"),
      lit(10).as("decimals"))
    Map("tokens.totalIssuance" -> issuance,
      "registry.issuance" -> reg,
      "vtokenMinting.tokenPool" -> pool,
      "registry.tokens" -> poolReg)
  }

  private def b10(s: SparkSession, d: String): DataFrame = {
    import graft.etl.Snapshotter
    val dir = queryDumpDir("graft_snapcat_dump")
    val h = holdingsOf(s, d)
    Snapshotter.dumpChainSnapshot("Polkadot_AssetHub",
      Map("assets.asset" -> assetStateOf(h), "assets.account" -> h),
      Snapshotter.Placement("Polkadot_AssetHub", "polkaholic",
        7000000L, "0xahb", 1709272800L, ss58Prefix = 0),
      "2024-03-01", dir)
    Snapshotter.dumpChainSnapshot("Bifrost", bifrostFramesOf(s, d),
      Snapshotter.Placement("Bifrost", "polkaholic", 5300000L,
        "0xbfb", 1709283600L, ss58Prefix = 6),
      "2024-03-01", dir)
      .groupBy(col("chain_name"), col("section"), col("storage"),
        col("hr"))
      .agg(count(lit(1)).as("n"),
        count_distinct(coalesce(col("track_val"), lit("")))
          .as("n_tracks"),
        count(col("address_pubkey")).as("n_addr"),
        sum(col("block_number")).as("bn_sum"))
      .orderBy(col("chain_name"), col("section"), col("storage"))
  }

  private val b10Sql =
    """WITH h0 AS (
      | SELECT CASE WHEN user_id % 2 = 0 THEN '1984' ELSE '1337' END
      |   AS cur, user_id, sum(event_id) AS esum
      | FROM events WHERE event_id < 800 GROUP BY 1, 2),
      |h AS (
      | SELECT cur,
      |  CAST(CASE WHEN user_id % 7 = 0 THEN (esum + 1) * 100000
      |   ELSE user_id % 97 + 1 END AS DECIMAL(38,0)) AS raw,
      |  CAST(NULL AS VARCHAR) AS nm
      | FROM h0
      | UNION ALL SELECT '1984', CAST(3 AS DECIMAL(38,0)), 'para:2000'),
      |t AS (
      | SELECT cur, CAST(sum(raw) AS DOUBLE) AS supply,
      |  CASE WHEN cur = '1984' THEN 6000 ELSE 10 END AS holder_cnt
      | FROM h GROUP BY 1),
      |k AS (
      | SELECT h.*,
      |  (nm IS NOT NULL OR holder_cnt <= 5000
      |   OR CAST(raw AS DOUBLE) > supply * 0.0025) AS keep
      | FROM h JOIN t ON h.cur = t.cur),
      |acct AS (
      | SELECT count(*) FILTER (WHERE keep)
      |   + count(DISTINCT CASE WHEN NOT keep THEN cur END) AS n,
      |  count(DISTINCT cur) AS n_tracks,
      |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_addr
      | FROM k),
      |bt AS (
      | SELECT CAST(user_id % 5 AS INT) AS t FROM events
      | WHERE event_id < 500 GROUP BY 1)
      |SELECT * FROM (
      | SELECT 'Bifrost' AS chain_name, 'tokens' AS section,
      |  'totalIssuance' AS storage, 9 AS hr,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) AS BIGINT) AS n_tracks,
      |  CAST(0 AS BIGINT) AS n_addr,
      |  CAST(count(*) * 5300000 AS BIGINT) AS bn_sum
      | FROM bt
      | UNION ALL
      | SELECT 'Bifrost', 'vtokenMinting', 'tokenPool', 9,
      |  CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT),
      |  CAST(0 AS BIGINT),
      |  CAST(count(*) * 5300000 AS BIGINT)
      | FROM bt WHERE t < 2
      | UNION ALL
      | SELECT 'Polkadot_AssetHub', 'asset', 'account', 6,
      |  CAST(n AS BIGINT), CAST(n_tracks AS BIGINT), n_addr,
      |  CAST(n * 7000000 AS BIGINT)
      | FROM acct
      | UNION ALL
      | SELECT 'Polkadot_AssetHub', 'asset', 'asset', 6,
      |  CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT),
      |  CAST(0 AS BIGINT),
      |  CAST(count(*) * 7000000 AS BIGINT)
      | FROM t)
      |ORDER BY chain_name, section, storage""".stripMargin

  // B11 — the HydraDX balance/liquidity walks THROUGH THE CATALOG
  // (ref snapshot/hydradx.js:136-246: the treasury and omnipool
  // tokens.accounts walks, omnipool.assets, omnipool.positions):
  // every pv here is integer-strings + symbols, so the JSON compares
  // character-exact cross-engine; kv compares on its DERIVABLE fields
  // (asset_id/id/ticker — the `account` ss58 rendering is the
  // engine's own codec, pinned by AssetsSpec's real-key round trip).
  private def hydraFramesOf(s: SparkSession, d: String)
      : Map[String, DataFrame] = {
    val ev = Tables.events(s, d).filter(col("event_id") < 600)
    val perAsset = ev.groupBy((col("user_id") % 9).cast("int").as("a"))
      .agg(sum(col("event_id")).as("esum"),
        count(lit(1)).as("n"))
    val reg = perAsset.filter(col("a") % 2 === 0)
      .select(col("a").as("asset_id"),
        concat(lit("H"), col("a")).as("symbol"))
    def accounts(pubkey: String, shift: Int) = perAsset.select(
      col("a").as("asset_id"),
      lit(pubkey).as("address_pubkey"),
      (col("esum") + shift).cast("decimal(38,0)").as("free"),
      (col("a") % 3).cast("decimal(38,0)").as("reserved"),
      lit(0).cast("decimal(38,0)").as("frozen"))
    val omniAssets = perAsset.select(
      col("a").as("asset_id"),
      (col("esum") * 3).cast("decimal(38,0)").as("hub_reserve"),
      col("n").cast("decimal(38,0)").as("shares"),
      (col("n") % 5).cast("decimal(38,0)").as("protocol_shares"),
      lit(500000).cast("decimal(38,0)").as("cap"),
      concat(lit("tradable:"), col("a")).as("tradable"))
    val positions = perAsset.select(
      (col("a") + 100).cast("long").as("position_id"),
      col("a").as("asset_id"),
      col("esum").cast("decimal(38,0)").as("amount"),
      (col("esum") % 977).cast("decimal(38,0)").as("shares"),
      (col("esum") * 2).cast("decimal(38,0)").as("price_1"),
      lit(1000000).cast("decimal(38,0)").as("price_2"))
    // xyk pools: one per user_id%4 group — pv (totalLiquidity + the
    // two reserve positions) is integer-strings, oracle-derivable;
    // the kv account/ss58 rendering is pinned by AssetsSpec
    val xyk = ev.groupBy((col("user_id") % 4).cast("int").as("g"))
      .agg(sum(col("event_id")).as("esum"))
      .select(concat(lit("0x"), lpad(col("g").cast("string"), 64, "9"))
          .as("pool_pubkey"),
        (col("g") + 1000000).cast("long").as("share_token"),
        lit(0).as("asset_a"), (col("g") + 1).cast("int").as("asset_b"),
        col("esum").cast("decimal(38,0)").as("total_liquidity"),
        (col("esum") % 1009).cast("decimal(38,0)").as("free_a"),
        (col("esum") % 997).cast("decimal(38,0)").as("free_b"))
    Map("registry.assets" -> reg,
      "tokens.accounts.treasury" -> accounts("0x" + "77" * 32, 0),
      "tokens.accounts.omnipool" -> accounts("0x" + "88" * 32, 1),
      "omnipool.assets" -> omniAssets,
      "omnipool.positions" -> positions,
      "xyk.pools" -> xyk)
  }

  private def b11(s: SparkSession, d: String): DataFrame = {
    import graft.etl.Snapshotter
    Snapshotter.dumpChainSnapshot("HydraDx", hydraFramesOf(s, d),
      Snapshotter.Placement("HydraDx", "polkaholic", 4400000L,
        "0xh44", 1709272800L, ss58Prefix = 63),
      "2024-03-01", queryDumpDir("graft_hydradx_dump"))
      .select(col("section"), col("storage"), col("track"),
        col("track_val"),
        coalesce(get_json_object(col("kv"), "$.asset_id"),
          get_json_object(col("kv"), "$.id")).as("kv_id"),
        get_json_object(col("kv"), "$.ticker").as("ticker"),
        col("pv"), col("block_number"), us(col("ts")).as("ts_us"))
      .orderBy(col("storage"), col("track_val").asc_nulls_first,
        col("kv_id").asc_nulls_first, col("pv"))
  }

  private val b11Sql =
    """WITH pa AS (
      | SELECT CAST(user_id % 9 AS INT) AS a, sum(event_id) AS esum,
      |  count(*) AS n
      | FROM events WHERE event_id < 600 GROUP BY 1),
      |px AS (SELECT pa.*,
      | CASE WHEN a % 2 = 0 THEN 'H' || CAST(a AS VARCHAR) END
      |  AS ticker FROM pa),
      |acct AS (
      | SELECT 'tokens' AS section, 'accounts' AS storage,
      |  'balance' AS track, w.track_val,
      |  CAST(a AS VARCHAR) AS kv_id, ticker,
      |  '{"free":"' || CAST(esum + w.shift AS VARCHAR)
      |   || '","reserved":"' || CAST(a % 3 AS VARCHAR)
      |   || '","frozen":"0"}' AS pv
      | FROM px CROSS JOIN (VALUES ('treasury', 0), ('omnipool', 1))
      |  AS w(track_val, shift)),
      |oa AS (
      | SELECT 'omnipool', 'assets', 'omniasset', CAST(a AS VARCHAR),
      |  CAST(a AS VARCHAR), ticker,
      |  '{"hubReserve":"' || CAST(esum * 3 AS VARCHAR)
      |   || '","shares":"' || CAST(n AS VARCHAR)
      |   || '","protocolShares":"' || CAST(n % 5 AS VARCHAR)
      |   || '","cap":"500000","tradable":"tradable:'
      |   || CAST(a AS VARCHAR) || '"}'
      | FROM px),
      |op AS (
      | SELECT 'omnipool', 'positions', 'liquidity', CAST(a AS VARCHAR),
      |  CAST(a + 100 AS VARCHAR), ticker,
      |  '{"assetId":' || CAST(a AS VARCHAR)
      |   || ',"amount":"' || CAST(esum AS VARCHAR)
      |   || '","shares":"' || CAST(esum % 977 AS VARCHAR)
      |   || '","price_1":"' || CAST(esum * 2 AS VARCHAR)
      |   || '","price_2":"1000000"}'
      | FROM px),
      |xy AS (
      | SELECT 'pools', 'xyk', 'xykpool', CAST(NULL AS VARCHAR),
      |  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |  '{"totalLiquidity":"' || CAST(esum AS VARCHAR)
      |   || '","positions":[{"assetId":"0","free":"'
      |   || CAST(esum % 1009 AS VARCHAR)
      |   || '"},{"assetId":"' || CAST(g + 1 AS VARCHAR)
      |   || '","free":"' || CAST(esum % 997 AS VARCHAR) || '"}]}'
      | FROM (SELECT CAST(user_id % 4 AS INT) AS g,
      |   sum(event_id) AS esum FROM events
      |   WHERE event_id < 600 GROUP BY 1))
      |SELECT section, storage, track, track_val, kv_id, ticker, pv,
      | CAST(4400000 AS BIGINT) AS block_number,
      | CAST(1709272800 AS BIGINT) * 1000000 AS ts_us
      |FROM (SELECT * FROM acct UNION ALL SELECT * FROM oa
      | UNION ALL SELECT * FROM op UNION ALL SELECT * FROM xy)
      |ORDER BY storage, track_val NULLS FIRST, kv_id NULLS FIRST,
      | pv""".stripMargin

  // B12 — the Astar dappStaking family THROUGH THE CATALOG (ref
  // snapshot/astar.js:108-296): the activeProtocolState singleton,
  // the per-staker stakerInfo walk, and the integratedDApps registry —
  // the three family members whose pv is integers/strings/bools end
  // to end, so the JSON documents compare CHARACTER-EXACT in DuckDB
  // (the double-valued members — eraInfo, tiers, eraRewards,
  // contractStake — are pinned by StakingSpec's exact-string rows).
  private def astarFramesOf(s: SparkSession, d: String)
      : Map[String, DataFrame] = {
    val ev = Tables.events(s, d)
    val aps = ev.agg((max(col("event_id")) % 997).as("era"))
      .select(col("era"), (col("era") * 8000).as("next_era_start"),
        (col("era") % 16).as("period_number"),
        when(col("era") % 2 === 0, "BuildAndEarn").otherwise("Voting")
          .as("subperiod"),
        (col("era") + 21).as("next_subperiod_start_era"),
        (col("era") % 5 === 0).as("maintenance"))
    val stakers = ev.filter(col("event_id") < 300)
      .groupBy(col("user_id"))
      .agg(sum(col("event_id")).as("esum"))
      .select(pk(col("user_id")).as("staker"),
        when(col("user_id") % 2 === 0, "Evm").otherwise("Wasm")
          .as("dapp_type"),
        concat(lit("0xd"), col("user_id")).as("dapp_address"),
        col("esum").cast("decimal(38,0)").as("staked_voting"),
        (col("user_id") % 13).cast("decimal(38,0)")
          .as("staked_build_and_earn"),
        (col("user_id") % 50 + 1).as("era"),
        (col("user_id") % 7).as("period"),
        (col("user_id") % 3 === 0).as("loyal_staker"))
    val dapps = ev.filter(col("event_id") < 300)
      .select((col("user_id") % 20).cast("int").as("g")).distinct()
      .select(concat(lit("o"), col("g")).as("owner"),
        col("g").cast("long").as("dapp_id"),
        when(col("g") % 4 === 0, "Unregistered").otherwise("Registered")
          .as("state"),
        concat(lit("0xd"), col("g")).as("evm_address"))
    Map("dappStaking.activeProtocolState" -> aps,
      "dappStaking.stakerInfo" -> stakers,
      "dappStaking.integratedDApps" -> dapps)
  }

  private def b12(s: SparkSession, d: String): DataFrame = {
    import graft.etl.Snapshotter
    Snapshotter.dumpChainSnapshot("Astar", astarFramesOf(s, d),
      Snapshotter.Placement("Astar", "polkaholic", 5700000L, "0xa57",
        1709272800L, ss58Prefix = 5, era = 742L),
      "2024-03-01", queryDumpDir("graft_astar_dump"))
      .select(col("section"), col("storage"), col("track"),
        col("track_val"), col("address_pubkey"), col("pv"),
        col("block_number"), us(col("ts")).as("ts_us"))
      .orderBy(col("storage"), col("address_pubkey").asc_nulls_first,
        col("pv"))
  }

  private val b12Sql =
    """WITH aps AS (
      | SELECT CAST(max(event_id) % 997 AS BIGINT) AS era FROM events),
      |st AS (
      | SELECT user_id, sum(event_id) AS esum FROM events
      | WHERE event_id < 300 GROUP BY 1),
      |dg AS (
      | SELECT CAST(user_id % 20 AS INT) AS g FROM events
      | WHERE event_id < 300 GROUP BY 1)
      |SELECT * FROM (
      | SELECT 'dappStaking' AS section,
      |  'activeProtocolState' AS storage, 'era' AS track,
      |  '742' AS track_val, CAST(NULL AS VARCHAR) AS address_pubkey,
      |  '{"era":' || CAST(era AS VARCHAR)
      |   || ',"nextEraStart":' || CAST(era * 8000 AS VARCHAR)
      |   || ',"periodInfo":{"number":' || CAST(era % 16 AS VARCHAR)
      |   || ',"subperiod":"'
      |   || CASE WHEN era % 2 = 0 THEN 'BuildAndEarn'
      |      ELSE 'Voting' END
      |   || '","nextSubperiodStartEra":' || CAST(era + 21 AS VARCHAR)
      |   || '},"maintenance":'
      |   || CASE WHEN era % 5 = 0 THEN 'true' ELSE 'false' END
      |   || '}' AS pv
      | FROM aps
      | UNION ALL
      | SELECT 'dappStaking', 'integratedDApps', 'era', '742', NULL,
      |  '{"owner":"o' || CAST(g AS VARCHAR)
      |   || '","id":' || CAST(g AS VARCHAR)
      |   || ',"state":"'
      |   || CASE WHEN g % 4 = 0 THEN 'Unregistered'
      |      ELSE 'Registered' END
      |   || '","Evm":"0xd' || CAST(g AS VARCHAR) || '"}'
      | FROM dg
      | UNION ALL
      | SELECT 'dappStaking', 'stakerInfo', 'era', '742',
      |  '0x' || md5(CAST(user_id AS VARCHAR))
      |   || md5(CAST(user_id AS VARCHAR) || 'x'),
      |  '{"staked":{"voting":' || CAST(esum AS VARCHAR)
      |   || ',"buildAndEarn":' || CAST(user_id % 13 AS VARCHAR)
      |   || ',"era":' || CAST(user_id % 50 + 1 AS VARCHAR)
      |   || ',"period":' || CAST(user_id % 7 AS VARCHAR)
      |   || '},"loyalStaker":'
      |   || CASE WHEN user_id % 3 = 0 THEN 'true' ELSE 'false' END
      |   || ',"dAppType":"'
      |   || CASE WHEN user_id % 2 = 0 THEN 'Evm' ELSE 'Wasm' END
      |   || '","dAppAddress":"0xd' || CAST(user_id AS VARCHAR) || '"}'
      | FROM st)
      |CROSS JOIN (SELECT CAST(5700000 AS BIGINT) AS block_number,
      | CAST(1709272800 AS BIGINT) * 1000000 AS ts_us)
      |ORDER BY storage, address_pubkey NULLS FIRST, pv""".stripMargin

  // B13 — the DOUBLE-valued Astar dappStaking members through the
  // catalog (eraInfo, contractStake incl. the optional stakedFuture,
  // dAppTiers with the sorted dappsList lookup, eraRewards spans,
  // and the inflation pass-through; ref astar.js:130-368). Raw JSON
  // text with doubles is engine-specific, so the query EXTRACTS the
  // numeric fields back out of the dumped pv and compares them AS
  // DOUBLES: each field is one (integer aggregate) / (power-of-ten)
  // IEEE expression both engines evaluate bit-identically, and
  // get_json_object → cast(double) restores Jackson's shortest-round-
  // trip rendering exactly (the dmean/decOut playbook).
  private def astarScaledFramesOf(s: SparkSession, d: String)
      : Map[String, DataFrame] = {
    val ev = Tables.events(s, d)
    val ag = ev.agg(sum(col("event_id")).as("es"),
      count(lit(1)).as("n"))
    val eraInfo = ag.select(
      (col("es") / 10000.0).as("total_locked"),
      (col("n") / 100.0).as("unlocking"),
      ((col("es") % 1000003) / 100.0).as("current_voting"),
      ((col("es") % 999983) / 100.0).as("current_build_and_earn"),
      ((col("n") % 997) / 10.0).as("next_voting"),
      ((col("n") % 991) / 10.0).as("next_build_and_earn"))
    val contractStake = ev.filter(col("event_id") < 400)
      .groupBy((col("user_id") % 10).cast("int").as("g"))
      .agg(sum(col("event_id")).as("es"), count(lit(1)).as("n"))
      .select(col("g").cast("long").as("dapp_id"),
        (col("es") / 100.0).as("voting"),
        (col("n") / 10.0).as("build_and_earn"),
        lit(742L).as("era"), lit(8L).as("period"),
        when(col("g") % 2 === 0, col("es") / 50.0).as("future_voting"),
        when(col("g") % 2 === 0, col("n") / 5.0)
          .as("future_build_and_earn"),
        when(col("g") % 2 === 0, lit(743L)).as("future_era"),
        when(col("g") % 2 === 0, lit(8L)).as("future_period"))
    val tiers = ag.select(lit(742L).as("era"),
      array(col("es") / 1000.0, col("n") / 10.0).as("rewards"),
      typedLit(Map("0xa" -> 0, "0xb" -> 1)).as("dapps"))
    val eraRewards = ag.select(
      (col("es") % 499).as("span_era"),
      array(struct((col("es") / 10000.0).as("stakerRewardPool"),
        (col("es") / 100.0).as("staked"),
        (col("n") / 10.0).as("dappRewardPool"))).as("spans"))
    val inflation = ag.select(
      ((col("es") % 97) / 1000.0).as("maxInflationRate"),
      ((col("es") % 89) / 1000.0).as("treasuryPart"),
      ((col("n") % 83) / 1000.0).as("collatorsPart"))
    Map("dappStaking.currentEraInfo" -> eraInfo,
      "dappStaking.contractStake" -> contractStake,
      "dappStaking.dAppTiers" -> tiers,
      "dappStaking.eraRewards" -> eraRewards,
      "inflation.inflationParams" -> inflation)
  }

  private def b13(s: SparkSession, d: String): DataFrame = {
    import graft.etl.Snapshotter
    def g(p: String) = get_json_object(col("pv"), p).cast("double")
    Snapshotter.dumpChainSnapshot("Astar", astarScaledFramesOf(s, d),
      Snapshotter.Placement("Astar", "polkaholic", 5700000L, "0xa57",
        1709272800L, ss58Prefix = 5, era = 742L),
      "2024-03-01", queryDumpDir("graft_astar_scaled_dump"))
      .select(col("storage"),
        when(col("storage") === "contractStake",
          get_json_object(col("pv"), "$.dAppID"))
          .when(col("storage").isin("currentEraInfo",
            "inflationParams"), lit(null).cast("string"))
          .otherwise(get_json_object(col("pv"), "$.era")).as("k"),
        when(col("storage") === "currentEraInfo", g("$.totalLocked"))
          .when(col("storage") === "contractStake",
            g("$.staked.voting"))
          .when(col("storage") === "dAppTiers", g("$.rewards[0]"))
          .when(col("storage") === "inflationParams",
            g("$.maxInflationRate"))
          .otherwise(g("$.span[0].stakerRewardPool")).as("d1"),
        when(col("storage") === "currentEraInfo", g("$.unlocking"))
          .when(col("storage") === "contractStake",
            g("$.staked.buildAndEarn"))
          .when(col("storage") === "dAppTiers", g("$.rewards[1]"))
          .when(col("storage") === "inflationParams",
            g("$.treasuryPart"))
          .otherwise(g("$.span[0].staked")).as("d2"),
        when(col("storage") === "currentEraInfo",
          g("$.currentStakeAmount.voting"))
          .when(col("storage") === "contractStake", g("$.staked.era"))
          .when(col("storage") === "dAppTiers",
            g("$.dappsList[0].tier"))
          .when(col("storage") === "inflationParams",
            g("$.collatorsPart"))
          .otherwise(g("$.span[0].dappRewardPool")).as("d3"),
        when(col("storage") === "currentEraInfo",
          g("$.currentStakeAmount.buildAndEarn"))
          .when(col("storage") === "contractStake",
            g("$.staked.period"))
          .when(col("storage") === "dAppTiers",
            g("$.dappsList[0].reward")).as("d4"),
        when(col("storage") === "currentEraInfo",
          g("$.nextStakeAmount.voting"))
          .when(col("storage") === "contractStake",
            g("$.stakedFuture.voting"))
          .when(col("storage") === "dAppTiers",
            g("$.dappsList[1].tier")).as("d5"),
        when(col("storage") === "currentEraInfo",
          g("$.nextStakeAmount.buildAndEarn"))
          .when(col("storage") === "contractStake",
            g("$.stakedFuture.era"))
          .when(col("storage") === "dAppTiers",
            g("$.dappsList[1].reward")).as("d6"))
      .orderBy(col("storage"), col("k").asc_nulls_first)
  }

  private val b13Sql =
    """WITH ag AS (
      | SELECT sum(event_id) AS es, count(*) AS n FROM events),
      |cs AS (
      | SELECT CAST(user_id % 10 AS INT) AS g, sum(event_id) AS es,
      |  count(*) AS n
      | FROM events WHERE event_id < 400 GROUP BY 1)
      |SELECT * FROM (
      | SELECT 'currentEraInfo' AS storage, CAST(NULL AS VARCHAR) AS k,
      |  CAST(es AS DOUBLE) / 10000.0 AS d1,
      |  CAST(n AS DOUBLE) / 100.0 AS d2,
      |  CAST(es % 1000003 AS DOUBLE) / 100.0 AS d3,
      |  CAST(es % 999983 AS DOUBLE) / 100.0 AS d4,
      |  CAST(n % 997 AS DOUBLE) / 10.0 AS d5,
      |  CAST(n % 991 AS DOUBLE) / 10.0 AS d6
      | FROM ag
      | UNION ALL
      | SELECT 'contractStake', CAST(g AS VARCHAR),
      |  CAST(es AS DOUBLE) / 100.0, CAST(n AS DOUBLE) / 10.0,
      |  742.0, 8.0,
      |  CASE WHEN g % 2 = 0 THEN CAST(es AS DOUBLE) / 50.0 END,
      |  CASE WHEN g % 2 = 0 THEN 743.0 END
      | FROM cs
      | UNION ALL
      | SELECT 'dAppTiers', '742',
      |  CAST(es AS DOUBLE) / 1000.0, CAST(n AS DOUBLE) / 10.0,
      |  0.0, CAST(es AS DOUBLE) / 1000.0,
      |  1.0, CAST(n AS DOUBLE) / 10.0
      | FROM ag
      | UNION ALL
      | SELECT 'eraRewards', CAST(es % 499 AS VARCHAR),
      |  CAST(es AS DOUBLE) / 10000.0, CAST(es AS DOUBLE) / 100.0,
      |  CAST(n AS DOUBLE) / 10.0, NULL, NULL, NULL
      | FROM ag
      | UNION ALL
      | SELECT 'inflationParams', NULL,
      |  CAST(es % 97 AS DOUBLE) / 1000.0,
      |  CAST(es % 89 AS DOUBLE) / 1000.0,
      |  CAST(n % 83 AS DOUBLE) / 1000.0, NULL, NULL, NULL
      | FROM ag)
      |ORDER BY storage, k NULLS FIRST""".stripMargin

  // B14 — the relay gov extractors through the Polkadot catalog
  // (referenda.referendumInfoFor, treasury.proposals,
  // bounties.bounties; ref polkadot.js:471-521): every pv field is
  // ints + strings + pubkeyOf-normalized addresses, and 0x-hex
  // addresses pass through pubkeyOf verbatim — so with hex fixture
  // addresses the pv JSON AND the rec address compare character-exact
  // in DuckDB (the ss58 rendering of address_ss58 stays the codec's,
  // pinned by GovSpec).
  private def relayGovFramesOf(s: SparkSession, d: String)
      : Map[String, DataFrame] = {
    val ev = Tables.events(s, d).filter(col("event_id") < 500)
    def hx(tag: String, c: Column) =
      concat(lit("0x"), md5(concat(lit(tag), c.cast("string"))
        .cast("binary")))
    val referenda = ev.groupBy((col("user_id") % 30).cast("long")
        .as("ref_id"))
      .agg(sum(col("event_id")).as("es"), count(lit(1)).as("n"))
      .select(col("ref_id"),
        element_at(typedLit(Seq("Ongoing", "Approved", "Rejected")),
          (col("ref_id") % 3).cast("int") + 1).as("status"),
        hx("dep", col("ref_id")).as("submission_depositor"),
        (col("es") % 1009).as("submission_deposit"),
        (col("es") % 997).as("decision_deposit"),
        col("es").as("tally_ayes"), (col("es") % 991).as("tally_nays"),
        col("n").as("tally_support"))
    val treasury = ev.groupBy((col("user_id") % 15).cast("long")
        .as("proposal_id"))
      .agg(sum(col("event_id")).as("es"))
      .select(col("proposal_id"),
        hx("prop", col("proposal_id")).as("proposer"),
        hx("ben", col("proposal_id")).as("beneficiary"),
        col("es").cast("decimal(38,0)").as("value"),
        (col("es") % 977).cast("decimal(38,0)").as("bond"))
    val bounties = ev.groupBy((col("user_id") % 8).cast("long")
        .as("bounty_id"))
      .agg(sum(col("event_id")).as("es"))
      .select(col("bounty_id"),
        hx("bp", col("bounty_id")).as("proposer"),
        col("es").cast("decimal(38,0)").as("value"),
        (col("es") % 499).cast("decimal(38,0)").as("fee"),
        (col("es") % 503).cast("decimal(38,0)")
          .as("curator_deposit"),
        (col("es") % 509).cast("decimal(38,0)").as("bond"),
        when(col("bounty_id") % 2 === 0, "Active")
          .otherwise("Proposed").as("status"),
        // curator + update_due present together (Active bounties)
        when(col("bounty_id") % 2 === 0, hx("cur", col("bounty_id")))
          .as("curator"),
        when(col("bounty_id") % 2 === 0, col("es") % 100000)
          .as("update_due"))
    Map("referenda.referendumInfoFor" -> referenda,
      "treasury.proposals" -> treasury,
      "bounties.bounties" -> bounties)
  }

  private def b14(s: SparkSession, d: String): DataFrame = {
    import graft.etl.Snapshotter
    Snapshotter.dumpChainSnapshot("Polkadot", relayGovFramesOf(s, d),
      Snapshotter.Placement("Polkadot", "polkaholic", 20000000L,
        "0xp20", 1709272800L, ss58Prefix = 0, era = 1400L),
      "2024-03-01", queryDumpDir("graft_relaygov_dump"))
      .select(col("section"), col("storage"), col("track"),
        col("track_val"), col("address_pubkey"), col("pv"),
        col("block_number"), us(col("ts")).as("ts_us"))
      .orderBy(col("storage"), col("track"), col("track_val"))
  }

  private val b14Sql =
    """WITH ev AS (SELECT * FROM events WHERE event_id < 500),
      |r AS (
      | SELECT CAST(user_id % 30 AS BIGINT) AS ref_id,
      |  sum(event_id) AS es, count(*) AS n
      | FROM ev GROUP BY 1),
      |t AS (
      | SELECT CAST(user_id % 15 AS BIGINT) AS pid, sum(event_id) AS es
      | FROM ev GROUP BY 1),
      |b AS (
      | SELECT CAST(user_id % 8 AS BIGINT) AS bid, sum(event_id) AS es
      | FROM ev GROUP BY 1)
      |SELECT * FROM (
      | SELECT 'referenda' AS section, 'referendumInfoFor' AS storage,
      |  'referenda' AS track, CAST(ref_id AS VARCHAR) AS track_val,
      |  CAST(NULL AS VARCHAR) AS address_pubkey,
      |  '{"ref_id":' || CAST(ref_id AS VARCHAR)
      |   || ',"status":"' || CASE CAST(ref_id % 3 AS INT)
      |      WHEN 0 THEN 'Ongoing' WHEN 1 THEN 'Approved'
      |      ELSE 'Rejected' END
      |   || '","submission_depositor":"0x'
      |   || md5('dep' || CAST(ref_id AS VARCHAR))
      |   || '","submission_deposit":' || CAST(es % 1009 AS VARCHAR)
      |   || ',"decision_deposit":' || CAST(es % 997 AS VARCHAR)
      |   || ',"tally_ayes":' || CAST(es AS VARCHAR)
      |   || ',"tally_nays":' || CAST(es % 991 AS VARCHAR)
      |   || ',"tally_support":' || CAST(n AS VARCHAR) || '}' AS pv
      | FROM r
      | UNION ALL
      | SELECT 'treasury', 'proposals', 'treasury',
      |  CAST(pid AS VARCHAR),
      |  '0x' || md5('ben' || CAST(pid AS VARCHAR)),
      |  '{"treasury_index":' || CAST(pid AS VARCHAR)
      |   || ',"proposer_pubkey":"0x'
      |   || md5('prop' || CAST(pid AS VARCHAR))
      |   || '","value":' || CAST(es AS VARCHAR)
      |   || ',"bond":' || CAST(es % 977 AS VARCHAR) || '}'
      | FROM t
      | UNION ALL
      | SELECT 'bounties', 'bounties', 'bounty', CAST(bid AS VARCHAR),
      |  '0x' || md5('bp' || CAST(bid AS VARCHAR)),
      |  '{"bounty_index":' || CAST(bid AS VARCHAR)
      |   || ',"value":' || CAST(es AS VARCHAR)
      |   || ',"fee":' || CAST(es % 499 AS VARCHAR)
      |   || ',"curator_deposit":' || CAST(es % 503 AS VARCHAR)
      |   || ',"bond":' || CAST(es % 509 AS VARCHAR)
      |   || ',"bounty_status":"'
      |   || CASE WHEN bid % 2 = 0 THEN 'Active' ELSE 'Proposed' END
      |   || '"'
      |   || CASE WHEN bid % 2 = 0 THEN
      |      ',"curator_pubkey":"0x'
      |      || md5('cur' || CAST(bid AS VARCHAR))
      |      || '","update_due":' || CAST(es % 100000 AS VARCHAR)
      |     ELSE '' END
      |   || '}'
      | FROM b)
      |CROSS JOIN (SELECT CAST(20000000 AS BIGINT) AS block_number,
      | CAST(1709272800 AS BIGINT) * 1000000 AS ts_us)
      |ORDER BY storage, track, track_val""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b8_assethub_asset" -> (b8 _),
    "b9_assethub_holders" -> (b9 _),
    "b10_snapshot_catalog" -> (b10 _),
    "b11_hydradx_walks" -> (b11 _),
    "b12_astar_family" -> (b12 _),
    "b13_astar_scaled" -> (b13 _),
    "b14_relay_gov" -> (b14 _))

  val oracles: Map[String, String] = Map(
    "b8_assethub_asset" -> b8Sql,
    "b9_assethub_holders" -> b9Sql,
    "b10_snapshot_catalog" -> b10Sql,
    "b11_hydradx_walks" -> b11Sql,
    "b12_astar_family" -> b12Sql,
    "b13_astar_scaled" -> b13Sql,
    "b14_relay_gov" -> b14Sql)
}
