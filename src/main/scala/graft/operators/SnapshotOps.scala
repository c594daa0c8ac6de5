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
  * toNumWithoutComma strings); b9 extracts the typed fields (the
  * rollup's float `balance` rendering is engine-specific — its exact
  * decimal arithmetic is pinned by AssetsSpec instead).
  */
object SnapshotOps {

  private def pk(e: Column): Column =
    concat(lit("0x"), md5(e.cast("string").cast("binary")),
      md5(concat(e.cast("string"), lit("x")).cast("binary")))

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
        get_json_object(col("pv"), "$.balance_raw")
          .cast("decimal(38,0)").as("balance_raw"),
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
       |  raw AS balance_raw, CAST(NULL AS BIGINT) AS holders
       | FROM k WHERE keep
       | UNION ALL
       | SELECT symbol, 'holders', NULL,
       |  CAST(sum(raw) AS DECIMAL(38,0)), count(*)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b8_assethub_asset" -> (b8 _),
    "b9_assethub_holders" -> (b9 _),
    "b10_snapshot_catalog" -> (b10 _))

  val oracles: Map[String, String] = Map(
    "b8_assethub_asset" -> b8Sql,
    "b9_assethub_holders" -> b9Sql,
    "b10_snapshot_catalog" -> b10Sql)
}
