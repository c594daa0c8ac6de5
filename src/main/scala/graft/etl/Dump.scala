package graft.etl

import graft.functions.{CallFlatten, Udfs}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The core batch ETL entry point — SURVEY §3.2 (`substrate-etl dump`,
  * ref substrateetl.js:6171 dump_substrateetl) as ONE DataFrame job:
  *
  *   raw (nested) blocks for a UTC day
  *     → 8 entity projections: blocks, extrinsics, events, transfers,
  *       calls, logs, rewards, crowdloan
  *     → idempotent date-partitioned parquet (Writers.overwritePartitions
  *       = the `bq load $date --replace` semantics)
  *
  * where the reference runs nested per-block/per-extrinsic JS loops, each
  * output here is a declarative explode/flatten that Catalyst pipelines —
  * no process boundaries, no driver-side iteration. One scan of the raw
  * table feeds all eight projections (each projection prunes to the columns
  * it needs).
  */
object Dump {

  /** USD-decoration dimensions for the dump (ref substrateetl.js:
    * 6342-6372: exported transfers carry price_usd/amount_usd and
    * extrinsics/calls carry fee_usd, valued via assetManager.js:1392
    * computePriceUSD at block time):
    *
    *  - `priceLog` — the (asset, chain_id, index_ts, price_usd) series
    *    slice covering the day (FIXTURES.md §11 shape); it broadcasts
    *    as validity intervals, so pass the relevant slice, not the
    *    full history;
    *  - `chains` — the chain-registry slice
    *    (chain_id, native_asset, decimals) resolving each chain's fee/
    *    reward token to its price-log asset key and base-unit scale
    *    (ref getChainSymbol + getChainDecimal, indexer.js
    *    decorateFeedReward).
    *
    * Both are bounded dimensions; the decoration never shuffles the
    * fact side (see [[graft.analytics.PriceSeries.withAsOfPrice]]). */
  final case class UsdDims(priceLog: DataFrame, chains: DataFrame) {
    /** The as-of validity-interval dim, built ONCE per dims instance
      * and shared by every table write of the dump (round 19): the
      * intervals are a bounded artifact (points per series), and the
      * eager localCheckpoint stops each concurrent write job from
      * re-running the log's dedup+window subtree. Lazy so a dump
      * invoked without USD decoration never pays for it. */
    lazy val intervals: DataFrame =
      graft.analytics.PriceSeries.asOfIntervals(priceLog)
        .localCheckpoint(true)
  }

  /** Append `fee_usd` = fee × the chain's native-token as-of price —
    * the shared decoration of the extrinsics and calls projections. */
  private def withFeeUsd(df: DataFrame, usd: UsdDims): DataFrame =
    graft.analytics.PriceSeries.withAsOfIntervals(
        df.join(broadcast(
            usd.chains.select(col("chain_id"),
              col("native_asset").as("asset"))),
          Seq("chain_id"), "left"),
        usd.intervals)
      .withColumn("fee_usd", col("fee") * col("price_usd"))
      .drop("asset", "price_usd")

  /** Filter to the UTC day and flag rows like the reference's guards
    * (ref substrateetl.js:6271-6288: fork/date-mismatch checks —
    * finalized-only, matching logDT). Applied exactly once per input:
    * the public projections call it on raw input; dumpDay applies it
    * once, persists, and feeds the day frame to the *Of variants. */
  private def dayBlocks(raw: DataFrame, logDT: String): DataFrame = {
    Udfs.register(raw.sparkSession) // idempotent; projections use the UDFs
    raw.filter(col("finalized") &&
      date_format(col("block_time"), "yyyy-MM-dd") === logDT)
  }

  /** blocks projection + per-block stats (A1,
    * ref indexer.js:5019-5047 getBlockStats; substrateetl.js:6293-6309). */
  def blocks(raw: DataFrame, logDT: String): DataFrame =
    blocksOf(dayBlocks(raw, logDT), logDT)

  private def blocksOf(day: DataFrame, logDT: String): DataFrame =
    day.select(
      col("chain_id"), col("number"), col("hash"), col("parent_hash"),
      col("block_time"), col("spec_version"),
      col("author_pub").as("author_pub_key"),
      expr("ss58_encode(author_pub, 42)").as("author_ss58"),
      size(col("extrinsics")).as("extrinsic_count"),
      expr("aggregate(extrinsics, 0, (acc, x) -> acc + size(x.events))")
        .as("event_count"),
      expr("aggregate(extrinsics, 0, (acc, x) -> acc + size(x.transfers))")
        .as("transfer_count"),
      lit(logDT).as("log_dt"))

  /** extrinsics projection; success/fail resolved from the paired
    * system.ExtrinsicSuccess/Failed event WITHOUT exploding (P2,
    * ref indexer.js:3754 checkExtrinsicStatusAndFee). */
  def extrinsics(raw: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame =
    extrinsicsOf(dayBlocks(raw, logDT), logDT, usd)

  private def extrinsicsOf(day: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame = {
    val base = day
      .select(col("chain_id"), col("number"), col("block_time"),
        col("hash").as("block_hash"),
        explode(col("extrinsics")).as("ex"))
      .select(
        col("chain_id"),
        col("ex.hash").as("hash"),
        concat(col("number"), lit("-"), col("ex.idx")).as("extrinsic_id"),
        col("block_time"), col("number").as("block_number"),
        col("block_hash"),
        col("ex.section"), col("ex.method"),
        col("ex.params"), col("ex.fee"),
        col("ex.signed"),
        expr("exists(ex.events, e -> e.section = 'system' AND e.method = 'ExtrinsicSuccess')")
          .as("status"),
        col("ex.signer_pub").as("signer_pub_key"),
        when(col("ex.signed"), expr("ss58_encode(ex.signer_pub, 42)"))
          .as("signer_ss58"))
    // fee_usd (ref substrateetl.js:6372 computeExtrinsicFeeUSD): the
    // fee is paid in the chain's native token — resolve it through the
    // chain registry, then as-of-price at block time. Null-emitted
    // without dims so the table schema stays partition-invariant.
    usd.fold(base.withColumn("fee_usd", lit(null).cast("double")))(
        withFeeUsd(base, _))
      .withColumn("log_dt", lit(logDT))
  }

  /** events projection with composite ids (P3,
    * ref substrateetl.js:6314-6341). */
  def events(raw: DataFrame, logDT: String): DataFrame =
    eventsOf(dayBlocks(raw, logDT), logDT)

  private def eventsOf(day: DataFrame, logDT: String): DataFrame =
    eventGrain(day)
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("ext_idx"), lit("-"),
          col("event_idx")).as("event_id"),
        col("section"), col("method"), col("data"),
        concat(col("number"), lit("-"), col("ext_idx")).as("extrinsic_id"),
        col("extrinsic_hash"), col("block_time"),
        col("number").as("block_number"), col("block_hash"),
        lit(logDT).as("log_dt"))

  /** transfers projection: classification, dedup of duplicated emits,
    * decimal scaling, address normalization (P6/P12,
    * ref indexer.js:4228 map_feedTransfers_to_transfers; dedup note
    * docs/DEFINITIONS.md:255-258). */
  def transfers(raw: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame =
    transfersOf(dayBlocks(raw, logDT), logDT, usd)

  private def transfersOf(day: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame = {
    val base = day
      .select(col("chain_id"), col("number"), col("block_time"),
        col("hash").as("block_hash"),
        explode(col("extrinsics")).as("ex"))
      .select(col("chain_id"), col("number"), col("block_time"),
        col("block_hash"), col("ex.idx").as("ext_idx"),
        col("ex.hash").as("extrinsic_hash"),
        explode(col("ex.transfers")).as("t"))
      // duplicate-emit dedup on the transfer identity
      .dropDuplicates("chain_id", "number", "ext_idx", "t")
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("ext_idx")).as("extrinsic_id"),
        col("extrinsic_hash"), col("block_time"),
        col("number").as("block_number"), col("block_hash"),
        expr("ss58_encode(t.from_pub, 42)").as("from_ss58"),
        col("t.from_pub").as("from_pub_key"),
        expr("ss58_encode(t.to_pub, 42)").as("to_ss58"),
        col("t.to_pub").as("to_pub_key"),
        expr("asset_chain(t.asset, chain_id)").as("asset"),
        col("t.raw_amount_hex"),
        col("t.decimals"),
        expr("to_base_unit(t.raw_amount_hex, t.decimals)").as("amount"))
    // USD decoration (ref substrateetl.js:6342-6371: transfers export
    // carries price_usd/amount_usd) — as-of against the broadcast
    // price-interval dim; unpriced assets keep nulls, like the
    // reference's priceUSD-miss path. The columns EXIST either way:
    // a dims-less dump emits them as nulls so the table schema never
    // varies across partitions (a mixed-schema parquet table makes
    // footer-sampled reads nondeterministic about the USD columns).
    (usd match {
      case Some(u) =>
        graft.analytics.PriceSeries.withAsOfIntervals(base, u.intervals)
          .withColumn("amount_usd", col("amount") * col("price_usd"))
      case None => base
        .withColumn("price_usd", lit(null).cast("double"))
        .withColumn("amount_usd", lit(null).cast("double"))
    }).withColumn("log_dt", lit(logDT))
  }

  /** calls projection: recursive flatten with noise suppression, fee on
    * root only (P4/P5 — graft.functions.CallFlatten inside a typed
    * flatMap). */
  def calls(raw: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame =
    callsOf(dayBlocks(raw, logDT), logDT, usd)

  private def callsOf(day: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame = {
    val spark = day.sparkSession
    import spark.implicits._
    val src = day
      .select(col("chain_id"), col("number"), col("block_time"),
        col("hash").as("block_hash"),
        explode(col("extrinsics")).as("ex"))
      .select(col("chain_id"), col("number").as("block_number"),
        col("block_time"), col("block_hash"),
        col("ex.idx").as("ext_idx"),
        col("ex.hash").as("extrinsic_hash"),
        col("ex.section"), col("ex.method"),
        col("ex.params"), col("ex.fee"), col("ex.signed"))
      .as[(Int, Long, java.sql.Timestamp, String, Int, String, String,
        String, String, Double, Boolean)]
    val flat = src.flatMap { case (chainId, bn, bt, bh, extIdx, exHash,
        section, method, params, fee, signed) =>
      CallFlatten.flatten(params, Some(fee)).map { fc =>
        (chainId, s"$bn-$extIdx", bh, bn, bt, exHash, section, method,
          fc.call_id, fc.call_section, fc.call_method, fc.call_args,
          fc.root, fc.leaf, fc.fee, signed)
      }
    }.toDF("chain_id", "extrinsic_id", "block_hash", "block_number",
        "block_time", "extrinsic_hash", "extrinsic_section",
        "extrinsic_method",
        "call_id", "call_section", "call_method", "call_args",
        "root", "leaf", "fee", "signed")
    // fee_usd rides the root call only (the flattener keeps fee on the
    // root — ref calls.json fee_usd; non-root null fee → null fee_usd);
    // null-emitted without dims so the schema stays partition-invariant
    usd.fold(flat.withColumn("fee_usd", lit(null).cast("double")))(
        withFeeUsd(flat, _))
      .withColumn("log_dt", lit(logDT))
  }

  /** specversions dimension: the FIRST block (number, hash, time) at
    * which each spec version was seen per chain (ref
    * schema/substrateetl/specversions.json; substrateetl.js:158 — NOT
    * date-partitioned, unlike the entity tables, so it writes as a
    * whole-table overwrite via [[dumpSpecVersions]]). One struct-argmin
    * aggregation; the result is exactly the dimension
    * [[graft.decode.TraceDecode.withSpecVersion]] broadcasts for as-of
    * decode dispatch. */
  def specVersions(raw: DataFrame): DataFrame =
    raw.filter(col("finalized"))
      .groupBy(col("chain_id"), col("spec_version"))
      .agg(min(struct(col("number"), col("hash"), col("block_time")))
        .as("f"))
      .select(col("chain_id"), col("spec_version"),
        col("f.number").as("block_number"),
        col("f.hash").as("block_hash"),
        col("f.block_time").as("block_time"))

  /** Write the specversions dimension (whole-table overwrite — the
    * dimension is tiny and cumulative, ref substrateetl.js:148). */
  def dumpSpecVersions(raw: DataFrame, outRoot: String): DataFrame = {
    val dim = specVersions(raw)
    dim.write.mode("overwrite").parquet(s"$outRoot/specversions")
    dim
  }

  /** Flat event grain shared by the events/rewards/crowdloan
    * projections: one row per event with block + extrinsic identity
    * and the raw `event_idx` ordering [[Rewards]] windows over. */
  private def eventGrain(day: DataFrame): DataFrame =
    day
      .select(col("chain_id"), col("number"), col("block_time"),
        col("hash").as("block_hash"),
        explode(col("extrinsics")).as("ex"))
      .select(col("chain_id"), col("number"), col("block_time"),
        col("block_hash"), col("ex.idx").as("ext_idx"),
        col("ex.hash").as("extrinsic_hash"),
        explode(col("ex.events")).as("ev"))
      .select(col("chain_id"), col("number"), col("block_time"),
        col("block_hash"), col("ext_idx"), col("extrinsic_hash"),
        col("ev.event_idx").as("event_idx"),
        col("ev.section").as("section"),
        col("ev.method").as("method"),
        col("ev.data").as("data"))

  private val grainKeys = Seq("chain_id", "number", "ext_idx")

  /** rewards projection (P7 — ref indexer.js:3941 processRawFeedRewards;
    * schema shape schema/substrateetl rewards export): era-attached
    * positive staking payouts, one row per Rewarded event. */
  def rewards(raw: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame =
    rewardsOf(dayBlocks(raw, logDT), logDT, usd)

  private def rewardsOf(day: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): DataFrame = {
    val base =
    // prune BEFORE the double explode: most blocks carry no staking
    // payout, and at fleet scale skipping them here means the explode
    // never materializes their event rows (markers live in the same
    // extrinsic as their rewards, so block-level pruning cannot lose
    // an era attach)
    // the prune set mirrors Rewards.isRewardEvent exactly (incl.
    // staking.Slashed — those rows negate and drop inside rewardRows,
    // but the prune must never contradict the predicate seam)
    Rewards.rewardRows(eventGrain(day.filter(expr(
        """exists(extrinsics, x -> exists(x.events, e ->
          |  (e.section = 'staking' AND
          |     (e.method = 'Rewarded' OR e.method = 'Slashed')) OR
          |  (e.section = 'dappsStaking' AND e.method = 'Reward')))"""
          .stripMargin))), grainKeys)
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("ext_idx"), lit("-"),
          col("event_idx")).as("event_id"),
        concat(col("number"), lit("-"), col("ext_idx")).as("extrinsic_id"),
        col("extrinsic_hash"), col("block_time"),
        col("number").as("block_number"), col("block_hash"),
        col("section"), col("method"),
        col("account_pub").as("account_pub_key"),
        expr("ss58_encode(account_pub, 42)").as("account_ss58"),
        col("era"), col("amount_raw"))
    // USD valuation (ref indexer.js decorateFeedReward: amount =
    // rawAmount / 10^decimals, amountUSD = amount × price) — the
    // reward token is the chain's native token, resolved with its
    // base-unit scale through the registry dim; null-emitted without
    // dims so the schema stays partition-invariant
    val decorated = usd match {
      case Some(u) =>
        graft.analytics.PriceSeries.withAsOfIntervals(
            base.join(broadcast(u.chains.select(col("chain_id"),
                col("native_asset").as("asset"), col("decimals"))),
              Seq("chain_id"), "left"),
            u.intervals)
          .withColumn("amount",
            col("amount_raw").cast("double") /
              pow(lit(10.0), col("decimals")))
          .withColumn("amount_usd", col("amount") * col("price_usd"))
          .drop("asset", "decimals")
      case None => base
        .withColumn("amount", lit(null).cast("double"))
        .withColumn("price_usd", lit(null).cast("double"))
        .withColumn("amount_usd", lit(null).cast("double"))
    }
    // ONE column order for both branches (withAsOfPrice appends
    // price_usd earlier than the None branch does): a positional
    // parquet reader over mixed partitions must never see two DOUBLE
    // columns swapped — the partition-invariant-schema contract is
    // order-included
    decorated.select(base.columns.map(col) ++
        Seq(col("amount"), col("price_usd"), col("amount_usd")): _*)
      .withColumn("log_dt", lit(logDT))
  }

  /** crowdloan projection (P7 — ref indexer.js:4018
    * processRawFeedCrowdLoans): Contributed⊕MemoUpdated pairs per
    * (extrinsic, account, fund). */
  def crowdloan(raw: DataFrame, logDT: String): DataFrame =
    crowdloanOf(dayBlocks(raw, logDT), logDT)

  /** system.remark texts per extrinsic, in call-flatten order — the
    * remark feed for the crowdloan pairing (ref indexer.js:4043-4055).
    * Suppression is DISABLED here: system:remark is noise for the
    * calls table but the payload of the remark-contribution branch. */
  private def remarksOf(day: DataFrame): DataFrame = {
    val spark = day.sparkSession
    import spark.implicits._
    day
      .select(col("chain_id"), col("number"), col("block_time"),
        col("hash").as("block_hash"), explode(col("extrinsics")).as("ex"))
      .select(col("chain_id"), col("number"), col("block_time"),
        col("block_hash"), col("ex.idx").as("ext_idx"),
        col("ex.hash").as("extrinsic_hash"), col("ex.params"))
      .as[(Int, Long, java.sql.Timestamp, String, Int, String, String)]
      .flatMap { case (cid, bn, bt, bh, ei, eh, params) =>
        CallFlatten.flatten(params, None, suppressed = Set.empty)
          .zipWithIndex.collect {
            case (fc, i) if fc.call_section == "system" &&
                fc.call_method == "remark" =>
              (cid, bn, bt, bh, ei, eh, i, fc.call_args)
          }
      }.toDF("chain_id", "number", "block_time", "block_hash",
        "ext_idx", "extrinsic_hash", "remark_idx", "call_args")
      .withColumn("remark", coalesce(
        get_json_object(col("call_args"), "$.remark"), col("call_args")))
      .drop("call_args")
  }

  private def crowdloanOf(day: DataFrame, logDT: String): DataFrame = {
    // block/extrinsic context columns ride the groupBy as keys — they
    // are functionally dependent on (chain_id, number, ext_idx);
    // crowdloan-less blocks prune before BOTH the event explode and
    // the remark call-flatten (remarks only ever join pairs, and pairs
    // only exist in blocks that pass this filter)
    val clDay = day.filter(expr(
      "exists(extrinsics, x -> exists(x.events, " +
        "e -> e.section = 'crowdloan'))"))
    Rewards.crowdloanRows(eventGrain(clDay),
        grainKeys ++ Seq("block_time", "block_hash", "extrinsic_hash"),
        remarks = Some(remarksOf(clDay)))
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("ext_idx"), lit("-"),
          col("event_idx")).as("event_id"),
        concat(col("number"), lit("-"), col("ext_idx")).as("extrinsic_id"),
        col("extrinsic_hash"), col("block_time"),
        col("number").as("block_number"), col("block_hash"),
        col("account_pub").as("account_pub_key"),
        expr("ss58_encode(account_pub, 42)").as("account_ss58"),
        col("fund_id").as("para_id"), col("amount_raw"), col("memo"),
        col("remark"),
        lit(logDT).as("log_dt"))
  }

  /** Relay-level crowdloan day repackaging (E22 — ref
    * substrateetl.js:4766-4860 dump_relaychain_crowdloan): the relay
    * chain's own (paraID 0) `crowdloan$YYYYMMDD` table — ONE ROW PER
    * crowdloan `Contributed` EVENT, decorated with the parent
    * extrinsic's hash and section:method. This is deliberately NOT
    * the per-chain E1 entity ([[crowdloan]]): the reference's relay
    * SQL takes only Contributed events with no MemoUpdated pairing
    * and no last-write-wins collapse.
    *
    * The reference composes it as a BigQuery left join of the
    * published events0/extrinsics0 tables (:4811-4821). Both
    * projections come off the same raw day here, so the parent
    * extrinsic's columns ride the explode and the join disappears —
    * the plan is prune (block-level crowdloan exists()) → explode →
    * row-wise project → write, with no shuffle at any scale.
    *
    * USD decoration mirrors [[rewards]]: the contribution is in the
    * relay's native token, resolved through the chains registry dim
    * (broadcast) and as-of-priced at block time; null-emitted without
    * dims so the table schema stays partition-invariant.
    * `projects` is an optional broadcast dim (para_id, project_name)
    * standing in for the reference's decorated projectName. */
  def relayCrowdloan(raw: DataFrame, logDT: String,
      relayChainId: Int = 0, usd: Option[UsdDims] = None,
      projects: Option[DataFrame] = None): DataFrame = {
    Udfs.register(raw.sparkSession)
    val day = dayBlocks(raw, logDT)
      .filter(col("chain_id") === relayChainId)
      .filter(expr(
        """exists(extrinsics, x -> exists(x.events,
          |  e -> e.section = 'crowdloan' AND e.method = 'Contributed'))"""
          .stripMargin))
    val base = day
      .select(col("chain_id"), col("number"), col("block_time"),
        explode(col("extrinsics")).as("ex"))
      .select(col("chain_id"), col("number"), col("block_time"),
        col("ex.idx").as("ext_idx"),
        col("ex.hash").as("extrinsic_hash"),
        col("ex.section").as("x_section"),
        col("ex.method").as("x_method"),
        explode(col("ex.events")).as("ev"))
      .filter(col("ev.section") === "crowdloan" &&
        col("ev.method") === "Contributed")
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("ext_idx"), lit("-"),
          col("ev.event_idx")).as("event_id"),
        concat(col("number"), lit("-"), col("ext_idx"))
          .as("extrinsic_id"),
        col("extrinsic_hash"),
        concat(col("x_section"), lit(":"), col("x_method"))
          .as("extrinsic_section_method"),
        concat(col("ev.section"), lit("("), col("ev.method"), lit(")"))
          .as("event_section_method"),
        get_json_object(col("ev.data"), "$.who")
          .as("contributor_pubkey"),
        expr("ss58_encode(get_json_object(ev.data, '$.who'), 0)")
          .as("contributor"),
        coalesce(get_json_object(col("ev.data"), "$.fundIndex"),
          get_json_object(col("ev.data"), "$.paraId")).cast("long")
          .as("para_id"),
        get_json_object(col("ev.data"), "$.amount")
          .cast("decimal(38,0)").as("amount_raw"),
        // stays `block_time` through the as-of price join (its default
        // fact-side timestamp); the final select renames it `ts`
        col("block_time"))
    val named = projects match {
      case Some(p) => base.join(
        broadcast(p.select(col("para_id"), col("project_name"))),
        Seq("para_id"), "left")
      case None =>
        base.withColumn("project_name", lit(null).cast("string"))
    }
    val decorated = usd match {
      case Some(u) =>
        graft.analytics.PriceSeries.withAsOfIntervals(
            named.join(broadcast(u.chains.select(col("chain_id"),
                col("native_asset").as("asset"), col("decimals"))),
              Seq("chain_id"), "left"),
            u.intervals)
          .withColumn("contribution",
            col("amount_raw").cast("double") /
              pow(lit(10.0), col("decimals")))
          .withColumn("contribution_usd",
            col("contribution") * col("price_usd"))
          .withColumn("contribution_symbol",
            substring_index(col("asset"), "~", 1))
          .drop("asset", "decimals", "price_usd")
      case None => named
        .withColumn("contribution", lit(null).cast("double"))
        .withColumn("contribution_usd", lit(null).cast("double"))
        .withColumn("contribution_symbol", lit(null).cast("string"))
    }
    decorated.select(
        col("event_id"), col("extrinsic_id"), col("extrinsic_hash"),
        col("extrinsic_section_method"), col("event_section_method"),
        col("contributor_pubkey"), col("contributor"),
        col("para_id"), col("project_name"),
        col("contribution"), col("contribution_usd"),
        col("contribution_symbol"), col("amount_raw"),
        col("block_time").as("ts"),
        lit(logDT).as("log_dt"))
    // deliberate divergence: the reference SQL ends `order by
    // contributor_pubkey` (substrateetl.js:4820), but a BigQuery
    // TABLE write does not preserve row order and every consumer
    // (DumpSpec, b16) re-sorts after read — mirroring it here would
    // spend a global sort exchange on the whole day for nothing, so
    // the dump stays the shuffle-free prune → explode → project →
    // write plan the docs describe
  }

  /** Land [[relayCrowdloan]] as an idempotent date partition — the
    * `crowdloan$YYYYMMDD --replace` twin, like dumpDay's tables.
    * `outRoot` is the RELAY dataset root (the reference writes into
    * `get_relayChain_dataset(...)`, a different dataset than the
    * per-chain tables — do not point this at a per-chain dumpDay root
    * or the relay table will shadow the E1 entity). */
  def dumpRelayCrowdloanDay(raw: DataFrame, logDT: String,
      outRoot: String, relayChainId: Int = 0,
      usd: Option[UsdDims] = None,
      projects: Option[DataFrame] = None): DataFrame = {
    val out = relayCrowdloan(raw, logDT, relayChainId, usd, projects)
    Writers.overwritePartitions(out, s"$outRoot/crowdloan",
      Seq("log_dt"))
    out
  }

  /** logs projection: digest-log posexplode with log ids (P8,
    * ref substrateetl.js:6462-6473). */
  def logs(raw: DataFrame, logDT: String): DataFrame =
    logsOf(dayBlocks(raw, logDT), logDT)

  private def logsOf(day: DataFrame, logDT: String): DataFrame =
    day
      .select(col("chain_id"), col("number"), col("block_time"),
        posexplode(col("logs")).as(Seq("log_idx", "lg")))
      .select(col("chain_id"),
        concat(col("number"), lit("-"), col("log_idx")).as("log_id"),
        col("number").as("block_number"), col("block_time"),
        col("lg.log_type"), col("lg.value"),
        lit(logDT).as("log_dt"))

  // ---- storage-trace-derived daily tables (ref substrateetl.js:
  // 6605-6773 parse_trace + backfill_trace*, schemas traces.json /
  // balances.json): the trace family rides NEXT to the block dump as
  // its own flat source (model.RawTrace) and lands two more
  // date-partitioned tables. ----

  /** Day slice of the flat trace source — same guard semantics as
    * [[dayBlocks]] (finalized-only, matching UTC day). */
  private def dayTraces(rawTraces: DataFrame, logDT: String): DataFrame =
    rawTraces.filter(col("finalized") &&
      date_format(col("block_time"), "yyyy-MM-dd") === logDT)

  /** traces projection (ref parse_trace, substrateetl.js:6605-6773;
    * trace_id = "bn-idx" at :6607): every k/v resolved against the
    * broadcast storage-key dimension ([[graft.decode.TraceDecode]]
    * keyedPrefixDim/keyedPrefixDimFromMetadata shape) — section/
    * storage from the twox128 prefix pair, `pk_extra` = the raw map
    * key recovered from concat hashers, `pv` = the leading
    * compact-decoded value (native expression, stays in codegen).
    * Unknown prefixes keep section/storage 'unknown' like the
    * reference's fallback, never drop. */
  def traces(rawTraces: DataFrame, dim: DataFrame,
      logDT: String): DataFrame =
    tracesOf(dayTraces(rawTraces, logDT), dim, logDT)

  private def tracesOf(day: DataFrame, dim: DataFrame,
      logDT: String): DataFrame = {
    graft.plans.CodecExpressions.register(day.sparkSession)
    graft.decode.TraceDecode.extractKeyComponents(day, dim)
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("trace_idx")).as("trace_id"),
        col("number").as("block_number"), col("block_hash"),
        col("block_time"),
        col("k"), col("v"),
        coalesce(col("section"), lit("unknown")).as("section"),
        coalesce(col("storage"), lit("unknown")).as("storage"),
        col("raw_key").as("pk_extra"),
        expr("compact_decode(v)").as("pv"),
        lit(logDT).as("log_dt"))
  }

  /** balances projection (ref balances.json; the System.Account slice
    * of the trace decode): [[graft.decode.TraceDecode.balances]] rows
    * with their block context and trace ids, ready for the serving
    * tier's accountBalances argmax. */
  def balances(rawTraces: DataFrame, dim: DataFrame, logDT: String,
      decimals: Int = 10, ss58Network: Int = 42): DataFrame =
    balancesOf(dayTraces(rawTraces, logDT), dim, logDT, decimals,
      ss58Network)

  private def balancesOf(day: DataFrame, dim: DataFrame, logDT: String,
      decimals: Int, ss58Network: Int): DataFrame =
    graft.decode.TraceDecode.balances(day, dim, decimals, ss58Network)
      .select(
        col("chain_id"),
        concat(col("number"), lit("-"), col("trace_idx")).as("trace_id"),
        col("number").as("block_number"), col("block_hash"),
        col("block_time"),
        col("address_ss58"), col("address_pubkey"), col("nonce"),
        col("free"), col("free_raw"),
        col("reserved"), col("reserved_raw"),
        col("frozen"), col("frozen_raw"),
        lit(logDT).as("log_dt"))

  /** The trace-side daily dump: `traces` + `balances` as idempotent
    * date partitions next to [[dumpDay]]'s eight tables (ref
    * substrateetl.js:6936 backfill_trace* writes the same pair). One
    * persisted day slice feeds both writes, like dumpDay's. */
  def dumpTracesDay(rawTraces: DataFrame, dim: DataFrame, logDT: String,
      outRoot: String, decimals: Int = 10,
      ss58Network: Int = 42): Map[String, DataFrame] = {
    val day = dayTraces(rawTraces, logDT)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = Map(
        "traces" -> tracesOf(day, dim, logDT),
        "balances" -> balancesOf(day, dim, logDT, decimals, ss58Network))
      // both writes are independent jobs to distinct paths — submit
      // them concurrently so the second back-fills the first's tail
      Writers.concurrently(rawTraces.sparkSession, tables.toSeq) {
        case (name, df) =>
          Writers.overwritePartitions(df, s"$outRoot/$name", Seq("log_dt"))
      }
      tables
    } finally day.unpersist()
  }

  /** Streaming twin of [[dumpTracesDay]] — one micro-batch of raw
    * trace cells landed into the same date-partitioned layout (drive
    * from `foreachBatch` like [[dumpMicroBatch]]). Both projections
    * are row-wise against the broadcast storage-key dim — no
    * cross-trace state — so micro-batching commutes with the batch
    * plan exactly as the block-side tables do.
    *
    * Exactly-once: `foreachBatch` is at-least-once — a restart re-runs
    * the last uncommitted micro-batch — so each write lands as a
    * (log_dt, batch_id) DYNAMIC-OVERWRITE partition keyed by the
    * harness's batchId: a replay replaces its own partition instead of
    * appending duplicate trace/balance rows (the same contract as
    * [[EvmDump.dumpEvmMicroBatch]]). Readers see the same day
    * regardless of batching — drop batch_id or read the directory
    * whole. */
  def dumpTracesMicroBatch(rawTraces: DataFrame, dim: DataFrame,
      batchId: Long, logDT: String, outRoot: String, decimals: Int = 10,
      ss58Network: Int = 42): Unit = {
    val day = dayTraces(rawTraces, logDT)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try Writers.concurrently(rawTraces.sparkSession, Map(
      "traces" -> tracesOf(day, dim, logDT),
      "balances" -> balancesOf(day, dim, logDT, decimals, ss58Network)
    ).toSeq) { case (name, df) =>
      Writers.overwritePartitions(
        df.withColumn("batch_id", lit(batchId)),
        s"$outRoot/$name", Seq("log_dt", "batch_id"))
    } finally day.unpersist(): Unit
  }

  /** The whole §3.2 entry point: validate (timestamp-presence check,
    * ref substrateetl.js:6451-6455), project all eight tables, write each
    * as an idempotent date partition. Returns the table map.
    *
    * The day-filtered raw scan is persisted for the duration of the eight
    * writes — each write is its own job, and without the persist the
    * (at scale, enormous) raw table would be re-scanned eight times. */
  def dumpDay(raw: DataFrame, logDT: String, outRoot: String,
      usd: Option[UsdDims] = None): Map[String, DataFrame] = {
    Udfs.register(raw.sparkSession)
    val day = dayBlocks(raw, logDT)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = projections(day, logDT, usd)
      // the eight writes are independent jobs off the ONE persisted day
      // scan — submitted concurrently (guide §2.6) each write's task
      // tail back-fills with the next table's tasks instead of idling
      // the cluster eight times; cache-block locks keep the persisted
      // day computed once even under concurrent first readers
      Writers.concurrently(raw.sparkSession, tables.toSeq) {
        case (name, df) =>
          Writers.overwritePartitions(df, s"$outRoot/$name", Seq("log_dt"))
      }
      tables
    } finally day.unpersist()
  }

  /** The eight entity projections over an already-day-filtered frame
    * (six core + the P7 rewards/crowdloan extraction tables). With
    * `usd`, transfers carry price_usd/amount_usd and extrinsics/calls
    * carry fee_usd (ref substrateetl.js:6342-6372). */
  private def projections(day: DataFrame, logDT: String,
      usd: Option[UsdDims] = None): Map[String, DataFrame] = Map(
    "blocks" -> blocksOf(day, logDT),
    "extrinsics" -> extrinsicsOf(day, logDT, usd),
    "events" -> eventsOf(day, logDT),
    "transfers" -> transfersOf(day, logDT, usd),
    "calls" -> callsOf(day, logDT, usd),
    "logs" -> logsOf(day, logDT),
    "rewards" -> rewardsOf(day, logDT, usd),
    "crowdloan" -> crowdloanOf(day, logDT))

  /** Bench stage: the reference's core daily workload — a full
    * 8-table [[dumpDay]] (explode/flatten/window/write) over a nested
    * raw day synthesized DETERMINISTICALLY from the events table
    * (~events/3 extrinsics across events/15 blocks, with reward
    * markers, crowdloan events, transfers and digest logs so every
    * projection does real work incl. the ss58/asset UDFs and the era
    * window). Measured round-over-round as `stage:dump_day` so an ETL
    * regression (a lost pushed filter, a new shuffle in a projection)
    * surfaces in the trend guard, not just in specs. */
  def warmDumpDay(s: SparkSession, d: String): Map[String, Long] = {
    // the synthesized day memoizes (stage:dumpsynth_raw) so the
    // stage:dump_day line times the ETL, not the corpus build; the
    // memo is KEYED by the sf dir — a memo built for another corpus
    // (or a standalone spec call with no memo at all) falls back to
    // an inline build, which then measures synthesis+ETL again (the
    // pre-split meaning; in the bench the synth stage always runs
    // first, so the fallback only fires if that stage already failed
    // — a red line of its own, not a silent dilution)
    val raw = memoRawDay match {
      case Some((`d`, frame)) => frame
      case _ => synthesizeRawDay(s, d)
    }
    runDumpDay(s, raw)
  }

  @volatile private var memoRawDay: Option[(String, DataFrame)] = None
  def resetRawDay(): Unit = { memoRawDay = None }

  /** Bench stage: build + materialize the synthetic nested raw day
    * (localCheckpoint) so [[warmDumpDay]] measures ONLY the dump. */
  def warmRawDay(s: SparkSession, d: String): Long = {
    val raw = synthesizeRawDay(s, d).localCheckpoint()
    memoRawDay = Some((d, raw))
    raw.count()
  }

  /** Deterministic nested raw day synthesized from the events table
    * (~events/3 extrinsics across events/15 blocks, with reward
    * markers, crowdloan events, transfers and digest logs so every
    * projection does real work incl. the ss58/asset UDFs and the era
    * window). */
  private def synthesizeRawDay(s: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(s, d)
    // ~15 events per block; the count is one cheap pre-job, NOT a
    // global window
    val blocks = math.max(1L, ev.count() / 15)
    synthesizeRawDayFrom(ev, blocks)
  }

  /** Warm the dump-day codegen on a 10-row inline events frame through
    * the REAL stage path (synthesize → localCheckpoint → 8-table dump
    * into a scratch dir): the stage runs once per bench and its first
    * run absorbed ~1.5 s of Janino/JIT (first 4.7–5.8 s vs 3.3–3.7 s
    * warm) across the nested collect_list synthesis, the eight
    * projections' ss58/asset UDFs and the as-of USD decoration. The
    * rows cover all four event types and the mod-5 transfer lane so
    * the same generated classes compile; corpus-independent. */
  def warmDumpDayCodegen(s: SparkSession): Unit = {
    import s.implicits._
    val ev = Seq(
      (0L, 1L, "signup", 1.0), (1L, 2L, "purchase", 2.0),
      (2L, 3L, "click", 3.0), (3L, 4L, "view", 4.0),
      (5L, 5L, "purchase", 5.0), (10L, 6L, "click", 6.0),
      (7L, 7L, "signup", 7.0), (15L, 8L, "view", 8.0),
      (20L, 9L, "purchase", 9.0), (21L, 10L, "click", 10.0))
      .toDF("event_id", "user_id", "event_type", "value")
    runDumpDay(s, synthesizeRawDayFrom(ev, blocks = 2L).localCheckpoint())
    ()
  }

  private def synthesizeRawDayFrom(ev: DataFrame,
      blocks: Long): DataFrame = {
    val pub = sha2(col("user_id").cast("string").cast("binary"), 256)
    val evRow = ev.select(
      (col("event_id") % blocks).as("number"),
      (col("event_id") % 3).cast("int").as("ext_idx"),
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      pub.as("pub"))
    val withEv = evRow
      .withColumn("event_idx", (col("event_id") % 1000000).cast("int"))
      .withColumn("section",
        when(col("event_type") === "signup", "staking")
          .when(col("event_type") === "purchase", "staking")
          .when(col("event_type") === "click", "crowdloan")
          .otherwise("system"))
      .withColumn("method",
        when(col("event_type") === "signup", "PayoutStarted")
          .when(col("event_type") === "purchase", "Rewarded")
          .when(col("event_type") === "click", "Contributed")
          .otherwise("ExtrinsicSuccess"))
      .withColumn("data",
        when(col("event_type") === "signup",
          format_string("""{"eraIndex":%d}""", col("event_id") % 7))
          .when(col("event_type") === "purchase",
            format_string("""{"stash":"0x%s","amount":%d}""",
              col("pub"), col("event_id") % 50))
          .when(col("event_type") === "click",
            format_string("""{"who":"0x%s","fundIndex":%d,"amount":%d}""",
              col("pub"), col("event_id") % 5, col("event_id") % 900))
          .otherwise(lit("""{"weight":1}""")))
    val perExtrinsic = withEv
      .groupBy(col("number"), col("ext_idx"))
      .agg(
        sort_array(collect_list(struct(
          col("event_idx"), col("section"), col("method"), col("data"))))
          .as("events"),
        // a transfer on ~every fifth extrinsic exercises the
        // dedup/scaling/ss58 path
        sort_array(flatten(collect_list(
          when(col("event_id") % 5 === 0, array(struct(
            col("pub").as("from_pub"),
            sha2(col("pub").cast("binary"), 256).as("to_pub"),
            lit("DOT").as("asset"),
            format_string("0x%x", col("event_id") * 1000000L)
              .as("raw_amount_hex"),
            lit(10).as("decimals"))))
            .otherwise(array().cast(
              "array<struct<from_pub:string,to_pub:string," +
                "asset:string,raw_amount_hex:string,decimals:int>>")))))
          .as("transfers"),
        min(col("pub")).as("signer_pub")) // min, not first: deterministic
      .withColumn("ex", struct(
        col("ext_idx").as("idx"),
        format_string("0xe%d_%d", col("number"), col("ext_idx"))
          .as("hash"),
        lit("balances").as("section"), lit("transfer").as("method"),
        lit("""{"section":"balances","method":"transfer","args":{}}""")
          .as("params"),
        lit(true).as("signed"), col("signer_pub"),
        lit(0.1).as("fee"), col("events"), col("transfers")))
    val raw = perExtrinsic
      .groupBy(col("number"))
      .agg(sort_array(collect_list(col("ex"))).as("extrinsics"),
        min(col("signer_pub")).as("author_pub"))
      .select(
        lit(0).as("chain_id"), col("number"),
        format_string("0xb%d", col("number")).as("hash"),
        format_string("0xb%d", col("number") - 1).as("parent_hash"),
        // FIXED UTC epoch (2024-03-01T00:00:00Z): Timestamp.valueOf
        // reads the JVM default timezone, which on a UTC+N host would
        // shift the whole synthesized day to 2024-02-29 and silently
        // empty the stage behind the UTC session day filter
        (lit(1709251200L)
          + pmod(col("number"), lit(86400L))).cast("timestamp")
          .as("block_time"),
        lit(100).as("spec_version"), col("author_pub"),
        lit(true).as("finalized"), col("extrinsics"),
        array(struct(lit("PreRuntime").as("log_type"),
          lit("0xaa").as("value"))).as("logs"))
    raw
  }

  /** The timed half of the stage: [[dumpDay]] (USD dims included) over
    * an already-materialized raw day, with read-back sanity counts. */
  private def runDumpDay(s: SparkSession,
      raw: DataFrame): Map[String, Long] = {
    // the USD dims ride the stage too (round 11): a 5-min price grid
    // for the native token + the one-chain registry slice, so the
    // decoration path (interval build + broadcast as-of join on three
    // projections) is part of the measured ETL workload
    val priceLog = s.range(288).select(
      lit("DOT~0").as("asset"), lit(0).as("chain_id"),
      (lit(1709251200L) + col("id") * 300).cast("timestamp")
        .as("index_ts"),
      (pmod(col("id"), lit(97)) + lit(1)).cast("double")
        .as("price_usd"))
    val chains = s.range(1).select(lit(0).as("chain_id"),
      lit("DOT~0").as("native_asset"), lit(10).as("decimals"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_bench_dump").toString
    try {
      dumpDay(raw, "2024-03-01", out, Some(UsdDims(priceLog, chains)))
      // read-back counts (tiny parquet reads): the caller can assert
      // the synthesized day actually flowed — an empty dump must fail
      // the smoke test, not "measure" a no-op
      Seq("blocks", "rewards", "crowdloan").map(t =>
        t -> s.read.parquet(s"$out/$t").count()).toMap
    } finally {
      // the stage leaves no disk residue behind on the bench host
      val pth = new org.apache.hadoop.fs.Path(out)
      pth.getFileSystem(s.sessionState.newHadoopConf())
        .delete(pth, true): Unit
    }
  }

  /** Streaming twin of [[dumpDay]] — the ST end-to-end face: the SAME
    * day filter and eight projections applied to ONE micro-batch of raw
    * candidate blocks, APPENDED into the same date-partitioned layout.
    * Drive it from `foreachBatch` over the candidate stream:
    *
    * {{{
    * rawStream.writeStream.foreachBatch { (b, id) =>
    *   Dump.dumpMicroBatch(b, id, logDT, outRoot) }
    * }}}
    *
    * Exactly-once: the stream checkpoint's source tracking makes a
    * clean stop→restart admit only new files (FileStreamSpec), but
    * `foreachBatch` itself is at-least-once — a crash after the write
    * but before the checkpoint commit REPLAYS the batch — so each
    * write lands as a (log_dt, batch_id) DYNAMIC-OVERWRITE partition
    * keyed by the harness's batchId: the replay replaces its own
    * partition instead of appending duplicates (the same contract as
    * [[EvmDump.dumpEvmMicroBatch]]; readers drop batch_id or read the
    * directory whole). Every projection is row-wise per raw block — no
    * cross-block state — so micro-batching commutes with the batch
    * plan and stream output ≡ batch output on the same corpus
    * (StreamingParitySpec pins all eight tables frame-equal). */
  def dumpMicroBatch(raw: DataFrame, batchId: Long, logDT: String,
      outRoot: String, usd: Option[UsdDims] = None): Unit = {
    Udfs.register(raw.sparkSession)
    val day = dayBlocks(raw, logDT)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the USD decoration commutes with micro-batching like the
    // projections themselves: it is row-wise against STATIC broadcast
    // dims (price intervals, chain registry), no cross-block state
    try Writers.concurrently(raw.sparkSession,
      projections(day, logDT, usd).toSeq) { case (name, df) =>
      Writers.overwritePartitions(
        df.withColumn("batch_id", lit(batchId)),
        s"$outRoot/$name", Seq("log_dt", "batch_id"))
    } finally day.unpersist()
  }
}
