package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reward / crowdloan entity extraction — SURVEY §2.2 P7 (ref
  * indexer.js:3941 processRawFeedRewards, :4018 processRawFeedCrowdLoans;
  * output schemas schema/substrateetl/{stakings,…}.json shapes).
  *
  * The reference walks each extrinsic's event list imperatively, carrying
  * an `era` variable set by the latest `staking.PayoutStarted` (or
  * `dappsStaking.Reward`, astar.js:880) marker and attaching it to every
  * subsequent reward row, skipping zero-value payouts. Spark-first, that
  * per-extrinsic scan IS a window: `last(marker_era, ignoreNulls)` over
  * (extrinsic, ORDER BY event_idx) — bounded by events-per-extrinsic
  * (thousands at the very worst payout batch), hash-distributed across
  * extrinsics, so there is no single-partition window at any scale.
  *
  * Crowdloan rows pair `Contributed` with an optional `MemoUpdated` on
  * the same (extrinsic, account, fund) key — the reference's
  * accountParaID map collapses to a groupBy with `max_by(…, event_idx)`
  * last-write-wins semantics (indexer.js:4022-4055).
  *
  * All entry points take the FLAT event grain (one row per event with
  * extrinsic identity + `event_idx` ordering + JSON `data`), so the same
  * operator serves the dump's exploded raw blocks and any events table
  * re-read from parquet.
  */
object Rewards {

  /** Era-marker value of one event row, null for non-markers.
    * `staking.PayoutStarted` carries `eraIndex` (metadata field name) or
    * `era` (reference raw feed name); `dappsStaking.Reward` carries its
    * own `era` inline (astar.js:889). */
  private def markerEra(section: Column, method: Column,
      data: Column): Column =
    when(
      (section === "staking" && method === "PayoutStarted") ||
        (section === "dappsStaking" && method === "Reward"),
      coalesce(
        get_json_object(data, "$.eraIndex"),
        get_json_object(data, "$.era")).cast("long"))

  /** Reward-event predicate — the generic `ChainParser.rewardFilter`
    * (chainparser.js:3898: staking.Rewarded AND staking.Slashed) plus
    * the astar widening, expressed as a Column so it stays inside
    * codegen (the per-chain seam: pass a custom predicate built from the
    * chain's parser when dispatching a specific chain).
    *
    * Slashed rides the predicate like the reference's filter does, but
    * its amount NEGATES in [[rewardRows]] (prepareFeedReward,
    * chainparser.js:4094 `bal = -bal`) and the reference's own
    * zero-payout skip (`value > 0`, indexer.js:3954) then drops every
    * slash row before emit — so the emitted set is unchanged, and the
    * fidelity lives in the path: a per-chain parser that relaxes the
    * positive filter sees slashes flow through with the right sign. */
  def isRewardEvent(section: Column, method: Column): Column =
    (section === "staking" &&
      (method === "Rewarded" || method === "Slashed")) ||
      (section === "dappsStaking" && method === "Reward")

  /** Attach the running era to every event of the frame: the latest
    * marker era at-or-before each event within its extrinsic (the
    * reference's mutable `era` variable as a window). `events` needs
    * `section`, `method`, `data`, `event_idx` plus `extrinsicCols`. */
  def attachEra(events: DataFrame,
      extrinsicCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(extrinsicCols.map(col): _*)
      .orderBy(col("event_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("era",
      last(markerEra(col("section"), col("method"), col("data")),
        ignoreNulls = true).over(w))
  }

  /** Reward rows: era-attached reward events with positive amounts
    * (ref indexer.js:3953 "skip the zero payout"). Emits the event's
    * original columns plus `era`, `account_pub` (stash), `amount_raw`.
    * Reward amounts are u128 raw units → DECIMAL(38,0), exact.
    * `staking.Slashed` amounts negate first (chainparser.js:4094), so
    * the positive filter drops them exactly like the reference's
    * `value > 0` skip — end-to-end output identical, sign semantics
    * preserved for per-chain parsers that relax the filter. */
  def rewardRows(events: DataFrame,
      extrinsicCols: Seq[String]): DataFrame =
    attachEra(events, extrinsicCols)
      .filter(isRewardEvent(col("section"), col("method")))
      .withColumn("account_pub", coalesce(
        get_json_object(col("data"), "$.stash"),
        get_json_object(col("data"), "$.account")))
      .withColumn("amount_raw",
        coalesce(
          get_json_object(col("data"), "$.amount"),
          get_json_object(col("data"), "$.value"))
          .cast("decimal(38,0)") *
          when(col("section") === "staking" &&
            col("method") === "Slashed", lit(-1)).otherwise(lit(1)))
      .filter(col("amount_raw") > 0)

  /** Crowdloan rows: one row per (extrinsic, account, fund) pairing the
    * last `Contributed` amount with the last `MemoUpdated` memo
    * (ref indexer.js:4018-4055 — the accountParaID map; last write wins
    * on duplicate emits, memo-only rows keep amount 0).
    *
    * `remarks` (optional) carries the extrinsic's `system.remark`
    * texts — (extrinsicCols…, `remark_idx`, `remark`) — and replays
    * the reference's remark-contribution branch (indexer.js:4043-4055
    * remarkIndex walk): memo-LESS pairs take the extrinsic's remarks
    * POSITIONALLY, in pair order, leftover pairs keep a null remark.
    * Both sides number inside one extrinsic, so the windows are
    * bounded like [[attachEra]]'s. */
  def crowdloanRows(events: DataFrame,
      extrinsicCols: Seq[String],
      remarks: Option[DataFrame] = None): DataFrame = {
    val cl = events
      .filter(col("section") === "crowdloan" &&
        col("method").isin("Contributed", "MemoUpdated"))
      .withColumn("account_pub", get_json_object(col("data"), "$.who"))
      .withColumn("fund_id", coalesce(
        get_json_object(col("data"), "$.fundIndex"),
        get_json_object(col("data"), "$.paraId")).cast("long"))
    val keys = extrinsicCols ++ Seq("account_pub", "fund_id")
    val paired = cl.groupBy(keys.map(col): _*)
      .agg(
        min(col("event_idx")).as("event_idx"),
        max_by(
          when(col("method") === "Contributed",
            get_json_object(col("data"), "$.amount")
              .cast("decimal(38,0)")),
          when(col("method") === "Contributed", col("event_idx")))
          .as("amount_raw"),
        max_by(
          when(col("method") === "MemoUpdated",
            get_json_object(col("data"), "$.memo")),
          when(col("method") === "MemoUpdated", col("event_idx")))
          .as("memo"))
      .withColumn("amount_raw",
        coalesce(col("amount_raw"), lit(0).cast("decimal(38,0)")))
    remarks match {
      case None => paired.withColumn("remark", lit(null).cast("string"))
      case Some(rm) =>
        val w = Window.partitionBy(extrinsicCols.map(col): _*)
        val memoless = paired.filter(col("memo").isNull)
          .withColumn("_rn",
            row_number().over(w.orderBy(col("event_idx"))))
        val rmIdx = rm
          .withColumn("_rn",
            row_number().over(w.orderBy(col("remark_idx"))))
          .select((extrinsicCols.map(col) :+ col("_rn") :+
            col("remark")): _*)
        memoless.join(rmIdx, extrinsicCols :+ "_rn", "left").drop("_rn")
          .unionByName(paired.filter(col("memo").isNotNull)
            .withColumn("remark", lit(null).cast("string")))
    }
  }
}
