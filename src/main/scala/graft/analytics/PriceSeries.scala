package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price/OHLCV time series + as-of USD valuation — SURVEY M5 (A12, J16,
  * W4, Q6/Q7) on the domain `assetpricelog` schema (FIXTURES.md §11).
  *
  * Scale notes: resampling is a groupBy on (asset, chain_id, bucket);
  * the as-of join is the union+last(ignoreNulls) window form — one
  * shuffle on the asset key, state bounded by the series length, no
  * range-join explosion. Both shapes hold at 10⁹-row price logs because
  * the partition key carries the asset.
  */
object PriceSeries {

  /** Most-liquid price per timestamp (ref query.js:2080-2086: keep the
    * min-`liquid` row per indexTS per asset — W4). */
  def mostLiquid(priceLog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset"), col("chain_id"), col("index_ts"))
      .orderBy(col("liquid"), col("router_asset_chain"))
    priceLog.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Resample the 5-min log to a coarser bucket with OHLCV semantics
    * (ref query.js:2034-2149: `indexTS % {300,3600,86400} = 0` sampling +
    * OHLCV reader; A12 struct-argmin open/close). */
  def resample(priceLog: DataFrame, bucket: String): DataFrame =
    priceLog
      .groupBy(col("asset"), col("chain_id"),
        window(col("index_ts"), bucket).getField("start").as("bucket_ts"))
      .agg(
        min(struct(col("index_ts"), col("router_asset_chain"),
          col("price_usd"))).getField("price_usd").as("open"),
        max(struct(col("index_ts"), col("router_asset_chain"),
          col("price_usd"))).getField("price_usd").as("close"),
        min(col("low")).as("low"),
        max(col("high")).as("high"),
        sum(col("token0_volume")).as("token0_volume"),
        sum(col("token1_volume")).as("token1_volume"),
        count(lit(1)).as("n_points"))

  /** As-of USD decoration (ref assetManager.js:1392 computePriceUSD —
    * J16): for each event row (asset, chain_id, ts, amount), attach the
    * last price at-or-before ts and compute amount_usd. Union+window —
    * the scalable as-of form. */
  def decorateUsd(events: DataFrame, priceLog: DataFrame): DataFrame = {
    val prices = priceLog.select(
      col("asset"), col("chain_id"), col("index_ts").as("ts"),
      lit(null).cast("string").as("event_id"),
      lit(null).cast("double").as("amount"),
      col("price_usd").as("px"), lit(0).as("is_event"))
    val evs = events.select(
      col("asset"), col("chain_id"), col("ts"),
      col("event_id"), col("amount"),
      lit(null).cast("double").as("px"), lit(1).as("is_event"))
    // at equal ts the price sorts first (is_event 0 < 1) → an event picks
    // up a price stamped at its own timestamp, like the reference's
    // cache lookup
    val wSelf = Window.partitionBy(col("asset"), col("chain_id"))
      .orderBy(col("ts"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, 0)
    prices.unionByName(evs)
      .withColumn("asof_px",
        last(col("px"), ignoreNulls = true).over(wSelf))
      .filter(col("is_event") === 1)
      .select(col("asset"), col("chain_id"), col("ts"), col("event_id"),
        col("amount"), col("asof_px").as("price_usd"),
        (col("amount") * col("asof_px")).as("amount_usd"))
  }

  /** The price log as half-open validity intervals — one row per
    * (asset, chain_id, index_ts) with `px_until` = the next point's
    * timestamp (null for the latest). Duplicate points at one
    * timestamp resolve by the reference's MOST-LIQUID convention when
    * the log carries the `liquid` column ([[mostLiquid]], ref
    * query.js:2080-2086 — a thin-router outlier must not win), and by
    * max price otherwise (a deterministic tiebreak for bare
    * (asset, chain_id, index_ts, price_usd) slices). Dim-only window:
    * rows = price points, never facts. */
  def asOfIntervals(priceLog: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("asset"), col("chain_id"))
      .orderBy(col("index_ts"))
    // ONE dim-side exchange (round 19, guide §2.4): hash(asset)
    // clusters the per-point dedup (keys ⊇ asset) AND the interval
    // lead window (partition ⊇ asset), so both ride this exchange
    // instead of shuffling the log twice — every usd-decorated dump
    // re-plans this subtree per write job, so the saving multiplies
    // across the dump family. Deliberately asset ALONE: callers pass
    // literal chain_ids that constant-fold, and a folded key in the
    // repartition breaks the subset-satisfaction match that elides
    // the downstream exchanges (measured: (asset, chain_id) ADDED an
    // exchange on p9). Co-locating all chains of an asset is fine at
    // dim scale — the log is bounded by series count × points.
    val byKey = priceLog.repartition(col("asset"))
    val deduped =
      if (priceLog.columns.contains("liquid"))
        mostLiquid(byKey)
          .select(col("asset"), col("chain_id"), col("index_ts"),
            col("price_usd"))
      else byKey
        .groupBy(col("asset"), col("chain_id"), col("index_ts"))
        .agg(max(col("price_usd")).as("price_usd"))
    deduped.withColumn("px_until", lead(col("index_ts"), 1).over(w))
  }

  /** As-of USD price decoration of a FULL-WIDTH fact frame — the dump
    * wiring of J16 (ref substrateetl.js:6342-6372 exported-table
    * decoration via assetManager.js:1392 computePriceUSD): appends
    * `price_usd` (the last price at-or-before `tsCol` for the row's
    * (asset, chain_id)) to every row, preserving all columns.
    *
    * Unlike [[decorateUsd]]'s union+window (which shuffles the facts on
    * the asset key — a skew point when one asset dominates a day), this
    * is the [[graft.decode.TraceDecode.withSpecVersion]] shape: the
    * price log converts to validity intervals dim-side and BROADCASTS,
    * so the (enormous) fact side flows through a broadcast hash join on
    * (asset, chain_id) with the interval predicate as residual — no
    * fact shuffle, no skew, codegen throughout. Intervals partition the
    * time line, so each fact matches at most once; facts before the
    * first point (or with an unpriced asset) keep a null price_usd.
    * Probe cost is O(points per asset) per row — pass the day's (or
    * window's) slice of the log, which is what the daily dump has. */
  def withAsOfPrice(df: DataFrame, priceLog: DataFrame,
      tsCol: String = "block_time"): DataFrame =
    withAsOfIntervals(df, asOfIntervals(priceLog), tsCol)

  /** [[withAsOfPrice]] over an ALREADY-BUILT intervals dim (the
    * [[asOfIntervals]] output shape) — the multi-table dump path
    * (round 19): a day dump decorates several tables off one price
    * log, and deriving the intervals inside each write job re-ran the
    * dedup+window subtree once per table; callers that hold a
    * [[graft.etl.Dump.UsdDims]] pass its one materialized dim
    * instead. */
  def withAsOfIntervals(df: DataFrame, intervals: DataFrame,
      tsCol: String = "block_time"): DataFrame = {
    require(!df.columns.contains("price_usd"),
      "frame already carries price_usd — drop or rename it first")
    val iv = intervals.select(
      col("asset").as("_px_asset"), col("chain_id").as("_px_chain"),
      col("index_ts").as("_px_from"), col("px_until").as("_px_until"),
      col("price_usd"))
    df.join(broadcast(iv),
        col("asset") === col("_px_asset") &&
          col("chain_id") === col("_px_chain") &&
          col(tsCol) >= col("_px_from") &&
          (col("_px_until").isNull || col(tsCol) < col("_px_until")),
        "left")
      .drop("_px_asset", "_px_chain", "_px_from", "_px_until")
  }
}
