package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.dec6

/** OpenGov conviction-voting analytics (ref
  * substrate/test/testConviction.js:332 `process_voteStates`): decode
  * the vote byte, apply conviction weights, resolve incoming
  * delegations, and tally per (track, referendum).
  *
  * Substrate semantics mirrored here:
  *  - vote byte: bit 7 = direction (≥ 128 aye), low nibble = conviction
  *    (0 → 'None' at 0.1×, 1..6 → Locked1x..6x at 1..6×; the reference
  *    maps the raw `voteIdx % 16`, which this keeps);
  *  - split / splitAbstain votes carry no conviction (0.1×) and receive
  *    no delegations;
  *  - a delegation (delegator, track, target, balance, weight)
  *    contributes balance×weight to WHATEVER standard vote its target
  *    casts on that track, per referendum (delegated capital counts
  *    toward turnout on those referenda too).
  *
  * Scale notes: the delegation side aggregates to one row per
  * (track, target) before joining — the join key cardinality is voters,
  * not delegations, and the tally is a plain hash aggregate on
  * (track, poll). All money flows through DECIMAL(38,6).
  */
object GovAnalytics {

  /** Vote byte → aye? (bit 7 of the SCALE-encoded Vote). */
  def isAye(vb: Column): Column = vb >= 128

  /** Vote byte → conviction multiplier (reference convictionMap). */
  def convictionWeight(vb: Column): Column =
    when(vb % 16 === 0, lit(0.1)).otherwise((vb % 16).cast("double"))

  /** Aggregate incoming delegated power per (track, target):
    * conviction-weighted votes and raw capital, exact-decimal. */
  def delegatedPower(delegations: DataFrame): DataFrame =
    delegations
      .groupBy(col("track"), col("target"))
      .agg(sum(dec6(col("balance") * col("weight"))).as("d_votes"),
        sum(dec6(col("balance"))).as("d_capital"))

  /** Tally per (track, poll).
    *
    * `standard`: (voter, track, poll, vote_byte, balance) — one row per
    * (voter, poll). `splits`: (voter, track, poll, aye, nay, abstain) —
    * the split/splitAbstain amounts. `delegations`: (delegator, track,
    * target, balance, weight).
    *
    * Returns exact-decimal columns (ayes/nays/abstains/capital/
    * delegated_votes) + n_votes; callers render with decOut at the
    * query surface. */
  def tallyReferenda(standard: DataFrame, splits: DataFrame,
      delegations: DataFrame): DataFrame = {
    val dp = delegatedPower(delegations)
    val std = standard
      .join(dp,
        standard("track") === dp("track") &&
          standard("voter") === dp("target"), "left")
      .select(standard("track"), col("poll"),
        (when(isAye(col("vote_byte")),
          dec6(col("balance") * convictionWeight(col("vote_byte"))) +
            coalesce(col("d_votes"), dec6(lit(0.0))))
          .otherwise(dec6(lit(0.0)))).as("ayes"),
        (when(!isAye(col("vote_byte")),
          dec6(col("balance") * convictionWeight(col("vote_byte"))) +
            coalesce(col("d_votes"), dec6(lit(0.0))))
          .otherwise(dec6(lit(0.0)))).as("nays"),
        dec6(lit(0.0)).as("abstains"),
        (dec6(col("balance")) + coalesce(col("d_capital"),
          dec6(lit(0.0)))).as("capital"),
        coalesce(col("d_votes"), dec6(lit(0.0))).as("delegated_votes"))
    val spl = splits.select(col("track"), col("poll"),
      dec6(col("aye") * 0.1).as("ayes"),
      dec6(col("nay") * 0.1).as("nays"),
      dec6(col("abstain") * 0.1).as("abstains"),
      dec6(col("aye") + col("nay") + col("abstain")).as("capital"),
      dec6(lit(0.0)).as("delegated_votes"))
    std.unionByName(spl)
      .groupBy(col("track"), col("poll"))
      .agg(count(lit(1)).as("n_votes"),
        sum(col("ayes")).as("ayes"),
        sum(col("nays")).as("nays"),
        sum(col("abstains")).as("abstains"),
        sum(col("capital")).as("capital"),
        sum(col("delegated_votes")).as("delegated_votes"))
  }
}
