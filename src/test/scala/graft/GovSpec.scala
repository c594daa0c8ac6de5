package graft

import graft.analytics.GovAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed conviction-tally golden cases (testConviction.js
  * semantics): vote-byte decode, conviction weights, delegation applied
  * per referendum to the target's standard votes, split/splitAbstain at
  * 0.1× with no delegations.
  */
class GovSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("tally applies conviction weights and delegations per referendum") {
    val standard = Seq(
      // voter 1: aye at Locked1x on poll 1, aye at None (0.1x) on poll 2
      (1L, 0L, 1L, 129L, 100.0),
      (1L, 0L, 2L, 128L, 100.0),
      // voter 2: nay at Locked2x on poll 1
      (2L, 0L, 1L, 2L, 50.0)
    ).toDF("voter", "track", "poll", "vote_byte", "balance")
    val splits = Seq(
      (3L, 1L, 5L, 10.0, 20.0, 30.0)
    ).toDF("voter", "track", "poll", "aye", "nay", "abstain")
    val delegations = Seq(
      // 40 balance at 3x to voter 1 on track 0: lands on BOTH of
      // voter 1's standard votes (polls 1 and 2)
      (10L, 0L, 1L, 40.0, 3.0)
    ).toDF("delegator", "track", "target", "balance", "weight")

    val out = GovAnalytics.tallyReferenda(standard, splits, delegations)
      .orderBy(col("track"), col("poll"))
      .select(col("track"), col("poll"), col("n_votes"),
        col("ayes").cast("double"), col("nays").cast("double"),
        col("abstains").cast("double"), col("capital").cast("double"),
        col("delegated_votes").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))

    assert(out.toSeq == Seq(
      // poll 1: ayes = 100*1 + 120 delegated; nays = 50*2;
      // capital = 100 + 40 + 50
      (0L, 1L, 2L, 220.0, 100.0, 0.0, 190.0, 120.0),
      // poll 2: ayes = 100*0.1 + 120 delegated; capital = 100 + 40
      (0L, 2L, 1L, 130.0, 0.0, 0.0, 140.0, 120.0),
      // split/splitAbstain at 0.1x, no delegation
      (1L, 5L, 1L, 1.0, 2.0, 3.0, 60.0, 0.0)))
  }

  test("delegation to a non-voting target has no tally effect") {
    val standard = Seq((1L, 0L, 1L, 129L, 100.0))
      .toDF("voter", "track", "poll", "vote_byte", "balance")
    val splits = Seq.empty[(Long, Long, Long, Double, Double, Double)]
      .toDF("voter", "track", "poll", "aye", "nay", "abstain")
    val delegations = Seq(
      (10L, 0L, 99L, 40.0, 3.0), // target 99 never voted
      (11L, 2L, 1L, 40.0, 3.0)   // right target, wrong track
    ).toDF("delegator", "track", "target", "balance", "weight")
    val out = GovAnalytics.tallyReferenda(standard, splits, delegations)
      .select(col("ayes").cast("double"),
        col("delegated_votes").cast("double")).collect()
    assert(out.length == 1)
    assert(out(0).getDouble(0) == 100.0)
    assert(out(0).getDouble(1) == 0.0)
  }
}
