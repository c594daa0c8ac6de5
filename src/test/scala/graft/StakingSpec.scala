package graft

import graft.analytics.StakingAnalytics
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Golden cases for the staking pipeline per FIXTURES.md §7: 2 eras ×
  * (2 ErasStakers validators, 2 Nominators with targets arrays,
  * 1 BondedPools, 2 PoolMembers). Expected values hand-computed from
  * docs/StakingAnalytics.md formulas. */
case class StakingRow(
      address_pubkey: String, storage: String, era: Int,
      validator_total: Option[Double], validator_own: Option[Double],
      validator_commission: Option[Double],
      validator_reward_points: Option[Int], targets: Option[String],
      nominationpools_id: Option[Int],
      nominationpools_total: Option[Double],
      nominationpools_commission: Option[Double],
      member_bonded: Option[Double])

class StakingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def v(addr: String, era: Int, total: Double, own: Double,
      comm: Double, pts: Int) =
    StakingRow(addr, "ErasStakers", era, Some(total), Some(own),
      Some(comm), Some(pts), None, None, None, None, None)

  private lazy val stakings = Seq(
    v("0xv1", 10, 1000.0, 100.0, 0.10, 60),
    v("0xv2", 10, 3000.0, 300.0, 0.00, 40),
    v("0xv1", 11, 1100.0, 100.0, 0.10, 50),
    v("0xv2", 11, 2900.0, 300.0, 0.00, 50),
    StakingRow("0xn1", "Nominators", 10, None, None, None, None,
      Some("""["0xv1","0xv2"]"""), None, None, None, Some(200.0)),
    StakingRow("0xn2", "Nominators", 10, None, None, None, None,
      Some("""["0xv2"]"""), None, None, None, Some(500.0)),
    StakingRow("0xpool1", "BondedPools", 10, None, None, None, None,
      None, Some(1), Some(1000.0), Some(0.05), None),
    StakingRow("0xm1", "PoolMembers", 10, None, None, None, None,
      None, Some(1), None, None, Some(250.0)),
    StakingRow("0xm2", "PoolMembers", 10, None, None, None, None,
      None, Some(1), None, None, Some(750.0)),
    StakingRow("0xm1", "PoolMembers", 11, None, None, None, None,
      None, Some(1), None, None, Some(400.0))
  ).toDF()

  test("era aggregates: totals, counts, sorted validator list") {
    val out = StakingAnalytics.eraAggregates(stakings)
      .orderBy("era").collect()
    assert(out.length == 2)
    val e10 = out(0)
    assert(e10.getAs[Int]("era") == 10)
    assert(e10.getAs[Long]("n_validators") == 2)
    assert(e10.getAs[Double]("era_total_staked") == 4000.0)
    assert(e10.getAs[Long]("era_reward_points") == 100)
    assert(e10.getAs[scala.collection.Seq[String]]("validators")
      .toSeq == Seq("0xv1", "0xv2"))
  }

  test("validator augmentation: reward share") {
    val out = StakingAnalytics.validatorAugmented(stakings)
      .filter($"era" === 10)
      .select("address_pubkey", "reward_share").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("0xv1") == 0.6)
    assert(out("0xv2") == 0.4)
  }

  test("nominator edges explode targets") {
    val edges = StakingAnalytics.nominatorEdges(stakings)
      .select("nominator", "validator").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges == Set(("0xn1", "0xv1"), ("0xn1", "0xv2"),
      ("0xn2", "0xv2")))
  }

  test("nominator augmentation: estimated share") {
    val out = StakingAnalytics.nominatorAugmented(stakings)
      .filter($"nominator" === "0xn1" && $"validator" === "0xv1")
      .select("est_share").collect()
    // 200/1000 × 0.6 × (1−0.10) = 0.108
    assert(math.abs(out(0).getDouble(0) - 0.108) < 1e-12)
  }

  test("pool members: share of pool") {
    val out = StakingAnalytics.poolMembers(stakings)
      .filter($"era" === 10)
      .select("address_pubkey", "pool_share").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("0xm1" -> 0.25, "0xm2" -> 0.75))
  }

  test("member bond deltas via LAG") {
    val out = StakingAnalytics.memberBondDeltas(stakings)
      .filter($"address_pubkey" === "0xm1")
      .orderBy("era")
      .select("era", "bond_delta").collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(out == Seq((10, 250.0), (11, 150.0)))
  }
}
