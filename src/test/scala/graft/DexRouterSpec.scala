package graft

import graft.analytics.DexRouter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed router-price golden cases (computePriceUSD semantics):
  * spot ratios, 2-hop multiplication, deepest-liquidity path selection,
  * and the degenerate edges (empty reserves, no path).
  */
class DexRouterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pools(rows: (String, String, Double, Double)*) =
    rows.toDF("token_a", "token_b", "reserve_a", "reserve_b")

  test("direct spot, 2-hop product, and depth-based path choice") {
    val p = pools(
      ("A", "USDC", 100.0, 200.0),  // A direct: price 2.0, liq 200
      ("B", "M", 10.0, 20.0),       // B→M: ratio 2.0, liq 20
      ("M", "USDC", 50.0, 25.0),    // M→USDC: ratio 0.5, liq 25
      // A also routes via M at far better depth on leg1, but the
      // bottleneck is leg2's 25 < direct 200 → direct must win
      ("A", "M", 1000.0, 4000.0))
    val out = DexRouter.bestQuotePath(p, "USDC")
      .select("token", "price", "liquidity", "hops", "via").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(out("A") == ((2.0, 200.0, 1, "")))
    // B: only 2-hop: 2.0 * 0.5 = 1.0; bottleneck least(20, 25) = 20
    assert(out("B") == ((1.0, 20.0, 2, "M")))
    // M prices at 0.5 — via the DEEPER 2-hop M→A→USDC (bottleneck 200)
    // rather than its shallow direct pool (liq 25): same price, deeper
    // path wins per the liquidity-first rule
    assert(out("M") == ((0.5, 200.0, 2, "A")))
    // the quote asset itself is not priced, and USDC-side reverse
    // edges don't leak in
    assert(!out.contains("USDC"))
  }

  test("deeper 2-hop beats shallow direct") {
    val p = pools(
      ("A", "USDC", 10.0, 5.0),     // direct but shallow: liq 5
      ("A", "M", 100.0, 300.0),     // ratio 3
      ("M", "USDC", 300.0, 600.0))  // ratio 2, liq 600
    val out = DexRouter.bestQuotePath(p, "USDC")
      .filter(col("token") === "A")
      .select("price", "liquidity", "hops", "via").collect()(0)
    // 2-hop: 3 * 2 = 6, bottleneck least(300, 600) = 300 > direct 5
    assert(out.getDouble(0) == 6.0)
    assert(out.getDouble(1) == 300.0)
    assert(out.getInt(2) == 2)
    assert(out.getString(3) == "M")
  }

  test("holdings valuation broadcasts the price map and keeps unpriced") {
    val p = pools(("A", "USDC", 100.0, 200.0))
    val holdings = Seq(("A", 5.0), ("Z", 7.0)).toDF("token", "amount")
    val out = DexRouter.priceHoldings(holdings, p, "USDC")
      .select("token", "value_quote").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out("A").contains(10.0))
    assert(out("Z").isEmpty) // unpriced survives as null, not dropped
    // the price side must be broadcast: no shuffle of the holdings scan
    val plan = DexRouter.priceHoldings(holdings, p, "USDC")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("zero-reserve pools are excluded; unreachable tokens unpriced") {
    val p = pools(
      ("A", "USDC", 0.0, 100.0),  // dead pool
      ("X", "Y", 10.0, 10.0))     // disconnected from quote
    val out = DexRouter.bestQuotePath(p, "USDC").collect()
    assert(out.isEmpty)
  }
}
