package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DEX router price resolution (ref query.js `computePriceUSD` +
  * priceManager.js `getPathExtensions`/`getRouterPaths`,
  * testRouterPools.js): a token's quote price comes from the best
  * routed path through constant-product pools — directly against the
  * quote asset, or via one intermediate hop, with the deepest path
  * winning (the reference bounds path search at depth 2 the same way:
  * `maxDepth = 2`).
  *
  * Semantics: a pool (tokenA, tokenB, reserveA, reserveB) prices
  * A→B at the spot ratio reserveB/reserveA. A 2-hop path multiplies
  * spot ratios; its liquidity score is the bottleneck depth
  * least(hop1 dst reserve, hop2 dst reserve). Best path per token =
  * max liquidity, ties broken on (price, via) for determinism.
  *
  * Scale notes: pools are a dimension (thousands of rows at most) —
  * the 2-hop join is dimension×dimension and broadcast-friendly; the
  * expensive side (pricing a large holdings/transfer table) is then
  * ONE broadcast join against the resolved price map.
  */
object DexRouter {

  /** Undirected pools → directed priced edges (both orientations). */
  def edges(pools: DataFrame): DataFrame = {
    val fwd = pools.select(col("token_a").as("src"),
      col("token_b").as("dst"), col("reserve_a").as("rs"),
      col("reserve_b").as("rd"))
    val rev = pools.select(col("token_b").as("src"),
      col("token_a").as("dst"), col("reserve_b").as("rs"),
      col("reserve_a").as("rd"))
    fwd.unionByName(rev).filter(col("rs") > 0 && col("rd") > 0)
  }

  /** Price a (large) holdings frame against the resolved price map —
    * the scale-side consumer of [[bestQuotePath]]: the pool graph and
    * its resolution are dimension-sized, so the price map BROADCASTS
    * and the holdings scan never shuffles. Unpriced tokens keep null
    * (the caller decides whether unpriced = drop or audit). */
  def priceHoldings(holdings: DataFrame, pools: DataFrame,
      quote: String): DataFrame = {
    val prices = bestQuotePath(pools, quote)
      .select(col("token"), col("price"))
    holdings.join(broadcast(prices), Seq("token"), "left")
      .withColumn("value_quote", col("amount") * col("price"))
  }

  /** Best quote-asset price per token via ≤ 2 hops.
    * Returns (token, price, liquidity, hops, via). */
  def bestQuotePath(pools: DataFrame, quote: String): DataFrame = {
    val e = edges(pools)
    val direct = e.filter(col("dst") === quote)
      .select(col("src").as("token"),
        (col("rd") / col("rs")).as("price"),
        col("rd").as("liquidity"),
        lit(1).as("hops"), lit("").as("via"))
    val leg1 = e.filter(col("dst") =!= quote)
      .select(col("src").as("token"), col("dst").as("mid"),
        (col("rd") / col("rs")).as("p1"), col("rd").as("l1"))
    val leg2 = e.filter(col("dst") === quote)
      .select(col("src").as("mid"), (col("rd") / col("rs")).as("p2"),
        col("rd").as("l2"))
    val twoHop = leg1.join(leg2, Seq("mid"))
      .filter(col("token") =!= quote)
      .select(col("token"), (col("p1") * col("p2")).as("price"),
        least(col("l1"), col("l2")).as("liquidity"),
        lit(2).as("hops"), col("mid").as("via"))
    val w = Window.partitionBy(col("token"))
      .orderBy(col("liquidity").desc, col("price"), col("via"))
    direct.unionByName(twoHop)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }
}
