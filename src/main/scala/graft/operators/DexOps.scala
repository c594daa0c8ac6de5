package graft.operators

import graft.Tables
import graft.analytics.DexRouter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DEX router-price query face (the testRouterPools.js /
  * computePriceUSD capability). A deterministic pool graph is derived
  * from `events` — identically in the DuckDB oracle — with three tiers:
  * direct (T_i, USDC) pools, (T_i, M_j) feeder pools, (M_j, USDC)
  * intermediate pools, plus non-quote noise pairs; best-path
  * resolution (≤ 2 hops, deepest-liquidity wins) is then hash-verified
  * cross-engine.
  */
object DexOps {

  // R1 — routed quote price per token.
  // Pool derivation (mirrored in SQL): events with user_id < 100;
  // kind = e%5: 0 → (T, USDC); 1,2 → (T, M); 3 → (M, USDC); 4 → (T, T)
  // noise. T = T1..T30 (e%30+1), M = M1..M4 (e%4+1);
  // reserve_a = |value|+1, reserve_b = (|value|+1)·((e%13)+1)/7.
  // One pool per (token_a, token_b) — first event wins.
  private def r1(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("user_id") < 100)
      .select(col("event_id").as("e"), abs(col("value")).as("av"))
    val kind = col("e") % 5
    val tTok = concat(lit("T"), ((col("e") % 30) + 1).cast("string"))
    val mTok = concat(lit("M"), ((col("e") % 4) + 1).cast("string"))
    val raw = ev.select(col("e"),
      when(kind === 3, mTok).otherwise(tTok).as("token_a"),
      when(kind === 0 || kind === 3, lit("USDC"))
        .when(kind === 4,
          concat(lit("T"), ((col("e") % 9) + 21).cast("string")))
        .otherwise(mTok).as("token_b"),
      (col("av") + 1).as("reserve_a"),
      (((col("av") + 1) * (((col("e") % 13) + 1).cast("double"))) / 7.0)
        .as("reserve_b"))
      .filter(col("token_a") =!= col("token_b"))
    val w = Window.partitionBy(col("token_a"), col("token_b"))
      .orderBy(col("e"))
    val pools = raw.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("token_a"), col("token_b"), col("reserve_a"),
        col("reserve_b"))
    DexRouter.bestQuotePath(pools, "USDC")
      .select(col("token"), round(col("price"), 6).as("price"),
        round(col("liquidity"), 6).as("liquidity"), col("hops"),
        col("via"))
      .orderBy(col("token"))
  }

  private val r1Sql =
    """WITH ev AS (SELECT event_id AS e, abs("value") AS av FROM events
      |  WHERE user_id < 100),
      |raw AS (SELECT e,
      |  CASE WHEN e % 5 = 3 THEN 'M' || CAST((e % 4) + 1 AS VARCHAR)
      |       ELSE 'T' || CAST((e % 30) + 1 AS VARCHAR) END AS token_a,
      |  CASE WHEN e % 5 = 0 OR e % 5 = 3 THEN 'USDC'
      |       WHEN e % 5 = 4 THEN 'T' || CAST((e % 9) + 21 AS VARCHAR)
      |       ELSE 'M' || CAST((e % 4) + 1 AS VARCHAR) END AS token_b,
      |  av + 1 AS reserve_a,
      |  ((av + 1) * CAST((e % 13) + 1 AS DOUBLE)) / 7.0 AS reserve_b
      | FROM ev),
      |pools AS (SELECT token_a, token_b, reserve_a, reserve_b FROM (
      |  SELECT raw.*, row_number() OVER (PARTITION BY token_a, token_b
      |   ORDER BY e) AS rn FROM raw WHERE token_a <> token_b)
      | WHERE rn = 1),
      |edges AS (
      | SELECT token_a AS src, token_b AS dst, reserve_a AS rs,
      |  reserve_b AS rd FROM pools
      | UNION ALL
      | SELECT token_b, token_a, reserve_b, reserve_a FROM pools),
      |e AS (SELECT * FROM edges WHERE rs > 0 AND rd > 0),
      |direct AS (SELECT src AS token, rd / rs AS price, rd AS liquidity,
      |  1 AS hops, '' AS via FROM e WHERE dst = 'USDC'),
      |leg1 AS (SELECT src AS token, dst AS mid, rd / rs AS p1, rd AS l1
      | FROM e WHERE dst <> 'USDC'),
      |leg2 AS (SELECT src AS mid, rd / rs AS p2, rd AS l2
      | FROM e WHERE dst = 'USDC'),
      |twohop AS (SELECT token, p1 * p2 AS price, least(l1, l2) AS liquidity,
      |  2 AS hops, mid AS via
      | FROM leg1 JOIN leg2 USING (mid) WHERE token <> 'USDC'),
      |best AS (SELECT * FROM (
      |  SELECT *, row_number() OVER (PARTITION BY token
      |   ORDER BY liquidity DESC, price, via) AS rn
      |  FROM (SELECT * FROM direct UNION ALL SELECT * FROM twohop))
      | WHERE rn = 1)
      |SELECT token, round(price, 6) AS price,
      | round(liquidity, 6) AS liquidity, hops, via
      |FROM best ORDER BY token""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_router_price" -> (r1 _),
  )

  val oracles: Map[String, String] = Map(
    "r1_router_price" -> r1Sql,
  )
}
