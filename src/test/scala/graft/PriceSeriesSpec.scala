package graft

import graft.analytics.PriceSeries
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Golden cases per FIXTURES.md §11: two routers at the same ts with
  * different liquidity (most-liquid tie-break), a missing bucket (as-of
  * must carry the last prior price), OHLCV resampling. */
class PriceSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  private val H = 3600L

  // 5-min-aligned price log for one asset on one chain
  private lazy val priceLog = Seq(
    // index_ts,    price, liquid, router, low, high, t0vol, t1vol
    (ts(0),        10.0, 1, "rA", 9.5, 10.5, 100.0, 10.0),
    (ts(0),        99.0, 2, "rB", 98.0, 99.5, 1.0, 0.1), // less liquid decoy
    (ts(300),      11.0, 1, "rA", 10.5, 11.5, 50.0, 5.0),
    (ts(3 * H),    20.0, 1, "rA", 19.0, 21.0, 10.0, 1.0)
    // note: hours 1-2 missing entirely (as-of must bridge the gap)
  ).map { case (t, p, lq, r, lo, hi, v0, v1) =>
    ("DOT", 0, t, p, lq, r, lo, hi, v0, v1)
  }.toDF("asset", "chain_id", "index_ts", "price_usd", "liquid",
    "router_asset_chain", "low", "high", "token0_volume", "token1_volume")

  test("most-liquid tie-break keeps min liquid per ts") {
    val out = PriceSeries.mostLiquid(priceLog)
      .filter($"index_ts" === ts(0))
      .select("price_usd", "router_asset_chain").collect()
    assert(out.length == 1)
    assert(out(0).getDouble(0) == 10.0 && out(0).getString(1) == "rA")
  }

  test("hourly OHLCV resample") {
    val out = PriceSeries.resample(PriceSeries.mostLiquid(priceLog), "1 hour")
      .orderBy("bucket_ts").collect()
    assert(out.length == 2) // hour 0 and hour 3; empty hours absent
    val h0 = out(0)
    assert(h0.getAs[Double]("open") == 10.0)
    assert(h0.getAs[Double]("close") == 11.0)
    assert(h0.getAs[Double]("low") == 9.5)
    assert(h0.getAs[Double]("high") == 11.5)
    assert(h0.getAs[Double]("token0_volume") == 150.0)
    assert(h0.getAs[Long]("n_points") == 2)
  }

  test("as-of USD decoration bridges gaps and respects equal-ts prices") {
    val events = Seq(
      ("DOT", 0, ts(300), "e1", 2.0),   // price stamped at same ts → 11
      ("DOT", 0, ts(2 * H), "e2", 3.0), // inside the gap → last = 11
      ("DOT", 0, ts(4 * H), "e3", 1.0), // after hour-3 point → 20
      ("DOT", 1, ts(4 * H), "e4", 1.0)  // other chain: no prices → null
    ).toDF("asset", "chain_id", "ts", "event_id", "amount")
    val out = PriceSeries.decorateUsd(events,
        PriceSeries.mostLiquid(priceLog))
      .select("event_id", "price_usd", "amount_usd").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("e1") == (Some(11.0), Some(22.0)))
    assert(out("e2") == (Some(11.0), Some(33.0)))
    assert(out("e3") == (Some(20.0), Some(20.0)))
    assert(out("e4") == (None, None))
  }
}
