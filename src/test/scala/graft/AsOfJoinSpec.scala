package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** The native as-of join must agree with the composable union+window
  * form on real data, handle tolerance/empty/unmatched edges, and plan
  * as a co-partitioned merge (one exchange per side, no range blow-up). */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("agrees with the union+window as-of (j16) on the events table") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
        col("value").as("view_value"))
      .withColumnRenamed("v_user_id", "user_id")
    val native = AsOfJoin.asof(purchases, views, Seq("user_id"),
        "ts", "v_ts")
      .select(col("event_id"), col("view_value"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // reference implementation: the oracle-checked j16 query
    val windowed = graft.operators.JoinOps
      .queries("j16_asof_join")(spark, SparkTestBase.sf)
      .collect().map(r => r.getLong(1) -> Option(r.get(2))).toMap
    assert(native.size == windowed.size)
    // j16 treats a view at the exact same (ts, event_id) tuple as prior;
    // as-of uses rightTime <= leftTime — identical unless a view and a
    // purchase share a timestamp exactly (none in this dataset)
    assert(native == windowed)
  }

  test("tolerance bounds the lookback") {
    val trades = Seq((1, 100L, ts(1000)), (1, 101L, ts(5000)))
      .toDF("k", "trade_id", "t_ts")
    val quotes = Seq((1, 9.0, ts(900)), (1, 11.0, ts(990)))
      .toDF("k", "px", "q_ts")
    val all = AsOfJoin.asof(trades, quotes, Seq("k"), "t_ts", "q_ts")
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(all == Map(100L -> Some(11.0), 101L -> Some(11.0)))
    val tight = AsOfJoin.asof(trades, quotes, Seq("k"), "t_ts", "q_ts",
        toleranceUs = Some(60L * 1000000L))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // trade 101 is 4010 s after the last quote → outside 60 s tolerance
    assert(tight == Map(100L -> Some(11.0), 101L -> None))
  }

  test("unmatched keys and empty right side keep left rows with nulls") {
    val l = Seq((1, 10L, ts(100)), (2, 20L, ts(100)))
      .toDF("k", "id", "l_ts")
    val r = Seq((1, 1.5, ts(50))).toDF("k", "v", "r_ts")
    val out = AsOfJoin.asof(l, r, Seq("k"), "l_ts", "r_ts")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(out == Map(10L -> Some(1.5), 20L -> None))
    val empty = r.filter(col("k") === 999)
    val out2 = AsOfJoin.asof(l, empty, Seq("k"), "l_ts", "r_ts")
    assert(out2.count() == 2 &&
      out2.filter(col("v").isNotNull).count() == 0)
  }

  test("latest-of-several and future quotes excluded") {
    val l = Seq((1, 10L, ts(1000))).toDF("k", "id", "l_ts")
    val r = Seq((1, 1.0, ts(100)), (1, 2.0, ts(500)), (1, 3.0, ts(999)),
      (1, 99.0, ts(1001))).toDF("k", "v", "r_ts")
    val out = AsOfJoin.asof(l, r, Seq("k"), "l_ts", "r_ts")
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(3.0)) // latest prior, not first, not future
  }

  test("NULL join keys never match (SQL equi-join semantics)") {
    val l = Seq((Option(1), 10L, ts(100)), (Option.empty[Int], 11L, ts(100)),
        (Option(2), 12L, ts(100)))
      .toDF("k", "id", "l_ts")
    val r = Seq((Option(1), 1.5, ts(50)), (Option.empty[Int], 9.9, ts(50)),
        (Option.empty[Int], 8.8, ts(60)))
      .toDF("k", "v", "r_ts")
    val out = AsOfJoin.asof(l, r, Seq("k"), "l_ts", "r_ts")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // null-keyed left row matches nothing; null-keyed right rows are
    // invisible (DuckDB ASOF equi-join never matches on NULL)
    assert(out == Map(10L -> Some(1.5), 11L -> None, 12L -> None))
  }

  test("pre-partitioned key-subset input still agrees with window form") {
    // Hazard: a child already hash-partitioned on a strict SUBSET of the
    // join keys satisfies ClusteredDistribution without being
    // co-partitioned with the other side — silent wrong answers if
    // EnsureRequirements doesn't align both children.
    val l = Seq((1, 1, 100L, ts(100)), (1, 2, 101L, ts(200)),
        (2, 1, 102L, ts(300)), (2, 2, 103L, ts(400)))
      .toDF("k1", "k2", "id", "l_ts")
      .repartition(4, col("k1")) // subset of (k1, k2)!
    val r = Seq((1, 1, 1.0, ts(50)), (1, 2, 2.0, ts(150)),
        (2, 1, 3.0, ts(250)), (2, 2, 4.0, ts(350)),
        (2, 2, 5.0, ts(401))) // future for id=103
      .toDF("k1", "k2", "v", "r_ts")
      // SAME partition count, DIFFERENT key subset: each side satisfies
      // its ClusteredDistribution, so no exchange is forced — the exact
      // configuration where misaligned children would silently mismatch
      .repartition(4, col("k2"))
    val native = AsOfJoin.asof(l, r, Seq("k1", "k2"), "l_ts", "r_ts")
      .select("id", "v").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(native == Map(100L -> Some(1.0), 101L -> Some(2.0),
      102L -> Some(3.0), 103L -> Some(4.0)))
  }

  test("plans as a co-partitioned merge (no range explosion)") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    val l = ev.select(col("user_id"), col("event_id"), col("ts"))
    val r = ev.select(col("user_id").as("r_user"), col("ts").as("r_ts"),
      col("value")).withColumnRenamed("r_user", "user_id")
    val df = AsOfJoin.asof(l, r, Seq("user_id"), "ts", "r_ts")
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("AsOfJoin")) // TreeNode prints without "Exec"
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert(df.count() == l.count()) // exactly one output row per left row
  }
}
