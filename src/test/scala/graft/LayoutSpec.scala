package graft

import graft.etl.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout checks: the bucketed join must plan with zero
  * shuffles; salted aggregation must match the direct aggregation. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucketed tables join without any Exchange") {
    val li = Tables.lineitem(spark, SparkTestBase.sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, SparkTestBase.sf)
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(
      o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", "l_orderkey", 8)
    // Model the at-scale case (neither side broadcastable): with the
    // broadcast path off, the bucketed layout must sort-merge join with
    // zero shuffle Exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // and the result matches the unbucketed join
      val expect = li.join(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
        .count()
      assert(joined.count() == expect)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("count_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = Layout.saltedAgg(ev, "event_type", 8,
        Seq(("value", "count"), ("value", "min"), ("value", "max")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted == direct)
  }
}
