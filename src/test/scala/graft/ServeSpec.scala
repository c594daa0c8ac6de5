package graft

import graft.serve.Serve
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Serving-layer semantics over dump-layout tables (Q1/Q2/Q4/Q9 of
  * SURVEY §2.10), incl. keyset pagination continuity. */
class ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val blocks = Seq(
    (0, 100L, "0xb100"), (0, 101L, "0xb101"), (2000, 7L, "0xk7")
  ).toDF("chain_id", "number", "hash")

  private lazy val extrinsics = Seq(
    (0, 100L, "100-0", "0xe0"), (0, 100L, "100-1", "0xe1"),
    (0, 101L, "101-0", "0xe2")
  ).toDF("chain_id", "block_number", "extrinsic_id", "hash")

  private lazy val transfers = Seq(
    (0, "a", "b", ts("2024-03-01 10:00:00"), "100-1", 1.0),
    (0, "b", "a", ts("2024-03-01 11:00:00"), "101-0", 2.0),
    (2000, "a", "c", ts("2024-03-02 00:30:00"), "7-0", 3.0)
  ).toDF("chain_id", "from_pub_key", "to_pub_key", "block_time",
    "extrinsic_id", "amount")

  test("getBlock returns the block with its extrinsics") {
    val out = Serve.getBlock(blocks, extrinsics, 0, 100L)
    assert(out.count() == 2)
    assert(out.select("hash").distinct().count() == 1)
  }

  test("account timeline: desc order, chain filter, keyset pagination") {
    val page1 = Serve.accountTimeline(transfers, "a", None, 2, None)
      .select("extrinsic_id").collect().map(_.getString(0)).toSeq
    assert(page1 == Seq("7-0", "101-0")) // newest first
    val lastUs = Serve.accountTimeline(transfers, "a", None, 2, None)
      .select(unix_micros(col("block_time"))).collect().last.getLong(0)
    val page2 = Serve.accountTimeline(transfers, "a", None, 2, Some(lastUs))
      .select("extrinsic_id").collect().map(_.getString(0)).toSeq
    assert(page2 == Seq("100-1")) // continues past the keyset, no overlap
    val filtered = Serve.accountTimeline(transfers, "a", Some(Seq(2000)),
      10, None).select("extrinsic_id").collect().map(_.getString(0)).toSeq
    assert(filtered == Seq("7-0"))
  }

  test("searchByHash disambiguates block vs extrinsic hits") {
    val b = Serve.searchByHash(blocks, extrinsics, "0xb101").collect()
    assert(b.length == 1 && b(0).getString(0) == "block")
    val e = Serve.searchByHash(blocks, extrinsics, "0xe1").collect()
    assert(e.length == 1 && e(0).getString(0) == "extrinsic")
    assert(Serve.searchByHash(blocks, extrinsics, "0xnope").count() == 0)
  }

  test("latestActivity keeps one latest row per account") {
    val out = Serve.latestActivity(transfers).collect()
      .map(r => r.getString(0) ->
        (r.getString(2), r.getString(3))).toMap
    assert(out("a") == ("7-0", "out"))   // 2024-03-02 outgoing wins
    assert(out("b") == ("101-0", "out")) // latest of b's two rows
    assert(out("c") == ("7-0", "in"))
  }
}
