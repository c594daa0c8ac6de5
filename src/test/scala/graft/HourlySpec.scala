package graft

import graft.etl.Hourly
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hourly — the dump_dune_hour export and its continuity audit. The
  * oracle query (w12) pins the audit algebra cross-engine; this spec
  * pins the writer contract (hour slicing, per-table time columns,
  * idempotent (log_dt, hr) overwrite, empty-hour read-back) and the
  * audit's dedup guard the query frame cannot exercise.
  */
class HourlySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)
  // 2024-03-01 00:00:00 UTC
  private val H0 = 1709251200L

  test("dumpDuneHour: hour slice, tsCols routing, replace, empty hour") {
    val blocks = Seq(
      (100L, ts(H0 + 100)),       // hour 0
      (101L, ts(H0 + 3600 + 5)),  // hour 1
      (102L, ts(H0 + 7200 + 5))   // hour 2
    ).toDF("number", "block_time")
    val balances = Seq(
      ("0xa", ts(H0 + 3600 + 50)), // hour 1 — via the ts column
      ("0xb", ts(H0 + 200))
    ).toDF("address_pubkey", "ts")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hourly_spec").toString
    val out = Hourly.dumpDuneHour(
      Map("blocks" -> blocks, "balances" -> balances),
      "2024-03-01", 1, dir, tsCols = Map("balances" -> "ts"))
    assert(out("blocks").collect().map(_.getAs[Long]("number")).toSeq
      == Seq(101L))
    assert(out("balances").collect()
      .map(_.getAs[String]("address_pubkey")).toSeq == Seq("0xa"))
    // re-export of the SAME hour replaces it; other hours untouched
    Hourly.dumpDuneHour(Map("blocks" -> blocks), "2024-03-01", 2, dir)
    val again = Hourly.dumpDuneHour(Map("blocks" -> blocks),
      "2024-03-01", 1, dir)
    val all = again("blocks").collect()
      .map(r => r.getAs[Int]("hr") -> r.getAs[Long]("number")).toSet
    assert(all == Set(1 -> 101L, 2 -> 102L))
    // an hour with no rows still writes a readable empty partition
    val empty = Hourly.dumpDuneHour(Map("extrinsics" ->
        blocks.withColumnRenamed("number", "extrinsic_id")),
      "2024-03-01", 7, dir)
    assert(empty("extrinsics").count() == 0)
    assert(empty("extrinsics").columns.contains("hr"))
  }

  test("continuityAudit: tail-truncated hour held back by gap_after") {
    // hour 0 loses its LAST block (2): dense to the range count and
    // clean on its leading seam — only the next-hour seam catches it
    // (the reference's FAIL1 direction, substrateetl.js:3501)
    val blocks = Seq(
      (0, 0L, ts(H0)), (0, 1L, ts(H0 + 30)),
      (0, 3L, ts(H0 + 3600)), (0, 4L, ts(H0 + 3630))
    ).toDF("chain_id", "number", "block_time")
    val a = Hourly.continuityAudit(blocks).collect()
      .map(r => r.getAs[String]("log_hr") -> r).toMap
    val h0 = a("2024-03-01 00")
    assert(h0.getAs[Boolean]("complete")) // the count cannot see it
    assert(h0.getAs[Boolean]("gap_after"))
    assert(!h0.getAs[Boolean]("publishable"))
    val h1 = a("2024-03-01 01")
    assert(h1.getAs[Boolean]("gap_before"))
    assert(!h1.getAs[Boolean]("publishable"))
  }

  test("continuityAudit: duplicate blocks cannot fake completeness") {
    // block 1 is double-indexed, block 2 is missing: a raw count would
    // read 3 = bn_end − bn_start + 1 and call the hour complete
    val blocks = Seq(
      (0, 0L, ts(H0)), (0, 1L, ts(H0 + 30)), (0, 1L, ts(H0 + 30)),
      (0, 3L, ts(H0 + 90))
    ).toDF("chain_id", "number", "block_time")
    val a = Hourly.continuityAudit(blocks).collect()
    assert(a.length == 1)
    assert(!a.head.getAs[Boolean]("complete"))
    assert(a.head.getAs[Long]("n_blocks") == 3)
  }
}
