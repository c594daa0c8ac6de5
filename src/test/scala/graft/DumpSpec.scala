package graft

import graft.etl.Dump
import graft.functions.Codec
import graft.model._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** End-to-end §3.2 dump over a nested fixture per FIXTURES.md §1-§4:
  * 2 chains × 2 days, signed & unsigned extrinsics, success & failure,
  * a utility.batch with a suppressed system.remark child, a duplicated
  * transfer emit, an unfinalized fork block, digest logs. */
class DumpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val alice =
    "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d"
  private val bob =
    "8eaf04151687736326c9fea17e25fc5287613693c912909cb226aa4794f26a48"

  private val okEvents = Seq(
    RawEvent(0, "system", "ExtrinsicSuccess", """{"weight":1}"""))
  private val failEvents = Seq(
    RawEvent(0, "system", "ExtrinsicFailed", """{"err":"BadOrigin"}"""))
  private val xfer = RawTransfer(alice, bob, "DOT", "0x2540be400", 10) // 10^10 raw = 1.0

  private val batchParams =
    """{"section":"utility","method":"batch","args":{},
      |"calls":[{"section":"balances","method":"transfer","args":{"v":1}},
      |         {"section":"system","method":"remark","args":{}}]}"""
      .stripMargin

  private lazy val raw = Seq(
    RawBlock(0, 100L, "0xb100", "0xb099", ts("2024-03-01 10:00:00"), 100,
      alice, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe0",
          "timestamp", "set", """{"section":"timestamp","method":"set"}""",
          signed = false, null, 0.0, okEvents, Nil),
        RawExtrinsic(1, "0xe1", "utility", "batch", batchParams,
          signed = true, alice, 0.25, okEvents,
          transfers = Seq(xfer, xfer)) // duplicated emit → dedup
      ),
      logs = Seq(RawLog("PreRuntime", "0xaa"), RawLog("Seal", "0xbb"))),
    RawBlock(0, 101L, "0xb101", "0xb100", ts("2024-03-01 11:00:00"), 100,
      bob, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe2", "balances", "transfer",
          """{"section":"balances","method":"transfer","args":{}}""",
          signed = true, bob, 0.1, failEvents, Nil)),
      logs = Nil),
    // fork candidate — never finalized, must be excluded
    RawBlock(0, 101L, "0xdead", "0xb100", ts("2024-03-01 11:00:00"), 100,
      bob, finalized = false,
      extrinsics = Seq(RawExtrinsic(0, "0xdead0", "balances", "transfer",
        """{"section":"balances","method":"transfer","args":{}}""",
        signed = true, bob, 0.1, okEvents, Nil)),
      logs = Nil),
    // other chain, other day
    RawBlock(2000, 7L, "0xk7", "0xk6", ts("2024-03-02 00:30:00"), 52,
      alice, finalized = true,
      extrinsics = Seq(RawExtrinsic(0, "0xe3", "timestamp", "set",
        """{"section":"timestamp","method":"set"}""",
        signed = false, null, 0.0, okEvents, Nil)),
      logs = Nil)
  ).toDF()

  private lazy val outRoot =
    java.nio.file.Files.createTempDirectory("graft_dump").toString
  private lazy val out = Dump.dumpDay(raw, "2024-03-01", outRoot)

  test("blocks: finalized-only, per-block stats, ss58 author") {
    val b = out("blocks").orderBy("number").collect()
    assert(b.length == 2) // fork + other-day excluded
    val b100 = b(0)
    assert(b100.getAs[Int]("extrinsic_count") == 2)
    assert(b100.getAs[Int]("event_count") == 2)
    assert(b100.getAs[Int]("transfer_count") == 2)
    assert(b100.getAs[String]("author_ss58") ==
      "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY")
  }

  test("extrinsics: ids, paired-event status, signer normalization") {
    val e = out("extrinsics").orderBy("extrinsic_id").collect()
    assert(e.map(_.getAs[String]("extrinsic_id")).toSeq ==
      Seq("100-0", "100-1", "101-0"))
    val byId = e.map(r => r.getAs[String]("extrinsic_id") -> r).toMap
    assert(byId("100-1").getAs[Boolean]("status")) // ExtrinsicSuccess
    assert(!byId("101-0").getAs[Boolean]("status")) // ExtrinsicFailed
    assert(byId("100-0").getAs[String]("signer_ss58") == null) // unsigned
    assert(byId("100-1").getAs[String]("signer_ss58") != null)
  }

  test("events: composite event ids") {
    val ev = out("events").select("event_id").collect()
      .map(_.getString(0)).toSet
    assert(ev == Set("100-0-0", "100-1-0", "101-0-0"))
  }

  test("transfers: dedup, base-unit scaling, asset key, ss58") {
    val t = out("transfers").collect()
    assert(t.length == 1) // duplicate emit collapsed
    val r = t(0)
    assert(r.getAs[Double]("amount") == 1.0) // 0x2540be400 = 10^10 @ 10dp
    assert(r.getAs[String]("asset") == "DOT~0")
    assert(r.getAs[String]("from_ss58") ==
      "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY")
  }

  test("calls: recursion + suppression + fee on root") {
    val c = out("calls").filter(col("extrinsic_id") === "100-1")
      .orderBy("call_id").collect()
    assert(c.map(_.getAs[String]("call_id")).toSeq == Seq("0", "0_0"))
    // system.remark child suppressed; root keeps the fee
    assert(c(0).getAs[Boolean]("root") && c(0).getAs[Double]("fee") == 0.25)
    assert(c(1).getAs[String]("call_section") == "balances" &&
      c(1).isNullAt(c(1).fieldIndex("fee")))
  }

  test("logs: posexplode ids") {
    val lg = out("logs").select("log_id", "log_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(lg == Set(("100-0", "PreRuntime"), ("100-1", "Seal")))
  }

  test("idempotent partition overwrite: re-dump day 1, then dump day 2") {
    Dump.dumpDay(raw, "2024-03-01", outRoot) // replay same day
    Dump.dumpDay(raw, "2024-03-02", outRoot)
    val blocks = spark.read.parquet(s"$outRoot/blocks")
    // day 1 not duplicated by the replay; day 2 appended
    assert(blocks.filter(col("log_dt") === "2024-03-01").count() == 2)
    assert(blocks.filter(col("log_dt") === "2024-03-02").count() == 1)
    assert(blocks.filter(col("chain_id") === 2000).count() == 1)
  }
}
