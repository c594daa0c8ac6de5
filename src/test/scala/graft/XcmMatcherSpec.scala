package graft

import graft.etl.XcmMatcher
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Golden cases for the XCM matchers, mirroring the fixture requirements
  * of FIXTURES.md §9/§10 (matched pair in window, decoy outside window,
  * duplicate dest dedup, orphan; exact-amount match, confidence fallback,
  * reaped rejection, out-of-window candidate). */
class XcmMatcherSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("message matching: window, closest-wins, dedup, orphan") {
    // (msg_hash, block_number, incoming, chain_id, chain_id_dest,
    //  sent_at, block_ts)
    val rows = Seq(
      ("0xaa", 100L, 0, 1, 2, 50L, ts(1000)),  // source
      ("0xaa", 205L, 1, 1, 2, 52L, ts(1010)),  // dest delta 2 ✓ closest
      ("0xaa", 206L, 1, 1, 2, 53L, ts(1030)),  // dest delta 3 (loses)
      ("0xbb", 110L, 0, 1, 2, 60L, ts(1100)),  // source
      ("0xbb", 215L, 1, 1, 2, 65L, ts(1120)),  // delta 5 ✗ out of window
      ("0xcc", 120L, 0, 3, 4, 70L, ts(1200))   // orphan source
    ).toDF("msg_hash", "block_number", "incoming", "chain_id",
      "chain_id_dest", "sent_at", "block_ts")

    val out = XcmMatcher.matchMessages(rows)
      .select("msg_hash", "s_block_number", "d_block_number", "diff_sent_at")
      .collect().toSet
    assert(out == Set(Row("0xaa", 100L, 205L, 2L)))
  }

  test("message matching: one dest consumed once across sources") {
    val rows = Seq(
      ("0xdd", 100L, 0, 1, 2, 50L, ts(1000)), // source A (closer in ts)
      ("0xdd", 101L, 0, 1, 2, 50L, ts(1005)), // source B same sentAt
      ("0xdd", 205L, 1, 1, 2, 51L, ts(1001))  // single dest
    ).toDF("msg_hash", "block_number", "incoming", "chain_id",
      "chain_id_dest", "sent_at", "block_ts")
    val out = XcmMatcher.matchMessages(rows)
      .select("s_block_number", "d_block_number").collect().toSet
    // both sources pick the dest; dedup keeps the first by
    // (diff_sent_at, diff_ts, s_block_number) → source at block 100
    assert(out == Set(Row(100L, 205L)))
  }

  test("transfer matching: exact beats confidence, reaped & window rejected") {
    val transfers = Seq(
      // extrinsic_id, transfer_index, xcm_index, chain_id, chain_id_dest,
      // symbol, amount_sent, source_ts, msg_hash, sent_at
      ("5-1", 0, 0, 1, 2, "DOT", BigDecimal(1000), ts(5000), "0xm1", 10L),
      ("6-1", 0, 0, 1, 2, "DOT", BigDecimal(500), ts(6000), "0xm2", 20L),
      ("7-1", 0, 0, 1, 2, "DOT", BigDecimal(800), ts(7000), "0xm3", 30L)
    ).toDF("extrinsic_id", "transfer_index", "xcm_index", "chain_id",
      "chain_id_dest", "symbol", "amount_sent", "source_ts", "msg_hash",
      "sent_at")
    val candidates = Seq(
      // chain_id_dest, msg_hash, dest_ts, sent_at, block_number_dest,
      // amount_received, xcm_teleport_fees, event_id, reaped
      (2, "0xm1", ts(5030), 11L, 900L, BigDecimal(990), BigDecimal(10),
        "900-1-1", 0),   // exact: 990+10 == 1000 ✓
      (2, "0xm1", ts(5040), 11L, 901L, BigDecimal(985), BigDecimal(10),
        "901-1-1", 0),   // confidence 0.995 (loses to exact)
      (2, "0xm2", ts(6050), 21L, 910L, BigDecimal(480), BigDecimal(5),
        "910-1-1", 0),   // confidence 0.97 ✓ wins (no exact)
      (2, "0xm2", ts(6055), 21L, 911L, BigDecimal(490), BigDecimal(10),
        "911-1-1", 1),   // exact but REAPED ✗
      (2, "0xm3", ts(7500), 31L, 920L, BigDecimal(795), BigDecimal(5),
        "920-1-1", 0)    // exact but out of window (+500 s) ✗
    ).toDF("chain_id_dest", "msg_hash", "dest_ts", "sent_at",
      "block_number_dest", "amount_received", "xcm_teleport_fees",
      "event_id", "reaped")

    val out = XcmMatcher.matchTransfers(transfers, candidates)
      .select("extrinsic_id", "event_id", "exact").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set(("5-1", "900-1-1", 1), ("6-1", "910-1-1", 0)))
  }

  test("fingerprint subset matching within the 60 s window") {
    val parents = Seq(
      ("0xp1", 1, 2, ts(1000), Seq("a", "b", "c")),
      ("0xp2", 1, 3, ts(1000), Seq("a"))
    ).toDF("msg_hash", "chain_id", "chain_id_dest", "block_ts",
      "fingerprints")
    val children = Seq(
      ("0xc1", 2, 4, ts(1030), Seq("a", "b")),   // ⊆ p1, in window ✓
      ("0xc2", 2, 4, ts(1030), Seq("a", "z")),   // z ∉ p1 ✗
      ("0xc3", 2, 4, ts(1100), Seq("a")),        // +100 s ✗
      ("0xc4", 3, 4, ts(1010), Seq("a")),        // ⊆ p2 via chain 3 ✓
      ("0xc5", 2, 4, ts(1030), Seq.empty[String]) // empty fp: vacuous ✗
    ).toDF("msg_hash", "chain_id", "chain_id_dest", "block_ts",
      "fingerprints")
    val out = XcmMatcher.matchFingerprints(parents, children)
      .select("parent_hash", "child_hash").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("0xp1", "0xc1"), ("0xp2", "0xc4")))
  }

  test("transfer matching: one candidate event consumed once") {
    val transfers = Seq(
      ("5-1", 0, 0, 1, 2, "DOT", BigDecimal(1000), ts(5000), "0xm1", 10L),
      ("5-1", 1, 0, 1, 2, "DOT", BigDecimal(1000), ts(5000), "0xm1", 10L)
    ).toDF("extrinsic_id", "transfer_index", "xcm_index", "chain_id",
      "chain_id_dest", "symbol", "amount_sent", "source_ts", "msg_hash",
      "sent_at")
    val candidates = Seq(
      (2, "0xm1", ts(5030), 11L, 900L, BigDecimal(990), BigDecimal(10),
        "900-1-1", 0)
    ).toDF("chain_id_dest", "msg_hash", "dest_ts", "sent_at",
      "block_number_dest", "amount_received", "xcm_teleport_fees",
      "event_id", "reaped")
    val out = XcmMatcher.matchTransfers(transfers, candidates)
      .select("transfer_index").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0)) // transfer_index 0 wins the shared candidate
  }
}
