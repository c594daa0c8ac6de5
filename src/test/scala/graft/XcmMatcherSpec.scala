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

  test("destination resolution from raw MultiLocation interior keys") {
    val pk = "11" * 32
    val raw = Seq(
      (1L, s"""[{"parachain":2004},{"accountId32":{"id":"0x$pk"}}]"""),
      (2L, s"""[{"parachain":1000},{"accountKey20":{"key":"0x${"22" * 20}"}}]"""),
      (3L, "here"),            // relay dest, no account
      (4L, "not a location")   // malformed → nulls, row survives
    ).toDF("extrinsic_id", "dest_location")
    val m = XcmMatcher.resolveDestinations(raw)
      .select("extrinsic_id", "chain_id_dest", "dest_pubkey").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
          r.getString(2)))).toMap
    assert(m(1L) == ((Long.box(2004L), "0x" + pk)))
    assert(m(2L) == ((Long.box(1000L), "0x" + "22" * 20)))
    assert(m(3L) == ((Long.box(-1L), null)))
    assert(m(4L) == ((null, null)))
  }

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

  test("destination search: waterfall priority + confidence inheritance") {
    // transfer A: exact dest candidate → tier 1, confidence 1.0
    // transfer B: no candidate; exact deposit event → tier 2
    // transfer C: fuzzy candidate only (conf 0.95) → tier 3, even though
    //             a fuzzy event (tier 4) also matches
    // transfer D: nothing but a balance delta at a close block → tier 5
    // transfer E: no strategy matches → absent from output
    val transfers = Seq(
      ("A", 2, "0xk1", ts(1000), BigDecimal(1000), BigDecimal(10)),
      ("B", 2, "0xk2", ts(2000), BigDecimal(500), BigDecimal(5)),
      ("C", 2, "0xk3", ts(3000), BigDecimal(800), BigDecimal(0)),
      ("D", 2, "0xk4", ts(4000), BigDecimal(400), BigDecimal(0)),
      ("E", 2, "0xk5", ts(5000), BigDecimal(900), BigDecimal(0))
    ).toDF("extrinsic_id", "chain_id_dest", "dest_pubkey", "source_ts",
      "amount_sent", "xcm_teleport_fees")
    val candidates = Seq(
      (2, "0xk1", "c-A", ts(1030), BigDecimal(990), 0),  // exact w/ fees
      (2, "0xk3", "c-C", ts(3030), BigDecimal(760), 0),  // conf 0.95
      (2, "0xk4", "c-D", ts(4500), BigDecimal(400), 0)   // out of window
    ).toDF("chain_id_dest", "dest_pubkey", "event_id", "dest_ts",
      "amount_received", "reaped")
    val events = Seq(
      (2, "0xk2", "e-B", ts(2100), BigDecimal(500)),  // exact amount
      (2, "0xk3", "e-C", ts(3050), BigDecimal(700))   // fuzzy (tier 4)
    ).toDF("chain_id", "addr_pubkey", "event_id", "ts", "amount")
    val balances = Seq(
      (2, "0xk4", 100L, ts(3900), BigDecimal(50)),
      (2, "0xk4", 101L, ts(4060), BigDecimal(445)),   // delta 395 ✓
      (2, "0xk5", 200L, ts(4900), BigDecimal(10)),
      (2, "0xk5", 201L, ts(5060), BigDecimal(110))    // delta 100 ≪ 900 ✗
    ).toDF("chain_id", "addr_pubkey", "block_number", "block_ts", "free")

    val out = XcmMatcher.searchDestination(transfers, candidates,
        events, balances)
      .select("extrinsic_id", "priority", "strategy", "confidence")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getDouble(3)))).toMap
    assert(out == Map(
      "A" -> ((1, "candidate", 1.0)),
      "B" -> ((2, "events", 1.0)),
      "C" -> ((3, "candidate", 0.95)),
      "D" -> ((5, "balance", 0.9875))))
  }

  test("destination search: one physical match consumed once") {
    // two identical transfers to the same destination, ONE deposit
    // event: only the first (by extrinsic_id) may claim it — the same
    // consumed-once discipline as matchMessages/matchTransfers
    val transfers = Seq(
      ("G1", 2, "0xk8", ts(1000), BigDecimal(500), BigDecimal(0)),
      ("G2", 2, "0xk8", ts(1000), BigDecimal(500), BigDecimal(0))
    ).toDF("extrinsic_id", "chain_id_dest", "dest_pubkey", "source_ts",
      "amount_sent", "xcm_teleport_fees")
    val noCand = Seq.empty[(Int, String, String, Timestamp, BigDecimal, Int)]
      .toDF("chain_id_dest", "dest_pubkey", "event_id", "dest_ts",
        "amount_received", "reaped")
    val events = Seq(
      (2, "0xk8", "e-G", ts(1100), BigDecimal(500))
    ).toDF("chain_id", "addr_pubkey", "event_id", "ts", "amount")
    val emptyBal = Seq.empty[(Int, String, Long, Timestamp, BigDecimal)]
      .toDF("chain_id", "addr_pubkey", "block_number", "block_ts", "free")
    val out = XcmMatcher.searchDestination(transfers, noCand,
        events, emptyBal)
      .select("extrinsic_id").collect().map(_.getString(0)).toSeq
    assert(out == Seq("G1"))
  }

  test("destination search: reaped candidates are rejected") {
    val transfers = Seq(
      ("H1", 2, "0xkr", ts(1000), BigDecimal(500), BigDecimal(0))
    ).toDF("extrinsic_id", "chain_id_dest", "dest_pubkey", "source_ts",
      "amount_sent", "xcm_teleport_fees")
    val candidates = Seq(
      (2, "0xkr", "c-reaped", ts(1010), BigDecimal(500), 1) // reaped!
    ).toDF("chain_id_dest", "dest_pubkey", "event_id", "dest_ts",
      "amount_received", "reaped")
    val noEv = Seq.empty[(Int, String, String, Timestamp, BigDecimal)]
      .toDF("chain_id", "addr_pubkey", "event_id", "ts", "amount")
    val noBal = Seq.empty[(Int, String, Long, Timestamp, BigDecimal)]
      .toDF("chain_id", "addr_pubkey", "block_number", "block_ts", "free")
    assert(XcmMatcher.searchDestination(transfers, candidates,
      noEv, noBal).count() == 0)
  }

  test("destination search: within-tier best confidence wins") {
    val transfers = Seq(
      ("F", 2, "0xk9", ts(1000), BigDecimal(1000), BigDecimal(0))
    ).toDF("extrinsic_id", "chain_id_dest", "dest_pubkey", "source_ts",
      "amount_sent", "xcm_teleport_fees")
    val candidates = Seq(
      (2, "0xk9", "c-lo", ts(1010), BigDecimal(700), 0), // conf 0.7
      (2, "0xk9", "c-hi", ts(1020), BigDecimal(900), 0)  // conf 0.9 ✓
    ).toDF("chain_id_dest", "dest_pubkey", "event_id", "dest_ts",
      "amount_received", "reaped")
    val empty = Seq.empty[(Int, String, String, Timestamp, BigDecimal)]
      .toDF("chain_id", "addr_pubkey", "event_id", "ts", "amount")
    val emptyBal = Seq.empty[(Int, String, Long, Timestamp, BigDecimal)]
      .toDF("chain_id", "addr_pubkey", "block_number", "block_ts", "free")
    val out = XcmMatcher.searchDestination(transfers, candidates,
        empty, emptyBal)
      .select("matched_id", "confidence").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "c-hi" && out(0).getDouble(1) == 0.9)
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

  test("trace assembly: 3-leg origin->hop->dest chain with decoys") {
    // msg "0xaa" hops 1 → 2 → 3 → 4 (three legs, forwarded inside the
    // 4-tick window); a same-hash decoy leg 2 → 3 sent OUTSIDE the
    // window becomes its own orphan trace; msg "0xbb" is a 1-leg trace
    val legs = Seq(
      ("0xaa", 1, 2, 10L, 12L), // hop 0 (root: nothing arrives at 1)
      ("0xaa", 2, 3, 14L, 17L), // hop 1 (12 <= 14 <= 16)
      ("0xaa", 3, 4, 20L, 22L), // hop 2 (17 <= 20 <= 21) — terminal
      ("0xaa", 2, 3, 40L, 42L), // decoy: window-broken → own root
      ("0xbb", 7, 8, 10L, 11L)  // other message, single leg
    ).toDF("msg_hash", "chain_id", "chain_id_dest", "s_sent_at",
      "d_sent_at")
    val out = XcmMatcher.assembleTraces(legs, maxHops = 4, slack = 4)
      .select("trace_id", "hop", "chain_id", "chain_id_dest",
        "is_terminal")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4))).toSet
    assert(out == Set(
      ("0xaa:1:10", 0, 1, 2, false),
      ("0xaa:1:10", 1, 2, 3, false),
      ("0xaa:1:10", 2, 3, 4, true), // destination span
      ("0xaa:2:40", 0, 2, 3, true), // orphaned forward = own trace
      ("0xbb:7:10", 0, 7, 8, true)))
  }

  test("trace assembly: depth bound truncates, window gates the chain") {
    // a 6-leg chain under maxHops=4 keeps hops 0..3 only; hop 3 is the
    // deepest ASSEMBLED leg so it carries the terminal flag
    val legs = (1 to 6).map(h =>
      ("0xcc", h, h + 1, h * 6L, h * 6L + 3L))
      .toDF("msg_hash", "chain_id", "chain_id_dest", "s_sent_at",
        "d_sent_at")
    val out = XcmMatcher.assembleTraces(legs, maxHops = 4, slack = 4)
      .select("hop", "chain_id", "is_terminal")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getBoolean(2)))
      .toSet
    assert(out == Set((0, 1, false), (1, 2, false), (2, 3, false),
      (3, 4, true)))
    // legs 5/6 were dropped by the depth bound, and they do NOT appear
    // as roots (their predecessors arrive in-window)
  }

  test("transact spans: origination call -> terminal remoteexecution") {
    import graft.decode.MetaDecode._
    import graft.functions.Codec
    // golden: origination extrinsic carries a Transact whose inner call
    // is balances.transfer (v11-era legacy Address); the span must hang
    // off the trace's TERMINAL leg on the executing chain
    val legs = Seq(
      ("0xaa", 1, 2, 10L, 12L), // hop 0
      ("0xaa", 2, 3, 14L, 17L), // hop 1 — terminal: executes on chain 3
      ("0xbb", 7, 8, 10L, 11L), // 1-leg trace, index-form dest
      ("0xcc", 5, 6, 10L, 11L)  // carries an undecodable payload
    ).toDF("msg_hash", "chain_id", "chain_id_dest", "s_sent_at",
      "d_sent_at")
    val bob = Array.tabulate(32)(i => (i + 7).toByte)
    val callAcct = Codec.bytesToHex(
      Array[Byte](5, 0, 0xff.toByte) ++ bob ++
        Codec.compactEncode(BigInt(123456)))
    val callIdx = Codec.bytesToHex(
      Array[Byte](5, 0, 0x2a) ++ Codec.compactEncode(BigInt(9)))
    val transacts = Seq(
      ("0xaa", callAcct),
      ("0xbb", callIdx),
      ("0xcc", "0x99ff") // unknown pallet → row drops, stage survives
    ).toDF("msg_hash", "transact_call")
    val pallets = Seq(PalletDef(5, "balances", calls = Seq(
      ItemDef(0, "transfer",
        Seq("dest" -> LegacyAddress, "value" -> CompactInt)))))
    val traces = XcmMatcher.assembleTraces(legs, maxHops = 4, slack = 4)
    val out = XcmMatcher.transactSpans(traces, transacts, pallets)
      .select("trace_id", "hop", "exec_chain", "kind", "section",
        "method", "args_json")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
      .toSet
    assert(out == Set(
      ("0xaa:1:10", 2, 3, "remoteexecution", "balances", "transfer",
        s"""{"dest":"${Codec.bytesToHex(bob)}","value":123456}"""),
      ("0xbb:7:10", 1, 8, "remoteexecution", "balances", "transfer",
        """{"dest":42,"value":9}""")))
  }

  test("full trace: message + remoteexecution spans in one document") {
    import graft.decode.MetaDecode._
    import graft.functions.Codec
    val legs = Seq(
      ("0xaa", 1, 2, 10L, 12L),
      ("0xaa", 2, 3, 14L, 17L)
    ).toDF("msg_hash", "chain_id", "chain_id_dest", "s_sent_at",
      "d_sent_at")
    val call = Codec.bytesToHex(
      Array[Byte](5, 0, 0x2a) ++ Codec.compactEncode(BigInt(3)))
    val transacts = Seq(("0xaa", call)).toDF("msg_hash", "transact_call")
    val pallets = Seq(PalletDef(5, "balances", calls = Seq(
      ItemDef(0, "transfer",
        Seq("dest" -> LegacyAddress, "value" -> CompactInt)))))
    val traces = XcmMatcher.assembleTraces(legs, maxHops = 4, slack = 4)
    val out = XcmMatcher.fullTrace(traces, transacts, pallets)
      .select("trace_id", "hop", "kind", "chain_id_dest", "method")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getString(4)))
    // one document: both message legs then the execution span, in hop
    // order, all under the same trace id
    assert(out.toSeq == Seq(
      ("0xaa:1:10", 0, "message", 2, null),
      ("0xaa:1:10", 1, "message", 3, null),
      ("0xaa:1:10", 2, "remoteexecution", 3, "transfer")))
  }

  test("transact spans: nested utility.batch inner call recurses") {
    import graft.decode.MetaDecode._
    import graft.functions.Codec
    // the reference notes Transact calls often arrive wrapped in
    // proxy/multisig/utility batches (xcmtransact.js:941) — the
    // metadata tier's CallType recursion must see through that
    val legs = Seq(("0xdd", 1, 2, 10L, 12L))
      .toDF("msg_hash", "chain_id", "chain_id_dest", "s_sent_at",
        "d_sent_at")
    val inner = Array[Byte](5, 0, 0x2a) ++ Codec.compactEncode(BigInt(3))
    // utility(40).batch(calls: Vec<Call>) with 2 inner transfers
    val batch = Codec.bytesToHex(
      Array[Byte](40, 0) ++ Codec.compactEncode(BigInt(2)) ++
        inner ++ inner)
    val transacts = Seq(("0xdd", batch)).toDF("msg_hash", "transact_call")
    val pallets = Seq(
      PalletDef(5, "balances", calls = Seq(ItemDef(0, "transfer",
        Seq("dest" -> LegacyAddress, "value" -> CompactInt)))),
      PalletDef(40, "utility", calls = Seq(ItemDef(0, "batch",
        Seq("calls" -> Vec(CallType))))))
    val traces = XcmMatcher.assembleTraces(legs, maxHops = 4, slack = 4)
    val out = XcmMatcher.transactSpans(traces, transacts, pallets)
      .select("section", "method", "args_json").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "utility" &&
      out(0).getString(1) == "batch")
    // the args JSON references both recursively-decoded children
    assert(out(0).getString(2) ==
      """{"calls":["<call:balances.transfer>","<call:balances.transfer>"]}""")
  }
}
