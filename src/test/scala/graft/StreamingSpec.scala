package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{Candidate, Finalized}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Streaming semantics (SURVEY §2.9): finality resolution via
  * flatMapGroupsWithState, candidate dedup, watermarked windowed aggs —
  * driven synchronously with MemoryStream/memory sink (ST1/ST5/ST6). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("finality stream emits exactly the finalized fork per block") {
    implicit val s = spark
    val input = MemoryStream[Candidate](spark)
    val query = EventStream.finalizeStream(input.toDS())
      .writeStream.format("memory").queryName("finalized_out")
      .outputMode("append").start()
    try {
      // two candidate forks for (1, 100), then finality picks 0xb
      input.addData(
        Candidate(1, 100L, "0xa", finalized = false, ts(10)),
        Candidate(1, 100L, "0xb", finalized = false, ts(11)))
      query.processAllAvailable()
      assert(spark.table("finalized_out").count() == 0) // nothing final yet
      input.addData(Candidate(1, 100L, "0xb", finalized = true, ts(12)),
        Candidate(1, 101L, "0xc", finalized = true, ts(15)))
      query.processAllAvailable()
      val out = spark.table("finalized_out").as[Finalized].collect()
        .map(f => (f.chain_id, f.block_number, f.block_hash)).toSet
      assert(out == Set((1, 100L, "0xb"), (1, 101L, "0xc")))
      // replayed duplicate finality in a LATER micro-batch must be a
      // no-op (tombstone state) — ST5's dedup-across-redundant-crawlers
      input.addData(Candidate(1, 101L, "0xc", finalized = true, ts(16)))
      query.processAllAvailable()
      assert(spark.table("finalized_out").count() == 2)
    } finally query.stop()
  }

  test("streaming funnel repairs out-of-order arrivals, equals batch") {
    implicit val s = spark
    import EventStream.{FunnelEvent, FunnelSnap}
    val H = 3600000000L
    val input = MemoryStream[FunnelEvent](spark)
    val q = EventStream.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    try {
      // batch 1: steps arrive BEFORE the views that anchor them
      input.addData(FunnelEvent(1, "click", 11 * H),
        FunnelEvent(2, "purchase", 10 * H + 1800000000L))
      q.processAllAvailable()
      val mid = spark.table("funnel_out").as[FunnelSnap].collect()
      assert(mid.forall(r => r.ta.isEmpty && r.tb.isEmpty && r.tc.isEmpty))
      // batch 2: the views land -> user 1's click must now qualify
      input.addData(FunnelEvent(1, "view", 10 * H),
        FunnelEvent(2, "view", 10 * H))
      q.processAllAvailable()
      // batch 3: user 1 converts; user 2's click postdates its purchase
      input.addData(FunnelEvent(1, "purchase", 12 * H),
        FunnelEvent(2, "click", 11 * H))
      q.processAllAvailable()
      val last = spark.table("funnel_out").as[FunnelSnap].collect()
        .groupBy(_.user_id).map { case (u, rows) =>
          u -> rows.maxBy(_.seq)
        }
      assert(last(1L).ta.contains(10 * H) && last(1L).tb.contains(11 * H)
        && last(1L).tc.contains(12 * H))
      // purchase at 10.5h precedes the click -> never a conversion
      assert(last(2L).ta.contains(10 * H) && last(2L).tb.contains(11 * H)
        && last(2L).tc.isEmpty)
      // parity: identical to the batch funnel on the same rows
      val allRows = Seq(
        (1L, "click", 11 * H), (2L, "purchase", 10 * H + 1800000000L),
        (1L, "view", 10 * H), (2L, "view", 10 * H),
        (1L, "purchase", 12 * H), (2L, "click", 11 * H))
        .toDF("user_id", "event_type", "tus")
      val batch = graft.operators.WindowOps
        .funnelSteps(allRows, Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
      for ((u, snap) <- last)
        assert((snap.ta, snap.tb, snap.tc) ===
          ((batch(u)._1, batch(u)._2, batch(u)._3)), s"user $u")
    } finally q.stop()
  }

  test("funnel state is evicted once the watermark passes retention") {
    implicit val s = spark
    import EventStream.{FunnelEvent, FunnelSnap}
    val SEC = 1000000L // micros
    val input = MemoryStream[FunnelEvent](spark)
    val q = EventStream.funnelStream(input.toDS(),
        stepWindowUs = 3600 * SEC,
        watermarkDelay = "10 seconds", stateRetentionMs = 10000L)
      .writeStream.format("memory").queryName("funnel_evict_out")
      .outputMode("update").start()
    try {
      // user 1 anchors a view at t=100s
      input.addData(FunnelEvent(1, "view", 100 * SEC))
      q.processAllAvailable()
      // unrelated traffic drives the watermark to 990s — far past
      // user 1's timeout (last activity 100s + 10s retention)
      input.addData(FunnelEvent(2, "view", 1000 * SEC))
      q.processAllAvailable()
      // timeouts fire for keys WITHOUT data in a batch that runs with
      // the advanced watermark — one more unrelated batch guarantees
      // user 1's EventTimeTimeout branch runs and removes the state
      input.addData(FunnelEvent(2, "view", 1001 * SEC))
      q.processAllAvailable()
      // user 1 returns with a click at 1005s (not late vs the 990s
      // watermark): with the old state evicted, seq RESTARTS at 1 and
      // the 100s view is GONE — the new snapshot is all-None. Under
      // NoTimeout this batch would instead emit seq=2 with ta=100s.
      input.addData(FunnelEvent(1, "click", 1005 * SEC))
      q.processAllAvailable()
      val u1 = spark.table("funnel_evict_out").as[FunnelSnap].collect()
        .filter(_.user_id == 1L).toSet
      assert(!u1.exists(_.seq > 1L), "state entry must have been evicted")
      assert(u1 == Set(
        FunnelSnap(1L, 1L, Some(100 * SEC), None, None), // before
        FunnelSnap(1L, 1L, None, None, None)))           // after evict
    } finally q.stop()
  }

  test("batch dedup keeps finalized-preferred latest candidate") {
    val bronze = Seq(
      (1, 100L, "0xa", false, ts(10)),
      (1, 100L, "0xb", true, ts(11)),
      (1, 100L, "0xc", false, ts(12)),
      (2, 100L, "0xd", false, ts(13))
    ).toDF("chain_id", "block_number", "block_hash", "finalized", "ts")
    val out = EventStream.dedupCandidates(bronze)
      .select("chain_id", "block_hash").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "0xb"), (2, "0xd")))
  }

  test("windowed counts with watermark match the batch aggregation") {
    val ev = Tables.events(spark, SparkTestBase.sf)
    // drive the windowed agg with MemoryStream rows from the real table
    val rows = ev.select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq
    val input = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = EventStream.windowedCounts(
      input.toDS().toDF("ts", "event_type", "value"))
    val query = agg.writeStream.format("memory").queryName("windowed_out")
      .outputMode("complete").start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      val streamed = spark.table("windowed_out")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(streamed == rows.size)
      val batchGroups = ev
        .groupBy(date_trunc("hour", col("ts")), col("event_type"))
        .count().count()
      assert(spark.table("windowed_out").count() == batchGroups)
    } finally query.stop()
  }

  test("watermarked exact dedup drops replays across micro-batches") {
    implicit val s = spark
    val input = MemoryStream[Candidate](spark)
    val query = EventStream.dedupExactStream(input.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_exact_out")
      .outputMode("append").start()
    try {
      input.addData(
        Candidate(1, 100L, "0xa", finalized = false, ts(10)),
        Candidate(1, 100L, "0xa", finalized = false, ts(10))) // same batch
      query.processAllAvailable()
      // replay of the same identity in a LATER micro-batch (the
      // redundant-crawler model) must also be dropped while its state
      // lives within the watermark
      input.addData(Candidate(1, 100L, "0xa", finalized = true, ts(11)),
        Candidate(1, 101L, "0xb", finalized = false, ts(12)))
      query.processAllAvailable()
      val out = spark.table("dedup_exact_out")
        .select("chain_id", "block_number", "block_hash").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
      assert(out.length == 2)
      assert(out.toSet == Set((1, 100L, "0xa"), (1, 101L, "0xb")))
    } finally query.stop()
  }

  test("streaming sessionize equals the batch session_window form") {
    val ev = Tables.events(spark, SparkTestBase.sf)
      .filter(col("user_id") < 10)
    val rows = ev.select(col("ts"), col("user_id"))
      .as[(Timestamp, Long)].collect().toSeq
    val input = MemoryStream[(Timestamp, Long)](spark)
    val sessions = EventStream.sessionize(
      input.toDS().toDF("ts", "user_id"))
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("complete").start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      val streamed = spark.table("sessions_out")
        .select("user_id", "sess_start_us", "last_us", "n_events")
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = ev
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(unix_micros(col("ts"))).as("last_us"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          col("last_us"), col("n_events"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // sessions are genuinely gap-merged: at least one multi-event
      // session must exist in the fixture
      assert(streamed.exists(_._4 > 1))
    } finally query.stop()
  }

  test("stream-stream interval join bounds matches to the window") {
    val src = Seq((7L, 1L, ts(1000)), (8L, 2L, ts(2000)))
      .toDF("user_id", "event_id", "ts")
    val dst = Seq(
      (7L, 10L, ts(1050)),  // +50 s ✓
      (7L, 11L, ts(1500)),  // +500 s ✗
      (8L, 12L, ts(1990))   // before source ✗
    ).toDF("user_id", "event_id", "ts")
    // semantics check on the batch twin of the streaming join
    val out = EventStream.streamIntervalJoin(src, dst)
      .select("s_event_id", "d_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L)))
  }

  test("true stream-stream interval join with watermarks") {
    val src = MemoryStream[(Long, Long, Timestamp)](spark)
    val dst = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = EventStream.streamIntervalJoin(
      src.toDS().toDF("user_id", "event_id", "ts"),
      dst.toDS().toDF("user_id", "event_id", "ts"))
    val q = joined.writeStream.format("memory")
      .queryName("ss_join_out").outputMode("append").start()
    try {
      src.addData((7L, 1L, ts(1000)), (8L, 2L, ts(2000)))
      dst.addData((7L, 10L, ts(1050)), (7L, 11L, ts(1500)),
        (8L, 12L, ts(1990)))
      q.processAllAvailable()
      // advance both watermarks so in-window results are emitted
      src.addData((9L, 99L, ts(9000)))
      dst.addData((9L, 98L, ts(9000)))
      q.processAllAvailable()
      val out = spark.table("ss_join_out")
        .filter(col("s_user") =!= 9) // sentinel rows join each other
        .select("s_event_id", "d_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((1L, 10L)))
    } finally q.stop()
  }

  test("outer interval join emits unmatched sources on watermark passage") {
    val src = MemoryStream[(Long, Long, Timestamp)](spark)
    val dst = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = EventStream.streamIntervalJoinOuter(
      src.toDS().toDF("user_id", "event_id", "ts"),
      dst.toDS().toDF("user_id", "event_id", "ts"))
    val q = joined.writeStream.format("memory")
      .queryName("ss_outer_out").outputMode("append").start()
    try {
      // u7 matches inside the 120s window; u8 never gets a dst row —
      // the reference's unmatched XCM awaiting the cleaner sweep
      src.addData((7L, 1L, ts(1000)), (8L, 2L, ts(1000)))
      dst.addData((7L, 10L, ts(1050)))
      q.processAllAvailable()
      val early = spark.table("ss_outer_out")
        .filter(col("s_user") === 8).count()
      assert(early == 0, "unmatched row emitted before its window closed")
      // sentinel rows push both watermarks past 1000+120+120 → u8's
      // window is provably closed and the null-extended row emits
      src.addData((9L, 99L, ts(9000)))
      dst.addData((9L, 98L, ts(9000)))
      q.processAllAvailable()
      src.addData((9L, 97L, ts(9500)))
      dst.addData((9L, 96L, ts(9500)))
      q.processAllAvailable()
      val out = spark.table("ss_outer_out")
        .filter(col("s_user").isin(7, 8))
        .select(col("s_event_id"),
          col("d_event_id")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(out == Set((1L, 10L), (2L, -1L)))
    } finally q.stop()
  }
}
