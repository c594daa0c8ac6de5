package graft

import graft.streaming.{CorpusStream, EventStream, StreamQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins the guarantees the driver-oracled streaming rows (st1/st2)
  * lean on but the DuckDB oracle cannot see:
  *
  *  - the corpus dump genuinely accumulated across MULTIPLE
  *    micro-batches (else complete-mode parity is vacuous);
  *  - the dump is REPLAY-IDEMPOTENT: wiping the checkpoint and
  *    re-streaming from scratch lands a byte-identical table (ST8,
  *    ref substrateetl.js:5170 WRITE_TRUNCATE);
  *  - the stream-stream interval join emits exactly the batch join
  *    under the time-ordered landing contract, across multiple
  *    micro-batches on both sides.
  */
class StreamQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("corpus stream dump: multi-batch, replay-idempotent") {
    val root = Files.createTempDirectory("graft_sq1").toString
    val landing = s"$root/landing"
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select(col("doc_id"), col("text"))
    docs.repartition(4).write.parquet(landing)

    val batches1 = CorpusStream.dumpTokenCounts(spark, landing,
      docs.schema, s"$root/out1", s"$root/ckpt1")
    assert(batches1 >= 2,
      "corpus arrived in a single micro-batch — parity is vacuous")

    // fresh checkpoint = full replay; the published table must be
    // identical (the complete-mode replace writer's contract)
    CorpusStream.dumpTokenCounts(spark, landing, docs.schema,
      s"$root/out2", s"$root/ckpt2")
    val a = spark.read.parquet(s"$root/out1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = spark.read.parquet(s"$root/out2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && a == b)

    // and both equal the batch aggregation over the same expression
    val batch = CorpusStream.tokenCountsBatch(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == batch)
  }

  test("stream-stream interval join == batch join, multi-batch sides") {
    val q = StreamQueries.queries("st2_xcm_stream_match")(
      spark, SparkTestBase.sf)
    val ev = Tables.events(spark, SparkTestBase.sf)
    def side(typ: String) = ev.filter(col("event_type") === typ)
      .select(col("user_id"), col("event_id"), col("ts"))
    // the batch twin is the SAME streamIntervalJoin expression tree on
    // batch frames (withWatermark is a no-op there) with the one shared
    // interval constant — one spelling of the predicate under test
    val batch = EventStream.streamIntervalJoin(side("view"),
        side("click"), StreamQueries.FixtureIntervalSec)
      .select(col("s_user").as("user_id"), col("s_event_id"),
        col("d_event_id"), unix_micros(col("s_ts")).as("s_us"),
        unix_micros(col("d_ts")).as("d_us"))
      .orderBy(col("user_id"), col("s_event_id"), col("d_event_id"))
    val got = q.collect().map(_.toSeq).toSeq
    val want = batch.collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got == want)
  }

  test("windowed stream dump: replay-idempotent, equals the batch agg") {
    val root = Files.createTempDirectory("graft_sq4").toString
    val landing = s"$root/landing"
    val ev = Tables.events(spark, SparkTestBase.sf)
      .select(col("ts"), col("event_type"), col("value"))
    ev.repartition(3).write.parquet(landing)
    // the SAME production drain st4 runs — the spec pins the real path
    def dump(out: String, ckpt: String): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
      StreamQueries.drainCompleteReplace(
        EventStream.windowedCounts(stream), out, ckpt, "windowed dump")
    }
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    dump(s"$root/out1", s"$root/ckpt1")
    dump(s"$root/out2", s"$root/ckpt2") // fresh checkpoint = full replay
    val a = asMap(spark.read.parquet(s"$root/out1"))
    val b = asMap(spark.read.parquet(s"$root/out2"))
    assert(a.nonEmpty && a == b)
    // batch twin: the SAME windowedCounts expression tree on the batch
    // frame (withWatermark is a no-op there) — one spelling under test
    assert(a == asMap(EventStream.windowedCounts(ev)))
  }

  test("exact-dedup stream drops a later-file replay via state") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sq5").toString
    val landing = new java.io.File(s"$root/landing")
    landing.mkdirs()
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val a = Seq((1, 100L, "0xa", false, ts(10)), (1, 101L, "0xb", true, ts(20)))
      .toDF("chain_id", "block_number", "block_hash", "finalized", "ts")
    val b = Seq((1, 100L, "0xa", false, ts(10))) // verbatim replay of row 1
      .toDF("chain_id", "block_number", "block_hash", "finalized", "ts")
    def land(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long)
        : Unit = {
      val tmp = s"$root/$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.startsWith("part-")).head
      val tgt = new java.io.File(landing, s"$name.parquet")
      assert(part.renameTo(tgt) && tgt.setLastModified(mtime))
    }
    land(a, "a", 1700000000000L)
    land(b, "b", 1700000001000L) // strictly later -> later micro-batch
    val stream = spark.readStream.schema(a.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing.toString)
    val out = s"$root/out"
    val q = EventStream.dedupExactStream(stream,
        watermarkDelay = StreamQueries.FixtureWatermarkDelay)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    // maxFilesPerTrigger=1 put the replay in its own micro-batch, so
    // the drop can only have come from the dedup STATE STORE
    val got = spark.read.parquet(out)
      .select("chain_id", "block_number", "block_hash").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.length == 2)
    assert(got.toSet == Set((1, 100L, "0xa"), (1, 101L, "0xb")))
  }

  // The DuckDB oracle proves read-back == batch twin but cannot see
  // WHETHER the interesting lanes were exercised — the three tests
  // below pin fixture non-vacuity, one drain per test so a failure
  // names its query.

  test("st6 session fixture is non-vacuous") {
    // multi-event sessions AND gap-split users must both occur, else
    // the session-merge machinery idled
    val s6 = StreamQueries.queries("st6_session_stream")(
      spark, SparkTestBase.sf)
    assert(s6.filter(col("n_events") > 1).count() > 0)
    assert(s6.groupBy("user_id").count().filter(col("count") > 1)
      .count() > 0)
    assert(s6.filter(col("user_id") < 0).count() == 0) // sentinels gone
  }

  test("st7 outer-join fixture is non-vacuous") {
    // BOTH matched pairs and null-extended stragglers must occur, else
    // the outer lane degenerated to the inner join or to all-unmatched
    val s7 = StreamQueries.queries("st7_outer_stream")(
      spark, SparkTestBase.sf)
    val matched = s7.filter(col("d_event_id").isNotNull).count()
    val straggler = s7.filter(col("d_event_id").isNull).count()
    assert(matched > 0 && straggler > 0)
    assert(s7.filter(col("user_id") < 0).count() == 0)
  }

  test("st8 funnel fixture populates every stage multi-user") {
    // the fixture's deterministic churn (clicks dropped for
    // user_id%5=2, purchases for user_id%5=3 — see st8's scaladoc)
    // guarantees each funnel stage a population that no testdata
    // regeneration can collapse to a knife edge: full conversions,
    // >1 user stopped at view, >1 user stopped at click
    val s8 = StreamQueries.queries("st8_funnel_stream")(
      spark, SparkTestBase.sf)
    assert(s8.filter(col("tc").isNotNull).count() > 1)
    assert(s8.filter(col("tb").isNull).count() > 1)
    assert(s8.filter(col("tb").isNotNull && col("tc").isNull)
      .count() > 1)
  }

  test("st9 json ingest is multi-batch and roundtrips types exactly") {
    // the oracle proves read-back == source; pin HERE that the drain
    // genuinely crossed micro-batches (4 landed files at
    // maxFilesPerTrigger=1) and that the text roundtrip preserved the
    // lossy-prone types bit-for-bit (micros timestamps, full doubles)
    val s9 = StreamQueries.queries("st9_json_ingest")(
      spark, SparkTestBase.sf)
    // multi-batch pin: the landing must hold >= 2 json part files —
    // at maxFilesPerTrigger=1 that IS the micro-batch count; a
    // repartition(4) -> coalesce(1) edit (or a writer that merged the
    // landing) would collapse the drain to one batch and leave the
    // multi-batch claim vacuous while the oracle stayed green. The
    // landing dirs live under the process's query-dump root; count
    // part files in the landing dirs only (never the parquet sink's).
    val walk = java.nio.file.Files.walk(
      java.nio.file.Paths.get(sys.props("java.io.tmpdir")))
    val landings =
      try walk.filter { p =>
        p.getFileName.toString.startsWith("part-") &&
          p.toString.contains("graft_stream_json") &&
          p.getParent.getFileName.toString == "landing"
      }.count()
      finally walk.close()
    assert(landings >= 2,
      s"json landing holds $landings part files — single micro-batch")
    val src = Tables.events(spark, SparkTestBase.sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("event_id"))
    val got = s9.collect().map(_.toSeq).toSeq
    val want = src.collect().map(_.toSeq).toSeq
    assert(want.size > 100 && got == want)
    // sub-milli digits present in the fixture — else the micros
    // timestampFormat pin (st9's whole point vs default millis) is
    // vacuous
    assert(src.filter(col("ts_us") % 1000 =!= 0).count() > 0)
  }

  test("st10 candidate pick exercises both ordering branches") {
    // sparse finality (block_number % 3 == 0 groups carry none) must
    // leave BOTH branches load-bearing: some groups pick the
    // latest-unfinalized candidate, and in some groups the finalized
    // winner is NOT the latest by ts (so finalized-preference, not
    // recency, decided)
    val s10 = StreamQueries.queries("st10_candidate_pick")(
      spark, SparkTestBase.sf)
    assert(s10.filter(!col("finalized")).count() > 1)
    val cand = Tables.events(spark, SparkTestBase.sf).select(
        (col("user_id") % 4).cast("int").as("chain_id"),
        (col("event_id") % 499).as("block_number"),
        unix_micros(col("ts")).as("tus"))
      .groupBy("chain_id", "block_number")
      .agg(max(col("tus")).as("max_tus"))
    val finNotLatest = s10.filter(col("finalized"))
      .join(cand, Seq("chain_id", "block_number"))
      .filter(col("ts_us") < col("max_tus"))
    assert(finNotLatest.count() > 1)
  }

  test("interval join default window stays the reference's 120s") {
    // the fixture widens the window; the API default is reference
    // fidelity (xcmmanager.js:423) — pin it so a refactor can't
    // silently change the production semantics
    import spark.implicits._
    val mk = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 11L, java.sql.Timestamp.valueOf("2024-01-01 00:01:59")),
      (1L, 12L, java.sql.Timestamp.valueOf("2024-01-01 00:02:01")))
      .toDF("user_id", "event_id", "ts")
    val root = Files.createTempDirectory("graft_sq2").toString
    mk.write.parquet(s"$root/s"); mk.write.parquet(s"$root/d")
    def rs(p: String) = spark.readStream.schema(mk.schema).parquet(p)
    val out = s"$root/out"
    val q = EventStream.streamIntervalJoin(rs(s"$root/s"),
        rs(s"$root/d"))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("s_event_id"), col("d_event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10→{10,11}: 00:02:01 is 121s after 00:00:00 — outside; each row
    // self-joins; 11→12 is 2s apart — inside
    assert(got == Set((10L, 10L), (10L, 11L), (11L, 11L), (11L, 12L),
      (12L, 12L)))
  }
}
