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
        side("click"), StreamQueries.St2IntervalSec)
      .select(col("s_user").as("user_id"), col("s_event_id"),
        col("d_event_id"), unix_micros(col("s_ts")).as("s_us"),
        unix_micros(col("d_ts")).as("d_us"))
      .orderBy(col("user_id"), col("s_event_id"), col("d_event_id"))
    val got = q.collect().map(_.toSeq).toSeq
    val want = batch.collect().map(_.toSeq).toSeq
    assert(want.nonEmpty && got == want)
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
