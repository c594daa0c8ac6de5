package graft

import graft.etl.Dump
import graft.model._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** ST end-to-end parity: the candidate stream drives `Dump`'s eight
  * entity projections through `foreachBatch` (micro-batched file
  * source, checkpointed), and the result is pinned FRAME-EQUAL to the
  * batch `dumpDay` over the same raw corpus — including the
  * fork-candidate and out-of-day rows both paths must reject. This is
  * the whole §3.2 pipeline run as a stream, not per-operator evidence.
  */
class StreamingParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private val alice =
    "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d"
  private val bob =
    "8eaf04151687736326c9fea17e25fc5287613693c912909cb226aa4794f26a48"

  private val ok = Seq(
    RawEvent(0, "system", "ExtrinsicSuccess", """{"weight":1}"""),
    RawEvent(1, "balances", "Transfer", """{"amount":"0x2540be400"}"""))
  private val fail = Seq(
    RawEvent(0, "system", "ExtrinsicFailed", """{"err":"BadOrigin"}"""))
  private val xfer = RawTransfer(alice, bob, "DOT", "0x2540be400", 10)

  private val batchParams =
    """{"section":"utility","method":"batch","args":{},
      |"calls":[{"section":"balances","method":"transfer","args":{"v":1}},
      |         {"section":"system","method":"remark","args":{}}]}"""
      .stripMargin
  private def leafParams(section: String, method: String) =
    s"""{"section":"$section","method":"$method","args":{"v":7}}"""

  /** 3 in-day finalized blocks (batch call, failure, duplicate transfer
    * emit, digest logs), an unfinalized fork of 101, an out-of-day
    * block — the corpus both paths must project identically. */
  private def corpus: Seq[RawBlock] = Seq(
    RawBlock(0, 100L, "0xb100", "0xb099", ts("2024-03-01 10:00:00"), 100,
      alice, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe0", "timestamp", "set",
          leafParams("timestamp", "set"), signed = false, null, 0.0,
          ok.take(1), Seq.empty),
        RawExtrinsic(1, "0xe1", "utility", "batch", batchParams,
          signed = true, alice, 0.25, ok, Seq(xfer, xfer))), // dup emit
      logs = Seq(RawLog("PreRuntime", "0xaa"), RawLog("Seal", "0xbb"))),
    RawBlock(0, 101L, "0xb101", "0xb100", ts("2024-03-01 11:00:00"), 100,
      bob, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe2", "balances", "transfer",
          leafParams("balances", "transfer"), signed = true, bob, 0.5,
          fail, Seq.empty)),
      logs = Seq(RawLog("Seal", "0xcc"))),
    // fork candidate for 101 — unfinalized, must be dropped by BOTH paths
    RawBlock(0, 101L, "0xdead", "0xb100", ts("2024-03-01 11:00:02"), 100,
      bob, finalized = false,
      extrinsics = Seq(
        RawExtrinsic(0, "0xdead0", "balances", "transfer",
          leafParams("balances", "transfer"), signed = true, bob, 0.5,
          ok, Seq(xfer))),
      logs = Seq.empty),
    RawBlock(1, 500L, "0xc500", "0xc499", ts("2024-03-01 12:00:00"), 200,
      alice, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe5", "staking", "nominate",
          leafParams("staking", "nominate"), signed = true, alice, 0.1,
          ok, Seq(xfer)),
        // P7 rows so rewards + crowdloan parity is non-vacuous
        RawExtrinsic(1, "0xe5b", "staking", "payoutStakers",
          leafParams("staking", "payoutStakers"), signed = true, alice,
          0.1,
          Seq(
            RawEvent(0, "staking", "PayoutStarted",
              s"""{"eraIndex":9,"validatorStash":"$alice"}"""),
            RawEvent(1, "staking", "Rewarded",
              s"""{"stash":"$bob","amount":321}"""),
            RawEvent(2, "crowdloan", "Contributed",
              s"""{"who":"$bob","fundIndex":77,"amount":654}"""),
            RawEvent(3, "crowdloan", "MemoUpdated",
              s"""{"who":"$bob","paraId":77,"memo":"0x6d"}"""),
            RawEvent(4, "system", "ExtrinsicSuccess", """{"weight":1}""")),
          Seq.empty)),
      logs = Seq(RawLog("PreRuntime", "0xdd"))),
    // out-of-day — dropped by the day filter in both paths
    RawBlock(0, 102L, "0xb102", "0xb101", ts("2024-03-02 00:10:00"), 100,
      alice, finalized = true,
      extrinsics = Seq(
        RawExtrinsic(0, "0xe6", "balances", "transfer",
          leafParams("balances", "transfer"), signed = true, alice, 0.2,
          ok, Seq(xfer))),
      logs = Seq.empty))

  private val tables =
    Seq("blocks", "extrinsics", "events", "transfers", "calls", "logs",
      "rewards", "crowdloan")

  test("dumpDay through foreachBatch == batch dumpDay, all 8 tables") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_parity").toString
    val landing = s"$root/landing"
    val batchRoot = s"$root/batch"; val streamRoot = s"$root/stream"

    // land the corpus as 3 separate parquet files → 3 micro-batches
    // (maxFilesPerTrigger=1), blocks arriving interleaved across them
    val ds = corpus.toDS()
    corpus.grouped(2).zipWithIndex.foreach { case (g, i) =>
      g.toDS().coalesce(1).write.parquet(s"$landing/part$i")
    }

    // batch truth over the whole corpus
    Dump.dumpDay(ds.toDF(), "2024-03-01", batchRoot)

    // stream: file source over the landed files, foreachBatch → the
    // SAME projections, append + checkpoint
    val q = spark.readStream
      .schema(ds.schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(landing)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Dump.dumpMicroBatch(b, id, "2024-03-01", streamRoot)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "streaming batches timed out")
    q.stop()

    // the stream layout adds the batch_id idempotence partition —
    // readers see the same day once it is dropped
    def frame(dir: String, drop: Seq[String] = Seq.empty): Seq[String] = {
      val df0 = spark.read.parquet(dir)
      val df = drop.foldLeft(df0)(_ drop _)
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq.sorted
    }
    for (t <- tables) {
      val b = frame(s"$batchRoot/$t")
      val s = frame(s"$streamRoot/$t", drop = Seq("batch_id"))
      assert(b.nonEmpty, s"$t: batch output empty")
      assert(b == s, s"$t: stream output != batch output")
    }

    // at-least-once replay: re-running a micro-batch with the SAME
    // batchId replaces its own (log_dt, batch_id) partition — no
    // duplicates (the foreachBatch restart contract)
    val before = spark.read.parquet(s"$streamRoot/events").count()
    Dump.dumpMicroBatch(corpus.take(2).toDS().toDF(), 0L, "2024-03-01",
      streamRoot)
    assert(spark.read.parquet(s"$streamRoot/events").count() == before,
      "replaying batch 0 must not duplicate rows")
  }

  test("dumpTracesDay through foreachBatch == batch, both trace tables") {
    import spark.implicits._
    import graft.model.RawTrace
    val root = Files.createTempDirectory("graft_tparity").toString
    val landing = s"$root/landing"
    val batchRoot = s"$root/batch"; val streamRoot = s"$root/stream"
    val pfx = graft.functions.Codec.bytesToHex(
      graft.functions.Codec.twox128("System".getBytes("UTF-8")) ++
        graft.functions.Codec.twox128("Account".getBytes("UTF-8")),
      prefix = false)
    val acctVal = "0x" + "05000000" + "01000000" + "01000000" +
      "00000000" + "00e40b5402000000" + "00" * 8 + "00" * 32
    val traces = (0 until 6).map { i =>
      RawTrace(0, 500L + i, s"0xb${500 + i}",
        ts(s"2024-03-01 0${i + 1}:00:00"), 0,
        if (i % 2 == 0) s"0x$pfx${"ab" * 16}${"%02x".format(i) * 32}"
        else "0x" + "ee" * 48,
        if (i % 2 == 0) acctVal else "0x04", finalized = true)
    }
    traces.grouped(2).zipWithIndex.foreach { case (g, i) =>
      g.toDS().coalesce(1).write.parquet(s"$landing/part$i")
    }
    val dim = graft.decode.TraceDecode.keyedPrefixDim(spark, Seq(
      ("System", "Account", "blake2_128concat", 32)))
    Dump.dumpTracesDay(traces.toDS().toDF(), dim, "2024-03-01",
      batchRoot)
    val schema = traces.toDS().schema
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(landing)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        Dump.dumpTracesMicroBatch(b, dim, id, "2024-03-01", streamRoot)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "streaming batches timed out")
    q.stop()
    def frame(dir: String, drop: Seq[String] = Seq.empty): Seq[String] = {
      val df0 = spark.read.parquet(dir)
      val df = drop.foldLeft(df0)(_ drop _)
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq.sorted
    }
    for (t <- Seq("traces", "balances")) {
      val b = frame(s"$batchRoot/$t")
      val s = frame(s"$streamRoot/$t", drop = Seq("batch_id"))
      assert(b.nonEmpty, s"$t: batch output empty")
      assert(b == s, s"$t: stream output != batch output")
    }

    // replaying a micro-batch with the same batchId must not duplicate
    val before = spark.read.parquet(s"$streamRoot/traces").count()
    Dump.dumpTracesMicroBatch(traces.take(2).toDS().toDF(), dim, 0L,
      "2024-03-01", streamRoot)
    assert(spark.read.parquet(s"$streamRoot/traces").count() == before,
      "replaying trace batch 0 must not duplicate rows")
  }

  test("parity survives stop -> more files land -> restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_parity_rs").toString
    val landing = s"$root/landing"
    val batchRoot = s"$root/batch"; val streamRoot = s"$root/stream"
    val (first, second) = corpus.splitAt(2)

    def run(): Unit = {
      val q = spark.readStream
        .schema(corpus.toDS().schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(landing)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          Dump.dumpMicroBatch(b, id, "2024-03-01", streamRoot)
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(180000), "streaming batches timed out")
      q.stop()
    }

    first.toDS().coalesce(1).write.parquet(s"$landing/w0")
    run() // processes wave 0, then the query is DOWN
    second.toDS().coalesce(1).write.parquet(s"$landing/w1")
    run() // restart: checkpoint must admit ONLY wave 1 — a re-append
          // of wave 0 would duplicate rows and break frame equality
    Dump.dumpDay(corpus.toDS().toDF(), "2024-03-01", batchRoot)

    def frame(dir: String, drop: Seq[String] = Seq.empty): Seq[String] = {
      val df0 = spark.read.parquet(dir)
      val df = drop.foldLeft(df0)(_ drop _)
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq.sorted
    }
    for (t <- tables)
      assert(frame(s"$batchRoot/$t") ==
        frame(s"$streamRoot/$t", drop = Seq("batch_id")),
        s"$t: restart broke stream/batch parity")
  }
}
