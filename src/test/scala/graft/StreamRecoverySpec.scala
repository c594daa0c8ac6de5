package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Candidate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** ST8 — checkpointed streaming with stop/restart recovery: the
  * finality stream must resume from its state store and neither lose
  * nor re-emit blocks across a restart (the exactly-once-ish contract
  * the reference approximates with insertId + cell versions,
  * SURVEY §2.9). */
class StreamRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("finality stream survives a restart with checkpointed state") {
    implicit val s = spark
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_out").toString

    val input = MemoryStream[Candidate](spark)
    def start() = EventStream.finalizeStream(input.toDS())
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // phase 1: candidate arrives, no finality yet → state only
    var q = start()
    try {
      input.addData(
        Candidate(1, 100L, "0xa", finalized = false, ts(10)),
        Candidate(1, 100L, "0xb", finalized = false, ts(11)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.schema(
        "chain_id INT, block_number LONG, block_hash STRING, ts TIMESTAMP")
      .parquet(outDir).count() == 0)

    // phase 2: restart from checkpoint; finality for the pending block
    // must resolve against the RECOVERED state
    q = start()
    try {
      input.addData(
        Candidate(1, 100L, "0xb", finalized = true, ts(12)),
        Candidate(1, 101L, "0xc", finalized = true, ts(13)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir)
      .select("chain_id", "block_number", "block_hash").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1, 100L, "0xb"), (1, 101L, "0xc")))
  }

  test("outer interval join survives a restart: cross-restart match, " +
      "no loss, no re-emission") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files
      .createTempDirectory("graft_oj_rec").toString
    val srcDir = new java.io.File(s"$root/src"); srcDir.mkdirs()
    val dstDir = new java.io.File(s"$root/dst"); dstDir.mkdirs()
    def frame(rows: (Long, Long, Long)*) = rows.toSeq
      .map { case (u, e, t) => (u, e, ts(t)) }
      .toDF("user_id", "event_id", "ts")
    var stamp = 1700000000000L
    def land(dir: java.io.File, df: org.apache.spark.sql.DataFrame)
        : Unit = {
      val tmp = s"$root/tmp-${dir.getName}-$stamp"
      df.coalesce(1).write.parquet(tmp)
      graft.streaming.StreamQueries.landFileStamped(
        tmp, dir.toString, s"f-$stamp.parquet", stamp)
      stamp += 1000L
    }
    // phase-1 landing: (u1,100)↔(u1,200) same-run match; (u2,101) a
    // straggler no dst ever answers; (u1,102) whose match arrives only
    // AFTER the restart — it must survive in the checkpointed state
    land(srcDir, frame((1L, 100L, 1000L), (2L, 101L, 1010L)))
    land(dstDir, frame((1L, 200L, 1050L)))
    land(srcDir, frame((1L, 102L, 5000L)))
    land(dstDir, frame((3L, 202L, 5050L)))
    val schema = frame().schema
    def start() = {
      def rs(d: java.io.File) = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(d.toString)
      EventStream.streamIntervalJoinOuter(rs(srcDir), rs(dstDir))
        .writeStream.format("parquet").option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    var q = start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    // phase-2 landing after the stop: the cross-restart dst match for
    // src 102, one more same-run pair, then the sentinel pairs that
    // close every real window (watermark = min across both sides)
    land(srcDir, frame((1L, 103L, 9000L)))
    land(dstDir, frame((1L, 201L, 5060L), (1L, 203L, 9050L)))
    for (t <- Seq(20000L, 40000L)) {
      land(srcDir, frame((-1L, -1L, t)))
      land(dstDir, frame((-1L, -1L, t)))
    }
    q = start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    val got = spark.read.parquet(s"$root/out")
      .filter(col("s_user") >= 0)
      .select("s_event_id", "d_event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // count == set size pins NO RE-EMISSION of phase-1 output rows
    assert(got.length == got.toSet.size)
    assert(got.toSet == Set(
      (100L, 200L),  // phase-1 same-run match
      (101L, -1L),   // straggler: null-extended once its window closed
      (102L, 201L),  // the CROSS-RESTART match out of recovered state
      (103L, 203L))) // phase-2 same-run match
  }
}
