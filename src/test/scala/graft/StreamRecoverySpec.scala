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
}
