package graft

import graft.etl.Writers
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental summary maintenance as a STREAMING consumer: each
  * micro-batch's partial aggregate folds into the standing summary via
  * `Writers.mergeSummary` from `foreachBatch` — the production pattern
  * for a keyed summary too large to recompute per batch. Pins the
  * final summary frame-equal to the one-shot batch aggregation over
  * the same rows, across ≥2 non-trivial micro-batches.
  */
class StreamingSummarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("foreachBatch mergeSummary equals the batch rollup") {
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_ss_src").toString
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft_ss_sum").toString + "/summary"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ss_ck").toString

    // land the corpus as 4 files -> 4 micro-batches
    val rows = (0 until 400).map(i =>
      ((i % 13).toLong, i.toLong, (i % 97).toDouble))
    rows.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("k", "eid", "v").coalesce(1)
        .write.mode(SaveMode.Append).parquet(srcDir)
    }

    def summarize(df: DataFrame): DataFrame =
      df.groupBy(col("k")).agg(
        sum(graft.operators.dec6(col("v"))).as("total_v"),
        count(lit(1)).cast("long").as("n"),
        max(col("eid")).as("max_eid"))

    var batches = 0
    val q = spark.readStream
      .schema("k LONG, eid LONG, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        val delta = summarize(batch)
        val merged =
          if (!new java.io.File(sumDir).exists) delta
          else Writers.mergeSummary(
            spark.read.parquet(sumDir), delta, Seq("k"),
            Seq("total_v" -> "sum", "n" -> "sum", "max_eid" -> "max"))
        // write-then-swap so the read side never sees a partial write
        val tmp = sumDir + "_tmp"
        merged.write.mode(SaveMode.Overwrite).parquet(tmp)
        val old = new java.io.File(sumDir)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        if (old.exists) rm(old)
        require(new java.io.File(tmp).renameTo(old))
        () // foreachBatch needs Unit, not the require's result
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(batches >= 2, s"wanted multiple micro-batches, got $batches")
    val got = spark.read.parquet(sumDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    val want = summarize(rows.toDF("k", "eid", "v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }
}
