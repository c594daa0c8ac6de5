package graft

import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** ST parity for the CORPUS side (the blockchain side has
  * StreamingParitySpec): the sf corpus lands as multiple parquet
  * files, a streaming query consumes them ONE FILE PER MICRO-BATCH
  * (so the stateful aggregation genuinely accumulates across
  * restarts of the state store, not one trivial batch), and the
  * final token counts are pinned row-equal to the batch pass over
  * the same expression tree. */
class StreamingCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streaming token counts over micro-batched files == batch counts") {
    val root = Files.createTempDirectory("graft_cs").toString
    val landing = s"$root/landing"
    // land the corpus as 4 separate parquet files → 4 micro-batches
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .select(col("doc_id"), col("text"))
    docs.repartition(4).write.parquet(landing)

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = CorpusStream.tokenCounts(stream)
      .writeStream
      .format("memory")
      .queryName("cs_counts")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // at least 2 micro-batches actually ran (maxFilesPerTrigger=1)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "corpus arrived in a single micro-batch — parity is vacuous")
    } finally q.stop()

    val streamed = spark.table("cs_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = CorpusStream.tokenCountsBatch(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
