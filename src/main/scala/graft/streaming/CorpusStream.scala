package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the corpus frequency tier: the same tokenize
  * expression the batch queries use (x1/x21's whitespace split), fed
  * by any streaming source of `text` rows, aggregated incrementally —
  * Spark's stateful streaming aggregation IS the incremental
  * map-side-combined count the batch plan runs, so a corpus arriving
  * as micro-batches (a crawler, a drop folder) maintains the exact
  * same counts the batch pass would compute. StreamingCorpusSpec pins
  * stream ≡ batch over a multi-micro-batch file source.
  *
  * Scale shape: the state store holds one row per DISTINCT token
  * (vocabulary-bounded, like x21's cells), not per occurrence; at
  * 100 TB the same query runs with a watermarked window key when
  * time-sliced counts are wanted instead of corpus-lifetime totals.
  */
object CorpusStream {

  /** Incremental exact token counts over a streaming `text` column. */
  def tokenCounts(stream: DataFrame): DataFrame =
    stream
      .select(explode(graft.operators.TextOps.toks).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))

  /** Batch twin over the same expression tree — the parity oracle. */
  def tokenCountsBatch(docs: DataFrame): DataFrame = tokenCounts(docs)
}
