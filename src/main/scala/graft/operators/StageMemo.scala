package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE (session, sfDir)-keyed memoized stage — the shared-stage pattern
  * (CC labels, LSH pairs, PQ/ADC codes) as a single implementation, so
  * the eviction/release protocol lives in one place: evict = unpersist
  * the checkpoint blocks, not just drop the reference (otherwise the
  * old blocks linger until ContextCleaner GC — the lesson first
  * annotated on the CC labels memo).
  *
  * `checkpoint = false` is for builders whose result is ALREADY
  * materialized via localCheckpoint internally (the CC loop); wrapping
  * those again would double the storage. */
private[operators] final class StageMemo(
    build: (SparkSession, String) => DataFrame,
    checkpoint: Boolean = true) {

  @volatile private var memo
      : Option[((SparkSession, String), DataFrame)] = None

  /** Bench/test hook: drop the memoized frame and its cached blocks. */
  def reset(): Unit = synchronized {
    memo.foreach { case (_, df) => DedupOps.releaseCheckpoint(df) }
    memo = None
  }

  def apply(s: SparkSession, d: String): DataFrame = synchronized {
    memo match {
      case Some(((ms, md), df)) if (ms eq s) && md == d => df
      case _ =>
        memo.foreach { case (_, old) => DedupOps.releaseCheckpoint(old) }
        val built = build(s, d)
        val df = if (checkpoint) built.localCheckpoint() else built
        memo = Some(((s, d), df))
        df
    }
  }
}
