package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-at-block state reconstruction (ref
  * snapshot/snapshotter.js:1-264 + its per-chain extractors: point-in-
  * time balances/staking/asset state at a named block, one snapshot
  * artifact per (chain, block), re-written whole on re-run).
  *
  * Spark-first shape: state AT block B is the latest update per key
  * with ordinal ≤ B — ONE hash aggregation via `max(struct(ord,
  * values…))` (argmax with map-side partial aggregation; no global
  * sort, no stream replay, no per-account RPC probes like the
  * reference's live-API walk). At 100 TB the updates table is already
  * partitioned by block range, so the `ord ≤ B` filter prunes
  * partitions before the single shuffle on the key.
  */
object Snapshot {

  /** Latest-per-key state as of `atOrd` (block number or any monotonic
    * id): argmax of (ordCol, valueCols…) per keyCols over updates with
    * ordCol ≤ atOrd. Ties on the ordinal break on the value tuple, so
    * the result is deterministic even with duplicate ordinals. The
    * output carries `snapshot_at` so snapshots of different blocks
    * coexist in one partitioned table. */
  def stateAt(updates: DataFrame, keyCols: Seq[String], ordCol: String,
      atOrd: Long, valueCols: Seq[String]): DataFrame = {
    val m = struct((ordCol +: valueCols).map(col): _*)
    updates.filter(col(ordCol) <= atOrd)
      .groupBy(keyCols.map(col): _*)
      .agg(max(m).as("m"))
      .select(keyCols.map(col) ++
        (ordCol +: valueCols).map(c => col(s"m.$c").as(c)): _*)
      .withColumn("snapshot_at", lit(atOrd))
  }

  /** Idempotent snapshot write: partitioned by `snapshot_at`, dynamic
    * partition overwrite — re-running a snapshot replaces exactly its
    * own partition and leaves every other block's snapshot untouched
    * (the reference's per-(chain, block) file overwrite, expressed as
    * partition semantics). */
  def writeSnapshot(state: DataFrame, outDir: String): Unit = {
    val spark = state.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try state.write.mode("overwrite").partitionBy("snapshot_at")
      .parquet(outDir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
