package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sink-side operators — SURVEY.md §2.1 (S7-S9):
  *
  *  - S7: idempotent date-partition overwrite — the Spark twin of the
  *    reference's `bq load … '$YYYYMMDD' --replace`
  *    (ref substrateetl.js:5164-5176): dynamic partition overwrite only
  *    replaces the partitions present in this batch, so daily re-runs
  *    and backfills are replay-safe.
  *  - S9: merge-style upsert (ref polkaholicDB.js `on duplicate key
  *    update`) expressed as a key-resolved union — the plain-parquet
  *    stand-in for Delta `MERGE INTO`.
  */
object Writers {

  /** S7 — write `df` partitioned by `partitionCols`, replacing only the
    * partitions contained in the batch. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      // per-write option — NOT the session conf, which would silently
      // change the semantics of unrelated overwrite writes later
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S9 — upsert: rows from `updates` win over `base` on `keys`;
    * within `updates`, the highest `versionCol` wins (deterministic).
    * Equivalent to `MERGE INTO base USING updates ON keys WHEN MATCHED
    * UPDATE ALL WHEN NOT MATCHED INSERT ALL`. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_src").desc, col(versionCol).desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
