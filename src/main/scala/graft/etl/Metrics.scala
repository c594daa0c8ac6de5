package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `blocklog` daily chain-metrics table — the reference's per-day
  * per-chain rollup row (ref substrateetl.js:9440-9508
  * update_blocklog_bulk: count(*), sum(if(signed,1,0)), sum(fee),
  * count(distinct signer), sum(ifnull(amount_usd,0)) over the loaded
  * day tables; stored in MySQL `blocklog` and re-rolled into the
  * chain registry's 7d/30d columns) — composed over the DUMPED entity
  * tables and landed as a date partition like everything else.
  *
  * Every input is one groupBy(chain_id) with map-side combine; the
  * final assembly is a chain-keyed left-join chain off the blocks
  * rollup (blocks exist whenever the day exists). Money sums ride
  * exact decimals rendered as rounded doubles (the repo's
  * determinism contract), so the row is replayable cross-engine. */
object Metrics {

  def blocklogDay(blocks: DataFrame, extrinsics: DataFrame,
      events: DataFrame, transfers: DataFrame,
      active: DataFrame): DataFrame = {
    def dec6(c: org.apache.spark.sql.Column) = c.cast("decimal(38,6)")
    def out(c: org.apache.spark.sql.Column) =
      round(c.cast("double"), 6)
    val b = blocks.groupBy(col("chain_id")).agg(
      count(lit(1)).as("n_blocks"),
      min(col("number")).as("min_block"),
      max(col("number")).as("max_block"))
    val e = extrinsics.groupBy(col("chain_id")).agg(
      count(lit(1)).as("n_extrinsics"),
      sum(col("signed").cast("long")).as("n_signed"),
      countDistinct(when(col("signed"), col("signer_pub_key")))
        .as("n_signers"),
      out(sum(dec6(col("fee")))).as("fees"),
      out(sum(dec6(col("fee_usd")))).as("fees_usd"))
    val ev = events.groupBy(col("chain_id")).agg(
      count(lit(1)).as("n_events"))
    val tr = transfers.groupBy(col("chain_id")).agg(
      count(lit(1)).as("n_transfers"),
      out(sum(dec6(coalesce(col("amount_usd"), lit(0.0)))))
        .as("value_usd"))
    val ac = active.groupBy(col("chain_id")).agg(
      count(lit(1)).as("n_accounts_active"))
    b.join(e, Seq("chain_id"), "left")
      .join(ev, Seq("chain_id"), "left")
      .join(tr, Seq("chain_id"), "left")
      .join(ac, Seq("chain_id"), "left")
  }

  /** Write the day's blocklog rows as an idempotent date partition
    * (the reference upserts one MySQL row per (chain, day)). Returns
    * a schema-supplied read-back of the written layout — empty days
    * stay readable (the Accounts convention). */
  def dumpBlocklogDay(blocks: DataFrame, extrinsics: DataFrame,
      events: DataFrame, transfers: DataFrame, active: DataFrame,
      logDT: String, outRoot: String): DataFrame = {
    val out = blocklogDay(blocks, extrinsics, events, transfers, active)
      .withColumn("log_dt", lit(logDT))
    Writers.overwritePartitions(out, s"$outRoot/blocklog", Seq("log_dt"))
    blocks.sparkSession.read.schema(out.schema)
      .parquet(s"$outRoot/blocklog")
  }
}
