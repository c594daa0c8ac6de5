package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The account-metrics daily tables — the reference's DEFINITIONS.md
  * BigQuery surface composed over the DUMP LAYOUT and landed as
  * date-partitioned tables like every other export (ref
  * docs/DEFINITIONS.md:48-91 accountsactive, :106-177 accountspassive,
  * :204-234 accountsnew/accountsreaped; schemas
  * schema/accountsactive.json et al; loaded daily next to the entity
  * tables).
  *
  * Inputs are the dumped entity tables themselves (extrinsics, blocks,
  * transfers, balances partitions) — the composition closes the loop
  * from dump to metric without re-reading raw blocks. Every shape is
  * one union + one keyed aggregation or one anti-join: at 100 TB the
  * unions are column-pruned scans and the anti-joins shuffle on the
  * (chain, address) key exactly once.
  */
object Accounts {

  /** accountsactive (DEFINITIONS:48-91): signers of SIGNED extrinsics
    * ∪ block authors on the day — per account: max account type
    * ('validator' sorts above 'user', matching the reference's
    * max(accountType) pick), latest activity, action count. */
  def activeAccounts(extrinsics: DataFrame,
      blocks: DataFrame): DataFrame =
    extrinsics.filter(col("signed"))
      .select(col("chain_id"),
        col("signer_pub_key").as("address_pubkey"),
        lit("user").as("account_type"), col("block_time"))
      .unionByName(blocks.select(col("chain_id"),
        col("author_pub_key").as("address_pubkey"),
        lit("validator").as("account_type"), col("block_time")))
      .groupBy(col("chain_id"), col("address_pubkey"))
      .agg(max(col("account_type")).as("account_type"),
        max(col("block_time")).as("last_activity_ts"),
        count(lit(1)).as("n_actions"))

  /** accountspassive (DEFINITIONS:106-177): transfer participants who
    * took no active action that day — the NOT IN subquery as a
    * left-anti join on the (chain, address) key. */
  def passiveAccounts(transfers: DataFrame,
      active: DataFrame): DataFrame =
    transfers.select(col("chain_id"),
        col("from_pub_key").as("address_pubkey"), col("block_time"))
      .unionByName(transfers.select(col("chain_id"),
        col("to_pub_key").as("address_pubkey"), col("block_time")))
      .groupBy(col("chain_id"), col("address_pubkey"))
      .agg(max(col("block_time")).as("last_activity_ts"),
        count(lit(1)).as("n_touches"))
      .join(active.select("chain_id", "address_pubkey"),
        Seq("chain_id", "address_pubkey"), "left_anti")

  /** accountsnew (DEFINITIONS:204-234): addresses present in today's
    * balances partition but absent from the previous day's — the
    * day-over-day set difference. */
  def newAccounts(balancesToday: DataFrame,
      balancesPrev: DataFrame): DataFrame =
    balancesToday.select("chain_id", "address_pubkey").distinct()
      .join(balancesPrev.select("chain_id", "address_pubkey"),
        Seq("chain_id", "address_pubkey"), "left_anti")

  /** accountsreaped (the inverse difference: existed yesterday, gone
    * today — ref cleanReaped, substrateetl.js:718-805). */
  def reapedAccounts(balancesToday: DataFrame,
      balancesPrev: DataFrame): DataFrame =
    balancesPrev.select("chain_id", "address_pubkey").distinct()
      .join(balancesToday.select("chain_id", "address_pubkey"),
        Seq("chain_id", "address_pubkey"), "left_anti")

  /** Compose and write all four account tables as idempotent date
    * partitions (ref: the DEFINITIONS queries load
    * `accounts{active,passive,new,reaped}{paraID}$date` daily).
    *
    * Returns READ-BACK frames over the written layout with the
    * composed schema SUPPLIED — a day can legitimately produce zero
    * rows for a table (no new accounts, nothing passive), and an
    * empty partitioned write carries no parquet footers to infer a
    * schema from, so a bare read would throw; supplying the schema
    * makes empty days first-class for every consumer. (The persist on
    * `active` serves the two writes that consume it; the returned
    * frames are plain scans, so nothing recomputes downstream.) */
  def dumpAccountsDay(extrinsics: DataFrame, blocks: DataFrame,
      transfers: DataFrame, balancesToday: DataFrame,
      balancesPrev: DataFrame, logDT: String,
      outRoot: String): Map[String, DataFrame] = {
    val spark = extrinsics.sparkSession
    val active = activeAccounts(extrinsics, blocks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = Map(
        "accountsactive" -> active,
        "accountspassive" -> passiveAccounts(transfers, active),
        "accountsnew" -> newAccounts(balancesToday, balancesPrev),
        "accountsreaped" -> reapedAccounts(balancesToday, balancesPrev))
      tables.map { case (name, df) =>
        val written = df.withColumn("log_dt", lit(logDT))
        Writers.overwritePartitions(written, s"$outRoot/$name",
          Seq("log_dt"))
        name -> spark.read.schema(written.schema)
          .parquet(s"$outRoot/$name")
      }
    } finally active.unpersist(): Unit
  }
}
