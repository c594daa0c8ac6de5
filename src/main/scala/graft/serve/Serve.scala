package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Serving-layer query library — SURVEY §2.10 (ref api.js routes +
  * substrate/query.js) as pure DataFrame functions over the dump-layout
  * entity tables (etl/Dump outputs).
  *
  * The reference serves these from BigTable/MySQL point reads; on the
  * columnar layout the same semantics are partition-pruned + sorted
  * parquet scans (SURVEY §1.1: serving face = filters/limits; the
  * row-key designs become predicate pushdown — see docs/PLANS.md).
  */
object Serve {

  /** Q1 — getBlock + decoration (ref query.js:2924-2978): one block row
    * joined to its extrinsics. */
  def getBlock(blocks: DataFrame, extrinsics: DataFrame,
      chainId: Int, number: Long): DataFrame =
    blocks.filter(col("chain_id") === chainId && col("number") === number)
      .join(extrinsics.filter(col("chain_id") === chainId &&
            col("block_number") === number)
          .withColumnRenamed("hash", "extrinsic_hash"),
        Seq("chain_id"), "left")
      .orderBy(col("extrinsic_id"))

  /** Numeric sort keys from a "blockNumber-idx" extrinsic id —
    * lexicographic comparison would rank "99-0" after "100-1". */
  private def extBn: Column =
    split(col("extrinsic_id"), "-").getItem(0).cast("long")
  private def extIdx: Column =
    split(col("extrinsic_id"), "-").getItem(1).cast("long")

  /** Q2/W5 — account timeline tab, reverse-chronological with keyset
    * pagination (ref query.js:4544-4778: address#invertedTS scan →
    * ORDER BY desc + keyset predicate). The keyset is the full sort key
    * (ts, extrinsic_id) of the previous page's last row — a ts-only
    * bound would skip rows sharing the boundary timestamp (several
    * extrinsics per block share block_time routinely). */
  def accountTimeline(events: DataFrame, pubkey: String,
      chainFilter: Option[Seq[Int]], pageSize: Int,
      before: Option[(Long, String)]): DataFrame = {
    var df = events.filter(col("from_pub_key") === pubkey ||
      col("to_pub_key") === pubkey)
    chainFilter.foreach(cs => df = df.filter(col("chain_id").isin(cs: _*)))
    before.foreach { case (bUs, bId) =>
      val bBn = bId.split("-")(0).toLong
      val bIdx = bId.split("-")(1).toLong
      val ts = unix_micros(col("block_time"))
      df = df.filter(ts < bUs ||
        (ts === bUs && (extBn < bBn ||
          (extBn === bBn && extIdx < bIdx))))
    }
    df.orderBy(unix_micros(col("block_time")).desc,
        extBn.desc, extIdx.desc)
      .limit(pageSize)
  }

  /** Q3 — batched multi-account lookup (ref query.js:3666). */
  def multiAccount(transfers: DataFrame, pubkeys: Seq[String]): DataFrame =
    transfers.filter(col("from_pub_key").isin(pubkeys: _*) ||
      col("to_pub_key").isin(pubkeys: _*))

  /** Q4 — search-by-hash disambiguation (ref query.js:989-1195): try
    * block hash, then extrinsic hash. */
  def searchByHash(blocks: DataFrame, extrinsics: DataFrame,
      hash: String): DataFrame = {
    val b = blocks.filter(col("hash") === hash)
      .select(lit("block").as("kind"), col("chain_id"),
        col("number").as("block_number"), col("hash"))
    val e = extrinsics.filter(col("hash") === hash)
      .select(lit("extrinsic").as("kind"), col("chain_id"),
        col("block_number"), col("hash"))
    b.unionByName(e)
  }

  /** Q9 — realtime balances: latest transfer-derived position per
    * account via struct-argmax (ref query.js:3865 accountrealtime). */
  def latestActivity(transfers: DataFrame): DataFrame =
    transfers
      .select(col("from_pub_key").as("pubkey"), col("block_time"),
        col("extrinsic_id"), lit("out").as("direction"), col("amount"))
      .unionByName(transfers.select(col("to_pub_key").as("pubkey"),
        col("block_time"), col("extrinsic_id"), lit("in").as("direction"),
        col("amount")))
      .groupBy(col("pubkey"))
      // argmax over NUMERIC (ts, block, idx) — the raw id string would
      // compare lexicographically ("99-0" > "100-1")
      .agg(max(struct(unix_micros(col("block_time")).as("ts_us"),
        extBn.as("bn"), extIdx.as("idx"),
        col("extrinsic_id"), col("direction"), col("amount"))).as("m"))
      .select(col("pubkey"), col("m.ts_us").as("last_ts_us"),
        col("m.extrinsic_id").as("last_extrinsic_id"),
        col("m.direction").as("last_direction"),
        col("m.amount").as("last_amount"))
}
