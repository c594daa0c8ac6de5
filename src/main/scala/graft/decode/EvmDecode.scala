package graft.decode

import graft.functions.{Codec, Keccak}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EVM face — SURVEY P11 (ref indexer.js:5330
  * combine_tx_with_receipt_status, 5113 crawl_erc_tokens; ethTool.js):
  * transaction+receipt+status merge and ERC-20 transfer extraction from
  * receipt logs, as the same declarative join/filter shapes the
  * substrate face uses.
  */
object EvmDecode {

  /** keccak topic0 of the canonical ERC-20/721 Transfer event. */
  val TransferTopic: String =
    Keccak.topic("Transfer(address,address,uint256)")

  /** Merge transactions with their receipts; status resolved from the
    * receipt (ref indexer.js:5330). Left join: a tx with no receipt yet
    * is pending (status null). */
  def combineTxReceipt(txs: DataFrame, receipts: DataFrame): DataFrame =
    txs.join(
        receipts.select(
          col("transaction_hash"),
          col("status").as("receipt_status"),
          col("gas_used"), col("effective_gas_price"), col("logs")),
        Seq("transaction_hash"), "left")
      .withColumn("fee_wei",
        col("gas_used").cast("decimal(38,0)") *
          col("effective_gas_price").cast("decimal(38,0)"))
      .withColumn("success", col("receipt_status") === 1)

  /** ERC-20 transfers from receipt logs: topic0 = Transfer signature,
    * from/to = topics 1/2 (last 20 bytes), value = data as u256
    * (ref indexer.js:5113; ethTool ERC-20 handling). `logs` is an array
    * of structs (address, topics ARRAY<STRING>, data). */
  def erc20Transfers(txReceipts: DataFrame): DataFrame = {
    // explicit DecimalType(38,0): the inferred type for a BigDecimal
    // return is Decimal(38,18), whose integer range (<1e20) silently
    // NULLs routine 18-decimal token amounts like 10^21. Java UDF API:
    // Spark 4 rejects the untyped Scala udf(f, dataType) form.
    val hexToDec = udf(
      new org.apache.spark.sql.api.java.UDF1[String, java.math.BigDecimal] {
        override def call(h: String): java.math.BigDecimal =
          if (h == null || h.isEmpty || h == "0x") java.math.BigDecimal.ZERO
          else new java.math.BigDecimal(
            BigInt(1, Codec.hexToBytes(h)).bigInteger)
      },
      org.apache.spark.sql.types.DecimalType(38, 0))
    txReceipts
      .select(col("transaction_hash"), col("block_number"),
        posexplode(col("logs")).as(Seq("log_index", "lg")))
      .filter(size(col("lg.topics")) === 3 &&
        col("lg.topics")(0) === TransferTopic)
      .select(
        col("transaction_hash"),
        col("block_number"),
        col("log_index"),
        col("lg.address").as("token_address"),
        // topics are 32-byte words; the address is the low 20 bytes
        concat(lit("0x"), substring(col("lg.topics")(1), 27, 40))
          .as("from_address"),
        concat(lit("0x"), substring(col("lg.topics")(2), 27, 40))
          .as("to_address"),
        hexToDec(col("lg.data")).as("raw_value"))
  }
}
