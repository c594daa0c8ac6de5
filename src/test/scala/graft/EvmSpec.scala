package graft

import graft.decode.EvmDecode
import graft.functions.{Codec, Keccak}
import org.scalatest.funsuite.AnyFunSuite

/** Keccak golden vectors + the EVM decode shapes (P11). */
case class EvmLog(address: String, topics: Seq[String], data: String)

class EvmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("keccak256 golden vectors") {
    // the two most-verified constants in the EVM ecosystem:
    assert(Codec.bytesToHex(Keccak.keccak256(Array.empty), prefix = false) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(EvmDecode.TransferTopic ==
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef")
    // multi-block input exercises the absorb loop (rate 136)
    val big = Array.fill[Byte](500)(0x61)
    assert(Keccak.keccak256(big).length == 32)
    assert(!java.util.Arrays.equals(
      Keccak.keccak256(big), Keccak.keccak256(big.take(499))))
  }

  private def pad32(hex20: String) = "0x" + "0" * 24 + hex20.drop(2)

  test("tx+receipt merge resolves status and fee") {
    val txs = Seq(
      ("0xt1", 100L, "0xfrom1"), ("0xt2", 100L, "0xfrom2"),
      ("0xt3", 101L, "0xfrom3") // pending: no receipt
    ).toDF("transaction_hash", "block_number", "from_address")
    val receipts = Seq(
      ("0xt1", 1, 21000L, 50L,
        Seq.empty[(String, Seq[String], String)]),
      ("0xt2", 0, 40000L, 60L,
        Seq.empty[(String, Seq[String], String)])
    ).toDF("transaction_hash", "status", "gas_used",
      "effective_gas_price", "logs")
    val out = EvmDecode.combineTxReceipt(txs, receipts)
      .select("transaction_hash", "success", "fee_wei").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)).map(_.toString))).toMap
    assert(out("0xt1") == (Some(true), Some(BigDecimal(21000L * 50).toString)))
    assert(out("0xt2")._1 == Some(false))
    assert(out("0xt3") == (None, None)) // pending
  }

  test("ERC-20 transfer extraction from receipt logs") {
    val from = "0x" + "aa" * 20
    val to = "0x" + "bb" * 20
    val logs = Seq(
      // a Transfer log: topic0 = signature, topics 1/2 = padded addrs
      EvmLog("0xtoken",
        Seq(EvmDecode.TransferTopic, pad32(from), pad32(to)),
        "0x3635c9adc5dea00000"), // 10^21 — overflows Decimal(38,18) inference
      // a non-transfer log (wrong topic0)
      EvmLog("0xtoken", Seq("0x" + "11" * 32, pad32(from), pad32(to)),
        "0x01"),
      // an approval-shaped 3-topic log with different signature
      EvmLog("0xother", Seq("0x" + "22" * 32, pad32(from), pad32(to)),
        "0x02")
    )
    val df = Seq(("0xt1", 100L, logs))
      .toDF("transaction_hash", "block_number", "logs")
    val out = EvmDecode.erc20Transfers(df).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("token_address") == "0xtoken")
    assert(r.getAs[String]("from_address") == from)
    assert(r.getAs[String]("to_address") == to)
    assert(r.getAs[java.math.BigDecimal]("raw_value")
      .toBigInteger.toString == "1000000000000000000000")
  }
}
