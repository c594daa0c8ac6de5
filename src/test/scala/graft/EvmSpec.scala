package graft

import graft.decode.EvmDecode
import graft.functions.{Codec, Keccak}
import org.scalatest.funsuite.AnyFunSuite

/** Keccak golden vectors + the EVM decode shapes (P11). */
case class EvmLog(address: String, topics: Seq[String], data: String)

/** EVM wire-format test helpers — ONE copy across the EVM specs
  * (EvmSpec, EvmDumpSpec, StreamingEvmSpec). */
object EvmWire {
  /** 20-byte address left-padded to a 32-byte topic word. */
  def pad32(hex20: String): String = "0x" + "0" * 24 + hex20.drop(2)
  /** 32-byte hex word of a non-negative integer (no 0x prefix). */
  def word(v: BigInt): String = f"${v}%064x"
  def wordOf(v: Long): String = word(BigInt(v))
}

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

  import EvmWire.{pad32, word, wordOf}

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


  test("ERC-721 transfer: 4-topic form with indexed tokenId") {
    val from = "0x" + "aa" * 20
    val to = "0x" + "bb" * 20
    val logs = Seq(
      EvmLog("0xnft",
        Seq(EvmDecode.TransferTopic, pad32(from), pad32(to),
          "0x" + wordOf(7777L)), ""),
      // 3-topic ERC-20 form must NOT appear as a 721 transfer
      EvmLog("0xtoken",
        Seq(EvmDecode.TransferTopic, pad32(from), pad32(to)), "0x05"))
    val df = Seq(("0xt1", 100L, logs))
      .toDF("transaction_hash", "block_number", "logs")
    val out = EvmDecode.erc721Transfers(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("token_address") == "0xnft")
    assert(out(0).getAs[java.math.BigDecimal]("token_id")
      .toBigInteger.intValue == 7777)
    assert(EvmDecode.erc20Transfers(df).count() == 1) // the 3-topic one
  }

  test("ERC-1155 TransferSingle and TransferBatch extraction") {
    val op = "0x" + "cc" * 20
    val from = "0x" + "aa" * 20
    val to = "0x" + "bb" * 20
    val singleData = "0x" + wordOf(5L) + word(BigInt("1000000000000000000000"))
    // batch: offsets 0x40/0xa0, ids [1,2], values [10,20]
    val batchData = "0x" + wordOf(0x40L) + wordOf(0xa0L) +
      wordOf(2L) + wordOf(1L) + wordOf(2L) +
      wordOf(2L) + wordOf(10L) + wordOf(20L)
    val logs = Seq(
      EvmLog("0xmulti",
        Seq(EvmDecode.TransferSingleTopic, pad32(op), pad32(from),
          pad32(to)), singleData),
      EvmLog("0xmulti",
        Seq(EvmDecode.TransferBatchTopic, pad32(op), pad32(from),
          pad32(to)), batchData))
    val df = Seq(("0xt1", 100L, logs))
      .toDF("transaction_hash", "block_number", "logs")
    val out = EvmDecode.erc1155Transfers(df)
      .orderBy("token_id").collect()
      .map(r => (r.getAs[java.math.BigDecimal]("token_id").toBigInteger.intValue,
        r.getAs[java.math.BigDecimal]("raw_value").toBigInteger.toString))
    assert(out.toSeq == Seq(1 -> "10", 2 -> "20",
      5 -> "1000000000000000000000"))
  }

  test("tx input ABI decode: selectors, args, unknown passthrough") {
    val to = "bb" * 20
    val xfer = EvmDecode.selector("transfer(address,uint256)") +
      "0" * 24 + to + wordOf(123456L)
    val xferFrom = EvmDecode.selector("transferFrom(address,address,uint256)") +
      "0" * 24 + ("aa" * 20) + "0" * 24 + to + wordOf(99L)
    val sfrom1155 =
      EvmDecode.selector("safeTransferFrom(address,address,uint256,uint256,bytes)") +
        "0" * 24 + ("aa" * 20) + "0" * 24 + to + wordOf(7L) + wordOf(3L) +
        wordOf(0xa0L) + wordOf(0L)
    val sfrom721 =
      EvmDecode.selector("safeTransferFrom(address,address,uint256)") +
        "0" * 24 + ("aa" * 20) + "0" * 24 + to + wordOf(555L)
    val unknown = "0xdeadbeef" + wordOf(1L)
    val df = Seq(("0xt1", xfer), ("0xt2", xferFrom), ("0xt3", sfrom1155),
        ("0xt4", unknown), ("0xt5", sfrom721))
      .toDF("transaction_hash", "input")
    val out = EvmDecode.decodeInput(df).collect()
      .map(r => r.getAs[String]("transaction_hash") ->
        ((r.getAs[String]("method"), r.getAs[String]("arg_to"),
          Option(r.getAs[java.math.BigDecimal]("arg_value"))
            .map(_.toBigInteger.longValue),
          Option(r.getAs[java.math.BigDecimal]("arg_token_id"))
            .map(_.toBigInteger.longValue)))).toMap
    assert(out("0xt1") == (("transfer", "0x" + to, Some(123456L), None)))
    assert(out("0xt2") == (("transferFrom", "0x" + to, Some(99L), None)))
    assert(out("0xt3") ==
      (("safeTransferFrom1155", "0x" + to, Some(3L), Some(7L))))
    assert(out("0xt4")._1 == null &&
      out("0xt4")._2 == null) // unknown selector: kept, not decoded
    // 721 safeTransferFrom: the uint is a tokenId, NEVER a value —
    // token ids must not pollute value sums
    assert(out("0xt5") ==
      (("safeTransferFrom", "0x" + to, None, Some(555L))))
    // the selector column itself survives for unknowns
    val sel = EvmDecode.decodeInput(df)
      .filter($"transaction_hash" === "0xt4")
      .select("selector").head().getString(0)
    assert(sel == "0xdeadbeef")
  }

  test("tx input decode: truncated/garbage calldata never throws") {
    val truncated = EvmDecode.selector("transfer(address,uint256)") + "0012"
    val garbage = EvmDecode.selector("transfer(address,uint256)") +
      "zz" * 64 // non-hex arg words
    val df = Seq(("0xs1", truncated), ("0xs2", garbage), ("0xs3", "0x"),
        ("0xs4", null.asInstanceOf[String]))
      .toDF("transaction_hash", "input")
    val out = EvmDecode.decodeInput(df).collect()
      .map(r => r.getAs[String]("transaction_hash") ->
        Option(r.getAs[java.math.BigDecimal]("arg_value"))).toMap
    // guarded-null policy: short/garbage args yield ZERO/null values,
    // never a failed stage; all four rows survive
    assert(out.size == 4)
    assert(out("0xs2").isEmpty || out("0xs2").contains(
      java.math.BigDecimal.ZERO)) // non-hex → guarded
  }

  test("contract classification by required-selector subset") {
    val erc20 = Seq("0x18160ddd", "0x70a08231", "0xa9059cbb",
      "0x23b872dd", "0x095ea7b3", "0xdd62ed3e", "0x06fdde03")
    val erc721 = Seq("0x70a08231", "0x6352211e", "0x42842e0e",
      "0xb88d4fde", "0x23b872dd", "0x095ea7b3", "0x081812fc",
      "0xa22cb465", "0xe985e9c5")
    val erc1155 = Seq("0x00fdd58e", "0x4e1273f4", "0xa22cb465",
      "0xe985e9c5", "0xf242432a", "0x2eb2c2d6")
    val df = Seq(
      ("0xc20", erc20), ("0xc721", erc721), ("0xc1155", erc1155),
      ("0xpartial", erc20.drop(1)), // missing totalSupply
      ("0xempty", Seq.empty[String]))
      .toDF("address", "selectors")
    val out = EvmDecode.classifyContracts(df).collect()
      .map(r => r.getAs[String]("address") ->
        r.getAs[String]("standard")).toMap
    assert(out == Map("0xc20" -> "erc20", "0xc721" -> "erc721",
      "0xc1155" -> "erc1155", "0xpartial" -> "unknown",
      "0xempty" -> "unknown"))
  }

  // ---- ABI-JSON-driven decode (ref tools/udfs.sql:19-64) ----

  /** 64-hex two's-complement word of a (possibly negative) BigInt. */
  private def tcWord(v: BigInt): String =
    word(if (v < 0) v + (BigInt(1) << 256) else v)

  // the public UniswapV3Pool Swap fragment the reference UDF embeds
  private val swapAbi =
    """{"anonymous":false,"name":"Swap","type":"event","inputs":[
      |{"indexed":true,"internalType":"address","name":"sender","type":"address"},
      |{"indexed":true,"internalType":"address","name":"recipient","type":"address"},
      |{"indexed":false,"internalType":"int256","name":"amount0","type":"int256"},
      |{"indexed":false,"internalType":"int256","name":"amount1","type":"int256"},
      |{"indexed":false,"internalType":"uint160","name":"sqrtPriceX96","type":"uint160"},
      |{"indexed":false,"internalType":"uint128","name":"liquidity","type":"uint128"},
      |{"indexed":false,"internalType":"int24","name":"tick","type":"int24"}]}"""
      .stripMargin.replace("\n", "")

  test("ABI decode: UniswapV3 Swap from its ABI fragment alone") {
    import graft.decode.AbiDecode
    val e = AbiDecode.parseEvent(swapAbi)
    assert(AbiDecode.signature(e) ==
      "Swap(address,address,int256,int256,uint160,uint128,int24)")
    // the well-known public topic0 of UniswapV3 Swap
    assert(AbiDecode.topic0(e) ==
      "0xc42079f94a6350d7e6235f29174924f928cc2ac818eb64fed8004e115fbcca67")
    val sender = "0x" + "a1" * 20
    val recipient = "0x" + "b2" * 20
    val sqrtPrice = BigInt("79228162514264337593543950336") // 2^96
    val data = "0x" + tcWord(BigInt(-1500000)) + tcWord(BigInt(2750000)) +
      tcWord(sqrtPrice) + tcWord(BigInt(123456789L)) + tcWord(BigInt(-887272))
    val logs = Seq(
      (Seq(AbiDecode.topic0(e), pad32(sender), pad32(recipient)), data),
      (Seq(EvmDecode.TransferTopic, pad32(sender), pad32(recipient)),
        "0x" + tcWord(BigInt(7)))) // non-Swap row must filter out
      .toDF("topics", "data")
    val out = AbiDecode.decodeLogs(logs, swapAbi).select("decoded.*")
    val r = out.collect()
    assert(r.length == 1) // topic0 filter dropped the Transfer log
    val d = r.head
    assert(d.getAs[String]("sender") == sender)
    assert(d.getAs[String]("recipient") == recipient)
    assert(d.getAs[String]("amount0") == "-1500000")
    assert(d.getAs[String]("amount1") == "2750000")
    assert(d.getAs[String]("sqrtPriceX96") == sqrtPrice.toString)
    assert(d.getAs[String]("liquidity") == "123456789")
    assert(d.getAs[Long]("tick") == -887272L)
  }

  test("ABI decode: dynamic string param (ERC-1155 URI shape)") {
    import graft.decode.AbiDecode
    val uriAbi =
      """{"name":"URI","type":"event","inputs":[
        |{"indexed":false,"name":"value","type":"string"},
        |{"indexed":true,"name":"id","type":"uint256"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(uriAbi)
    assert(AbiDecode.signature(e) == "URI(string,uint256)")
    val s = "ipfs://QmHash/{id}.json"
    val payload = s.getBytes("UTF-8").map("%02x".format(_)).mkString
    // head offset word ‖ length word ‖ payload right-padded to a word
    val padded = payload + "0" * ((64 - payload.length % 64) % 64)
    val data = "0x" + tcWord(BigInt(0x20)) + tcWord(BigInt(s.length)) + padded
    val logs = Seq((Seq(AbiDecode.topic0(e), tcWord(BigInt(42))), data))
      .toDF("topics", "data")
    val d = AbiDecode.decodeLogs(logs, uriAbi)
      .select("decoded.*").collect().head
    assert(d.getAs[String]("value") == s)
    assert(d.getAs[String]("id") == "42")
  }

  test("ABI decode: dynamic uint256[] arrays (ERC-1155 TransferBatch)") {
    import graft.decode.AbiDecode
    val batchAbi =
      """{"name":"TransferBatch","type":"event","inputs":[
        |{"indexed":true,"name":"operator","type":"address"},
        |{"indexed":true,"name":"from","type":"address"},
        |{"indexed":true,"name":"to","type":"address"},
        |{"indexed":false,"name":"ids","type":"uint256[]"},
        |{"indexed":false,"name":"values","type":"uint256[]"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(batchAbi)
    // signature must agree with the hand table's topic constant
    assert(AbiDecode.topic0(e) == EvmDecode.TransferBatchTopic)
    val op = "0x" + "cc" * 20
    val from = "0x" + "aa" * 20
    val to = "0x" + "bb" * 20
    // offsets 0x40/0xa0, ids [1,2], values [10,20] — the exact word
    // stream the hand extractor's spec uses
    val data = "0x" + tcWord(BigInt(0x40)) + tcWord(BigInt(0xa0)) +
      tcWord(BigInt(2)) + tcWord(BigInt(1)) + tcWord(BigInt(2)) +
      tcWord(BigInt(2)) + tcWord(BigInt(10)) + tcWord(BigInt(20))
    val emptyData = "0x" + tcWord(BigInt(0x40)) + tcWord(BigInt(0x60)) +
      tcWord(BigInt(0)) + tcWord(BigInt(0))
    val logs = Seq(
      (Seq(AbiDecode.topic0(e), pad32(op), pad32(from), pad32(to)), data),
      (Seq(AbiDecode.topic0(e), pad32(op), pad32(from), pad32(to)),
        emptyData))
      .toDF("topics", "data")
    val rows = AbiDecode.decodeLogs(logs, batchAbi)
      .select("decoded.*").collect()
    val full = rows.find(_.getAs[scala.collection.Seq[String]]("ids")
      .nonEmpty).get
    assert(full.getAs[String]("operator") == op)
    assert(full.getAs[String]("from") == from &&
      full.getAs[String]("to") == to)
    assert(full.getAs[scala.collection.Seq[String]]("ids").toSeq ==
      Seq("1", "2"))
    assert(full.getAs[scala.collection.Seq[String]]("values").toSeq ==
      Seq("10", "20"))
    val empty = rows.find(
      _.getAs[scala.collection.Seq[String]]("ids").isEmpty).get
    assert(empty.getAs[scala.collection.Seq[String]]("values").isEmpty)
  }

  test("ABI decode: bytes[] and string[] — dynamic elements via " +
      "offset-of-offsets") {
    import graft.decode.AbiDecode
    // the ERC-4337 / multicall log shape: array elements are THEMSELVES
    // dynamic, so each element's head word is an offset relative to the
    // element area (after the length word), pointing at [len ‖ payload]
    val abi =
      """{"name":"Exec","type":"event","inputs":[
        |{"indexed":false,"name":"id","type":"uint256"},
        |{"indexed":false,"name":"payloads","type":"bytes[]"},
        |{"indexed":false,"name":"notes","type":"string[]"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(abi)
    assert(AbiDecode.signature(e) == "Exec(uint256,bytes[],string[])")
    def pw(hex: String) = hex + "0" * (64 - hex.length) // padded payload
    val longBytes = "11" * 32 + "2233" // 34 bytes — spans two words
    val data = "0x" +
      tcWord(BigInt(7)) + // id
      tcWord(BigInt(0x60)) + // payloads offset (after 3 head words)
      tcWord(BigInt(0x160)) + // notes offset
      // payloads: N=2; elem offsets rel to 0x80; [3‖abcdef]; [34‖…]
      tcWord(BigInt(2)) + tcWord(BigInt(0x40)) + tcWord(BigInt(0x80)) +
      tcWord(BigInt(3)) + pw("abcdef") +
      tcWord(BigInt(34)) + ("11" * 32) + pw("2233") +
      // notes: N=2; elem offsets rel to 0x180; [2‖"hi"]; [0‖] empty
      tcWord(BigInt(2)) + tcWord(BigInt(0x40)) + tcWord(BigInt(0x80)) +
      tcWord(BigInt(2)) + pw("6869") +
      tcWord(BigInt(0))
    // empty arrays still need the cast guard on the dynamic-elem path
    val emptyData = "0x" + tcWord(BigInt(9)) + tcWord(BigInt(0x60)) +
      tcWord(BigInt(0x80)) + tcWord(BigInt(0)) + tcWord(BigInt(0))
    val logs = Seq(
      (Seq(AbiDecode.topic0(e)), data),
      (Seq(AbiDecode.topic0(e)), emptyData)).toDF("topics", "data")
    val rows = AbiDecode.decodeLogs(logs, abi).select("decoded.*")
      .collect()
    val full = rows.find(_.getAs[String]("id") == "7").get
    assert(full.getAs[scala.collection.Seq[String]]("payloads").toSeq ==
      Seq("0xabcdef", "0x" + longBytes))
    assert(full.getAs[scala.collection.Seq[String]]("notes").toSeq ==
      Seq("hi", ""))
    val empty = rows.find(_.getAs[String]("id") == "9").get
    assert(empty.getAs[scala.collection.Seq[String]]("payloads").isEmpty)
    assert(empty.getAs[scala.collection.Seq[String]]("notes").isEmpty)
  }

  test("ABI decode: general dynamic composition — tuple[], string[k], " +
      "dynamic tuples, bytes[][]") {
    import graft.decode.AbiDecode
    val abi =
      """{"name":"Mixed","type":"event","inputs":[
        |{"indexed":false,"name":"pts","type":"tuple[]","components":[
        |  {"name":"x","type":"uint32"},{"name":"y","type":"uint32"}]},
        |{"indexed":false,"name":"pair","type":"string[2]"},
        |{"indexed":false,"name":"info","type":"tuple","components":[
        |  {"name":"id","type":"uint64"},{"name":"note","type":"string"}]},
        |{"indexed":false,"name":"blobs","type":"bytes[][]"},
        |{"indexed":false,"name":"tail","type":"address"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(abi)
    // canonical signature expands tuples per the ABI spec
    assert(AbiDecode.signature(e) ==
      "Mixed((uint32,uint32)[],string[2],(uint64,string),bytes[][],address)")
    def pw(hex: String) = hex + "0" * (64 - hex.length)
    val tailAddr = "0x" + "f6" * 20
    // 5 head words; dynamic regions laid out in declaration order
    val data = "0x" +
      tcWord(BigInt(0xa0)) + tcWord(BigInt(0x140)) +
      tcWord(BigInt(0x1e0)) + tcWord(BigInt(0x260)) +
      "0" * 24 + "f6" * 20 +
      // pts: len=2, inline static tuples (1,2),(3,4)
      tcWord(BigInt(2)) + tcWord(BigInt(1)) + tcWord(BigInt(2)) +
      tcWord(BigInt(3)) + tcWord(BigInt(4)) +
      // pair (string[2]): 2 offsets rel base; "ab"; ""
      tcWord(BigInt(0x40)) + tcWord(BigInt(0x80)) +
      tcWord(BigInt(2)) + pw("6162") + tcWord(BigInt(0)) +
      // info (uint64,string): id=9; note offset rel tuple base; "xyz"
      tcWord(BigInt(9)) + tcWord(BigInt(0x40)) +
      tcWord(BigInt(3)) + pw("78797a") +
      // blobs (bytes[][]): outer len=2; elem offsets rel after-length;
      // elem0 = ["0xaa"], elem1 = []
      tcWord(BigInt(2)) + tcWord(BigInt(0x40)) + tcWord(BigInt(0xc0)) +
      tcWord(BigInt(1)) + tcWord(BigInt(0x20)) +
      tcWord(BigInt(1)) + pw("aa") +
      tcWord(BigInt(0))
    val logs = Seq((Seq(AbiDecode.topic0(e)), data)).toDF("topics", "data")
    val d = AbiDecode.decodeLogs(logs, abi).select("decoded.*")
      .collect().head
    val pts = d.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("pts")
    assert(pts.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 4L)))
    assert(d.getAs[scala.collection.Seq[String]]("pair").toSeq ==
      Seq("ab", ""))
    val info = d.getAs[org.apache.spark.sql.Row]("info")
    // uint64 renders as a decimal string (can exceed a signed long)
    assert(info.getString(0) == "9" && info.getString(1) == "xyz")
    val blobs = d.getAs[scala.collection.Seq[
      scala.collection.Seq[String]]]("blobs")
    assert(blobs.map(_.toSeq).toSeq == Seq(Seq("0xaa"), Seq.empty))
    assert(d.getAs[String]("tail") == tailAddr)
  }

  test("ABI decode: empty nested dynamics keep their full types") {
    import graft.decode.AbiDecode
    val abi =
      """{"name":"Mixed","type":"event","inputs":[
        |{"indexed":false,"name":"pts","type":"tuple[]","components":[
        |  {"name":"x","type":"uint32"},{"name":"y","type":"uint32"}]},
        |{"indexed":false,"name":"blobs","type":"bytes[][]"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(abi)
    val data = "0x" + tcWord(BigInt(0x40)) + tcWord(BigInt(0x60)) +
      tcWord(BigInt(0)) + tcWord(BigInt(0))
    val logs = Seq((Seq(AbiDecode.topic0(e)), data)).toDF("topics", "data")
    val d = AbiDecode.decodeLogs(logs, abi).select("decoded.*")
      .collect().head
    assert(d.getAs[scala.collection.Seq[Any]]("pts").isEmpty)
    assert(d.getAs[scala.collection.Seq[Any]]("blobs").isEmpty)
  }

  test("ABI decode: alias canonicalization and static fixed arrays") {
    import graft.decode.AbiDecode
    // "uint"/"int" must canonicalize before hashing (ethers.js does) —
    // Transfer(address,address,uint) must hash as uint256
    val aliasAbi =
      """{"name":"Transfer","type":"event","inputs":[
        |{"indexed":true,"name":"from","type":"address"},
        |{"indexed":true,"name":"to","type":"address"},
        |{"indexed":false,"name":"value","type":"uint"}]}"""
        .stripMargin.replace("\n", "")
    val ae = AbiDecode.parseEvent(aliasAbi)
    assert(AbiDecode.signature(ae) ==
      "Transfer(address,address,uint256)")
    assert(AbiDecode.topic0(ae) == EvmDecode.TransferTopic)
    // uint256[2] is STATIC (inline words, no offset indirection)
    val fixedAbi =
      """{"name":"Pair","type":"event","inputs":[
        |{"indexed":false,"name":"reserves","type":"uint32[2]"},
        |{"indexed":false,"name":"who","type":"address"}]}"""
        .stripMargin.replace("\n", "")
    val fe = AbiDecode.parseEvent(fixedAbi)
    val who = "0x" + "d4" * 20
    val data = "0x" + tcWord(BigInt(11)) + tcWord(BigInt(22)) +
      "0" * 24 + "d4" * 20
    val logs = Seq((Seq(AbiDecode.topic0(fe)), data)).toDF("topics", "data")
    val d = AbiDecode.decodeLogs(logs, fixedAbi)
      .select("decoded.*").collect().head
    assert(d.getAs[scala.collection.Seq[Long]]("reserves").toSeq ==
      Seq(11L, 22L))
    assert(d.getAs[String]("who") == who)
  }

  test("ABI decode: tuple[k] slot accounting (array of static tuples)") {
    import graft.decode.AbiDecode
    // (uint32,uint32)[2] occupies FOUR words; the param after it must
    // decode from word 4, not word 2
    val abi =
      """{"name":"Pairs","type":"event","inputs":[
        |{"indexed":false,"name":"pts","type":"tuple[2]","components":[
        |  {"name":"x","type":"uint32"},{"name":"y","type":"uint32"}]},
        |{"indexed":false,"name":"who","type":"address"}]}"""
        .stripMargin.replace("\n", "")
    val e = AbiDecode.parseEvent(abi)
    val who = "0x" + "e5" * 20
    val data = "0x" + tcWord(BigInt(1)) + tcWord(BigInt(2)) +
      tcWord(BigInt(3)) + tcWord(BigInt(4)) + "0" * 24 + "e5" * 20
    val logs = Seq((Seq(AbiDecode.topic0(e)), data)).toDF("topics", "data")
    val d = AbiDecode.decodeLogs(logs, abi).select("decoded.*")
      .collect().head
    val pts = d.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("pts")
    assert(pts.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 4L)))
    assert(d.getAs[String]("who") == who) // word 4, not pair[1].x
  }

  // ---- function fragments: arbitrary calldata decode ----

  test("ABI calldata: selector goldens from signature canonicalization") {
    import graft.decode.AbiDecode
    def sel(json: String) = AbiDecode.selectorOf(AbiDecode.parseFunction(json))
    // the three most-verified selectors in the ecosystem: ERC-20
    // transfer, UniswapV3 multicall, ERC-4337 v0.6 handleOps — the
    // last exercises tuple-expansion + alias canonicalization in the
    // keccak preimage
    assert(sel("""{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}""")
      == "0xa9059cbb")
    assert(sel("""{"type":"function","name":"multicall","inputs":[
        {"name":"data","type":"bytes[]"}]}""") == "0xac9650d8")
    assert(sel(handleOpsAbi) == "0x1fad948c")
  }

  private val handleOpsAbi =
    """{"type":"function","name":"handleOps","inputs":[
      |{"name":"ops","type":"tuple[]","components":[
      |  {"name":"sender","type":"address"},
      |  {"name":"nonce","type":"uint256"},
      |  {"name":"initCode","type":"bytes"},
      |  {"name":"callData","type":"bytes"},
      |  {"name":"callGasLimit","type":"uint256"},
      |  {"name":"verificationGasLimit","type":"uint256"},
      |  {"name":"preVerificationGas","type":"uint256"},
      |  {"name":"maxFeePerGas","type":"uint256"},
      |  {"name":"maxPriorityFeePerGas","type":"uint256"},
      |  {"name":"paymasterAndData","type":"bytes"},
      |  {"name":"signature","type":"bytes"}]},
      |{"name":"beneficiary","type":"address"}]}"""
      .stripMargin.replace("\n", "")

  test("ABI calldata: multicall + static args + unknown selector kept") {
    import graft.decode.AbiDecode
    def pw(hex: String) = hex + "0" * ((64 - hex.length % 64) % 64)
    val transferAbi =
      """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}"""
    val multicallAbi =
      """{"type":"function","name":"multicall","inputs":[
        {"name":"data","type":"bytes[]"}]}"""
    val to = "0x" + "ab" * 20
    val transferInput = "0xa9059cbb" + "0" * 24 + "ab" * 20 +
      tcWord(BigInt("1000000000000000000"))
    // multicall(["0xabcdef", "0xdeadbeef"])
    val multicallInput = "0xac9650d8" +
      tcWord(BigInt(0x20)) + // bytes[] head offset
      tcWord(BigInt(2)) + tcWord(BigInt(0x40)) + tcWord(BigInt(0x80)) +
      tcWord(BigInt(3)) + pw("abcdef") +
      tcWord(BigInt(4)) + pw("deadbeef")
    val txs = Seq(
      ("0xt1", transferInput),
      ("0xt2", multicallInput),
      ("0xt3", "0x12345678" + tcWord(BigInt(1))), // unknown selector
      ("0xt4", "0x")) // plain value transfer, no calldata
      .toDF("transaction_hash", "input")
    val out = AbiDecode.decodeCalldata(txs, Seq(transferAbi, multicallAbi))
      .select("transaction_hash", "selector", "method", "decoded_call")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out("0xt1")._2 == "transfer")
    assert(out("0xt1")._3 ==
      s"""{"to":"$to","value":"1000000000000000000"}""")
    assert(out("0xt2")._2 == "multicall")
    assert(out("0xt2")._3 == """{"data":["0xabcdef","0xdeadbeef"]}""")
    // the reference stores the selector and moves on — decode, don't
    // reject (ethTool.js decodeTransactionInput unknown branch)
    assert(out("0xt3") == ("0x12345678", null, null))
    assert(out("0xt4")._2 == null)
  }

  test("ABI calldata: ERC-4337 handleOps decodes via its fragment alone") {
    import graft.decode.AbiDecode
    def pw(hex: String) =
      hex + "0" * ((64 - hex.length % 64) % 64)
    val sender = "0x" + "aa" * 20
    val beneficiary = "0x" + "bb" * 20
    val sig65 = "cc" * 65
    // handleOps([op], beneficiary): ops offset 0x40, array len 1, elem
    // offset 0x20 (rel after-length), then the op tuple: 11 head words
    // with bytes offsets rel to the TUPLE base (0x160 = after heads),
    // tails in declaration order
    val opHeads =
      ("0" * 24 + "aa" * 20) + // sender
        tcWord(BigInt(5)) + // nonce
        tcWord(BigInt(0x160)) + // initCode offset
        tcWord(BigInt(0x180)) + // callData offset
        tcWord(BigInt(100000)) + tcWord(BigInt(200000)) +
        tcWord(BigInt(21000)) + tcWord(BigInt(30)) + tcWord(BigInt(2)) +
        tcWord(BigInt(0x1c0)) + // paymasterAndData offset
        tcWord(BigInt(0x1e0)) // signature offset
    val opTails =
      tcWord(BigInt(0)) + // initCode: empty
        tcWord(BigInt(4)) + pw("b61d27f6") + // callData: 4 bytes
        tcWord(BigInt(0)) + // paymasterAndData: empty
        tcWord(BigInt(65)) + pw(sig65) // signature: 65 bytes, 3 words
    val input = "0x1fad948c" +
      tcWord(BigInt(0x40)) + ("0" * 24 + "bb" * 20) +
      tcWord(BigInt(1)) + tcWord(BigInt(0x20)) + opHeads + opTails
    val txs = Seq(("0xop1", input)).toDF("transaction_hash", "input")
    // typed decode via the column compiler (no JSON hop)
    val f = AbiDecode.parseFunction(handleOpsAbi)
    val cols = AbiDecode.decodedCallColumns(f,
      org.apache.spark.sql.functions.col("input"))
      .map { case (n, c) => c.as(n) }
    val row = txs.select(cols: _*).collect().head
    assert(row.getAs[String]("beneficiary") == beneficiary)
    val ops = row.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("ops")
    assert(ops.length == 1)
    val op = ops.head
    assert(op.getAs[String]("sender") == sender)
    assert(op.getAs[String]("nonce") == "5")
    assert(op.getAs[String]("initCode") == "0x")
    assert(op.getAs[String]("callData") == "0xb61d27f6")
    assert(op.getAs[String]("callGasLimit") == "100000")
    assert(op.getAs[String]("maxPriorityFeePerGas") == "2")
    assert(op.getAs[String]("paymasterAndData") == "0x")
    assert(op.getAs[String]("signature") == "0x" + sig65)
    // and the set-dispatch face agrees
    val viaSet = AbiDecode.decodeCalldata(txs, Seq(handleOpsAbi))
      .select("method", "decoded_call").collect().head
    assert(viaSet.getString(0) == "handleOps")
    assert(viaSet.getString(1).contains("\"sender\":\"" + sender))
  }

  test("system-contract predicate: precompile banks vs deployed code") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "0x0000000000000000000000000000000000000001", // ECRecover
      "0x0000000000000000000000000000000000000808", // Moonbeam batch
      "0x0000000000000000000000000000000000005004", // Astar bank
      "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", // deployed
      "0x0000000000000000000000010000000000000001") // high byte set
      .toDF("addr")
      .withColumn("sys", EvmDecode.isSystemContract(col("addr")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("0x0000000000000000000000000000000000000001"))
    assert(rows("0x0000000000000000000000000000000000000808"))
    assert(rows("0x0000000000000000000000000000000000005004"))
    assert(!rows("0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0"))
    assert(!rows("0x0000000000000000000000010000000000000001"))
  }

  test("contract creations: null nonce yields null address, not the " +
      "nonce-0 derivation") {
    val txs = Seq(
      ("0xp1", None: Option[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0",
        None: Option[Long], None: Option[String]),
      ("0xp2", None: Option[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0",
        Some(0L), None: Option[String]))
      .toDF("transaction_hash", "to_address", "from_address", "nonce",
        "contract_address")
    val out = EvmDecode.contractCreations(txs)
      .select("transaction_hash", "created_address").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("0xp1").isEmpty) // null nonce → no derivation
    assert(out("0xp2").contains(
      "0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d"))
  }

  test("ABI registry frame: selector/topic0 fingerprints per kind") {
    import graft.decode.AbiDecode
    val rows = AbiDecode.registryFrame(spark, Seq(
      """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}""",
      """{"type":"event","name":"Transfer","inputs":[
        {"indexed":true,"name":"from","type":"address"},
        {"indexed":true,"name":"to","type":"address"},
        {"indexed":false,"name":"value","type":"uint256"}]}"""))
      .collect().map(r => r.getString(2) ->
        (r.getString(0), r.getString(1), r.getString(3))).toMap
    assert(rows("transfer") ==
      ("0xa9059cbb", "call", "transfer(address,uint256)"))
    assert(rows("Transfer") == (EvmDecode.TransferTopic, "evt",
      "Transfer(address,address,uint256)"))
    // full contract ABIs carry constructor/fallback/receive entries —
    // they have no fingerprint and must be skipped, not crash the build
    val withCtor = graft.decode.AbiDecode.registryFrame(spark, Seq(
      """{"type":"constructor","inputs":[]}""",
      """{"type":"fallback"}""",
      """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}"""))
    assert(withCtor.count() == 1)
  }

  test("contract creation: CREATE and CREATE2 address goldens") {
    // the canonical worked example of the yellow-paper CREATE rule
    val deployer = "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0"
    assert(EvmDecode.createAddress(deployer, 0) ==
      "0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d")
    assert(EvmDecode.createAddress(deployer, 1) ==
      "0x343c43a37d37dff08ae8c4a11544c718abb4fcf8")
    // multi-byte nonce exercises the length-prefixed RLP integer branch
    assert(EvmDecode.createAddress(deployer, 0x1234).length == 42)
    // EIP-1014's own test vectors (examples 0, 1, 3)
    val z20 = "0x" + "00" * 20
    val z32 = "0x" + "00" * 32
    assert(EvmDecode.create2Address(z20, z32, "0x00") ==
      "0x4d1a2e2bb4f88f0250f26ffff098b0b30b26bf38")
    assert(EvmDecode.create2Address(
      "0xdeadbeef00000000000000000000000000000000", z32, "0x00") ==
      "0xb928f69bb1d91cd65274e3c79d8986362984fda3")
    assert(EvmDecode.create2Address(z20, z32, "0xdeadbeef") ==
      "0x70f2b2914a2a4b783faefb75f459a580616fcb5e")
  }

  test("contract creations frame: derived address + receipt cross-check") {
    val txs = Seq(
      // creation, receipt agrees
      ("0xc1", null.asInstanceOf[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", 0L,
        "0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d"),
      // creation, no receipt address yet (pending)
      ("0xc2", null.asInstanceOf[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", 1L,
        null.asInstanceOf[String]),
      // creation, receipt DISAGREES — surfaced, not dropped
      ("0xc3", null.asInstanceOf[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", 2L,
        "0x" + "99" * 20),
      // plain call — not a creation
      ("0xc4", "0x" + "11" * 20,
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", 3L,
        null.asInstanceOf[String]))
      .toDF("transaction_hash", "to_address", "from_address", "nonce",
        "contract_address")
    val out = EvmDecode.contractCreations(txs)
      .select("transaction_hash", "created_address", "address_match")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)))).toMap
    assert(out.size == 3) // 0xc4 excluded
    assert(out("0xc1") ==
      ("0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d", Some(true)))
    assert(out("0xc2")._1 ==
      "0x343c43a37d37dff08ae8c4a11544c718abb4fcf8")
    assert(out("0xc2")._2.isEmpty) // pending: no cross-check yet
    assert(out("0xc3")._2 == Some(false)) // inconsistency surfaced
  }

  test("contract creations: malformed from_address quarantines to null " +
      "instead of failing the job") {
    val txs = Seq(
      // truncated sender (19 bytes) — the require inside the derivation
      ("0xq1", null.asInstanceOf[String], "0x" + "ab" * 19, 0L,
        null.asInstanceOf[String]),
      // non-hex garbage — the hex parse
      ("0xq2", null.asInstanceOf[String], "0xzznothex", 1L,
        null.asInstanceOf[String]),
      // a healthy row in the same frame still derives
      ("0xq3", null.asInstanceOf[String],
        "0x6ac7ea33f8831ea9dcc53393aaa88b25a785dbf0", 0L,
        null.asInstanceOf[String]))
      .toDF("transaction_hash", "to_address", "from_address", "nonce",
        "contract_address")
    val out = EvmDecode.contractCreations(txs)
      .select("transaction_hash", "created_address").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("0xq1").isEmpty && out("0xq2").isEmpty)
    assert(out("0xq3").contains(
      "0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d"))
  }

  test("ABI registry frame: a whole contract ABI as one array string " +
      "expands into fragments; non-fragment JSON rejects loudly") {
    import graft.decode.AbiDecode
    val contractAbi =
      """[{"type":"constructor","inputs":[]},
         {"type":"function","name":"transfer","inputs":[
           {"name":"to","type":"address"},
           {"name":"value","type":"uint256"}]},
         {"type":"event","name":"Transfer","inputs":[
           {"indexed":true,"name":"from","type":"address"},
           {"indexed":true,"name":"to","type":"address"},
           {"indexed":false,"name":"value","type":"uint256"}]},
         {"name":"balanceOf","inputs":[
           {"name":"owner","type":"address"}]}]"""
    val rows = AbiDecode.registryFrame(spark, Seq(contractAbi))
      .collect().map(r => r.getString(2) ->
        (r.getString(0), r.getString(1))).toMap
    // ctor skipped; typeless-but-named balanceOf defaults to function
    assert(rows.keySet == Set("transfer", "Transfer", "balanceOf"))
    assert(rows("transfer")._1 == "0xa9059cbb")
    assert(rows("balanceOf") == ("0x70a08231", "call"))
    // a bare scalar is not an ABI fragment — error, not a bogus row
    intercept[IllegalArgumentException](
      AbiDecode.registryFrame(spark, Seq(""""just a string"""")).count())
    // a typeless NAMELESS object is not a fragment either — skipped
    assert(AbiDecode.registryFrame(spark,
      Seq("""{"inputs":[]}""")).count() == 0)
  }

  test("ABI calldata: truncated/garbage inputs decode to nulls, never " +
      "throw") {
    import graft.decode.AbiDecode
    val multicallAbi =
      """{"type":"function","name":"multicall","inputs":[
        {"name":"data","type":"bytes[]"}]}"""
    val transferAbi =
      """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}"""
    val good = "0xac9650d8" + tcWord(BigInt(0x20)) + tcWord(BigInt(0))
    val txs = Seq(
      ("0xok", good),
      ("0xsel", "0xac9650d8"), // selector only, no body
      ("0xhalf", "0xac9650d8" + "00" * 20), // truncated mid-word
      ("0xjunk", "0xac9650d8" + "zz" * 32), // non-hex body
      ("0xempty", ""),
      ("0xnull", null.asInstanceOf[String]))
      .toDF("transaction_hash", "input")
    // must evaluate without throwing; matching-selector rows with
    // malformed bodies yield null/empty decodes, not exceptions
    val out = AbiDecode.decodeCalldata(txs, Seq(multicallAbi, transferAbi))
      .select("transaction_hash", "method", "decoded_call")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out("0xok") == ("multicall", """{"data":[]}"""))
    assert(out("0xempty")._1 == null)
    assert(out("0xnull")._1 == null)
    // truncated bodies keep the method name (the selector matched) —
    // the decode payload may be null or degenerate but never an error
    assert(out("0xsel")._1 == "multicall")
    assert(out("0xhalf")._1 == "multicall")
    assert(out("0xjunk")._1 == "multicall")
  }

  test("ABI calldata: duplicate selectors are rejected at compile time") {
    import graft.decode.AbiDecode
    val t1 = """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint256"}]}"""
    // uint is an alias of uint256 — same canonical signature, same
    // selector: the dispatch would be ambiguous
    val t2 = """{"type":"function","name":"transfer","inputs":[
        {"name":"to","type":"address"},{"name":"value","type":"uint"}]}"""
    val txs = Seq(("0xt", "0x")).toDF("transaction_hash", "input")
    intercept[IllegalArgumentException] {
      AbiDecode.decodeCalldata(txs, Seq(t1, t2))
    }
  }
}
