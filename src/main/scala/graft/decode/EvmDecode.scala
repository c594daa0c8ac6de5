package graft.decode

import graft.functions.{Codec, Keccak}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EVM face — SURVEY P11 (ref indexer.js:5330
  * combine_tx_with_receipt_status, 5113 crawl_erc_tokens; ethTool.js:
  * the ABI decode surface at 247-310): transaction+receipt+status
  * merge, ERC-20/721/1155 transfer extraction from receipt logs, and
  * tx-input selector decode — all as the same declarative join/filter
  * shapes the substrate face uses (the only UDFs are hex→uint256 and
  * the ERC-1155 batch-array parse; everything else is codegen'd
  * substring/when arithmetic).
  */
object EvmDecode {

  /** keccak topic0 of the canonical ERC-20/721 Transfer event. */
  val TransferTopic: String =
    Keccak.topic("Transfer(address,address,uint256)")

  /** ERC-1155 TransferSingle / TransferBatch topic0s (ref ethTool.js:310
    * erc1155 ABI). */
  val TransferSingleTopic: String =
    Keccak.topic("TransferSingle(address,address,address,uint256,uint256)")
  val TransferBatchTopic: String =
    Keccak.topic("TransferBatch(address,address,address,uint256[],uint256[])")

  /** 4-byte function selector of an ABI signature: first 4 bytes of the
    * keccak hash (ref ethTool.js:247-310 func lists). */
  def selector(signature: String): String =
    Keccak.topic(signature).substring(0, 10)

  /** Merge transactions with their receipts; status resolved from the
    * receipt (ref indexer.js:5330). Left join: a tx with no receipt yet
    * is pending (status null). */
  def combineTxReceipt(txs: DataFrame, receipts: DataFrame): DataFrame = {
    // carried for the dump tier when the receipt frame has them
    // (EvmDump.evmtxsOf consumes the SAME combined frame — one
    // tx⋈receipt shuffle per day); slim decode-tier receipt frames
    // stay valid, the columns null out
    def opt(name: String, tpe: String): Column =
      if (receipts.columns.contains(name)) col(name)
      else lit(null).cast(tpe).as(name)
    txs.join(
        receipts.select(
          col("transaction_hash"),
          col("status").as("receipt_status"),
          col("gas_used"), col("effective_gas_price"),
          // a receipts frame without logs (the evmtxs-only contract,
          // EvmDump.evmtxsOf's doc) is valid — the column nulls out
          // and the transfer extractors simply find no logs
          opt("logs",
            "array<struct<address:string,topics:array<string>," +
              "data:string>>"),
          opt("cumulative_gas_used", "long"),
          opt("contract_address", "string")),
        Seq("transaction_hash"), "left")
      .withColumn("fee_wei",
        col("gas_used").cast("decimal(38,0)") *
          col("effective_gas_price").cast("decimal(38,0)"))
      .withColumn("success", col("receipt_status") === 1)
  }

  /** Row-local twin of [[combineTxReceipt]] for the realtime shape:
    * one row per tx with the receipt NESTED as a struct (the indexer
    * merges them per block, ethTool.js:830 — no separate receipt
    * stream exists). Each row's own struct is authoritative, so a
    * pending emission and a later mined re-emission of the same hash
    * stay two independent rows — a split-and-rejoin on the hash would
    * fan the one receipt onto BOTH rows and resurrect the pending row
    * as a duplicate mined row. Zero exchanges: pure projection. */
  def combineNested(txsWithReceipt: DataFrame): DataFrame =
    txsWithReceipt
      .withColumn("receipt_status", col("receipt.status"))
      .withColumn("gas_used", col("receipt.gas_used"))
      .withColumn("effective_gas_price",
        col("receipt.effective_gas_price"))
      .withColumn("logs", col("receipt.logs"))
      .withColumn("cumulative_gas_used",
        col("receipt.cumulative_gas_used"))
      .withColumn("contract_address", col("receipt.contract_address"))
      .drop("receipt")
      .withColumn("fee_wei",
        col("gas_used").cast("decimal(38,0)") *
          col("effective_gas_price").cast("decimal(38,0)"))
      .withColumn("success", col("receipt_status") === 1)

  // explicit DecimalType(38,0): the inferred type for a BigDecimal
  // return is Decimal(38,18), whose integer range (<1e20) silently
  // NULLs routine 18-decimal token amounts like 10^21. Java UDF API:
  // Spark 4 rejects the untyped Scala udf(f, dataType) form.
  private def hexToDec = udf(
    new org.apache.spark.sql.api.java.UDF1[String, java.math.BigDecimal] {
      override def call(h: String): java.math.BigDecimal =
        if (h == null || h.isEmpty || h == "0x") java.math.BigDecimal.ZERO
        else try new java.math.BigDecimal(
          BigInt(1, Codec.hexToBytes(h)).bigInteger)
        catch {
          // guarded-null policy: non-hex garbage in a log is malformed
          // input, not a stage-killing error
          case _: NumberFormatException | _: StringIndexOutOfBoundsException =>
            null
        }
    },
    org.apache.spark.sql.types.DecimalType(38, 0))

  /** String twin of [[hexToDec]] for the EXPORT tier: arbitrary
    * precision (keccak-derived uint256 token ids run to ~1e77, past any
    * fixed decimal), same guarded-null policy. The decode tier keeps
    * the decimal column for arithmetic; the dump renders from this. */
  private def hexToDecStr = udf((h: String) =>
    if (h == null || h.isEmpty || h == "0x") "0"
    else try BigInt(1, Codec.hexToBytes(h)).toString
    catch {
      case _: NumberFormatException | _: StringIndexOutOfBoundsException =>
        null
    })

  /** Block/chain metadata columns threaded through the log explode
    * when the input carries them — the dump tier needs them on every
    * transfer row, and carrying them through the explode is free while
    * a join back onto the tx frame is another exchange. */
  private def passthrough(txReceipts: DataFrame): Seq[Column] =
    Seq("chain_id", "block_timestamp", "block_hash")
      .filter(txReceipts.columns.contains).map(col)

  private def explodedLogs(txReceipts: DataFrame): DataFrame =
    txReceipts
      .select(Seq(col("transaction_hash"), col("block_number"),
        posexplode(col("logs")).as(Seq("log_index", "lg"))) ++
        passthrough(txReceipts): _*)

  /** Low 20 bytes of a 32-byte topic word as an 0x address. */
  private def topicAddr(t: Column): Column =
    concat(lit("0x"), substring(t, 27, 40))

  /** ERC-20 transfers from receipt logs: topic0 = Transfer signature,
    * from/to = topics 1/2 (last 20 bytes), value = data as u256
    * (ref indexer.js:5113; ethTool ERC-20 handling). `logs` is an array
    * of structs (address, topics ARRAY<STRING>, data). */
  def erc20Transfers(txReceipts: DataFrame): DataFrame =
    explodedLogs(txReceipts)
      .filter(size(col("lg.topics")) === 3 &&
        col("lg.topics")(0) === TransferTopic)
      .select(Seq(
        col("transaction_hash"),
        col("block_number"),
        col("log_index"),
        col("lg.address").as("token_address"),
        // topics are 32-byte words; the address is the low 20 bytes
        topicAddr(col("lg.topics")(1)).as("from_address"),
        topicAddr(col("lg.topics")(2)).as("to_address"),
        hexToDec(col("lg.data")).as("raw_value"),
        // unbounded decimal string — the export column; the decimal
        // twin above caps at 1e38 (guarded null) for arithmetic use
        hexToDecStr(col("lg.data")).as("raw_value_str")) ++
        passthrough(txReceipts): _*)

  /** ERC-721 transfers: the SAME Transfer signature as ERC-20, but the
    * tokenId is indexed → 4 topics and empty data — the topic-count
    * disambiguation ethTool's erc721ABI encodes (ref ethTool.js:120). */
  def erc721Transfers(txReceipts: DataFrame): DataFrame =
    explodedLogs(txReceipts)
      .filter(size(col("lg.topics")) === 4 &&
        col("lg.topics")(0) === TransferTopic)
      .select(Seq(
        col("transaction_hash"),
        col("block_number"),
        col("log_index"),
        col("lg.address").as("token_address"),
        topicAddr(col("lg.topics")(1)).as("from_address"),
        topicAddr(col("lg.topics")(2)).as("to_address"),
        hexToDec(col("lg.topics")(3)).as("token_id"),
        // ENS-style keccak-derived ids exceed any fixed decimal — the
        // export renders from this unbounded string
        hexToDecStr(col("lg.topics")(3)).as("token_id_str")) ++
        passthrough(txReceipts): _*)

  /** ERC-1155 TransferSingle + TransferBatch, normalized to one row per
    * (token_id, value) — batches are ABI dynamic uint256[] pairs in the
    * data word-stream (offset, offset, len, elems…), parsed by a typed
    * UDF and exploded (ref ethTool.js:122 erc1155 ABI). */
  def erc1155Transfers(txReceipts: DataFrame): DataFrame = {
    val logs = explodedLogs(txReceipts)
    val base = Seq(
      col("transaction_hash"), col("block_number"), col("log_index"),
      col("lg.address").as("token_address"),
      topicAddr(col("lg.topics")(1)).as("operator"),
      topicAddr(col("lg.topics")(2)).as("from_address"),
      topicAddr(col("lg.topics")(3)).as("to_address"))
    val single = logs
      .filter(size(col("lg.topics")) === 4 &&
        col("lg.topics")(0) === TransferSingleTopic)
      // data = two 32-byte words: id ‖ value
      .select(base ++ Seq(
        hexToDec(substring(col("lg.data"), 3, 64)).as("token_id"),
        hexToDec(substring(col("lg.data"), 67, 64)).as("raw_value"),
        hexToDecStr(substring(col("lg.data"), 3, 64)).as("token_id_str"),
        hexToDecStr(substring(col("lg.data"), 67, 64))
          .as("raw_value_str")) ++ passthrough(txReceipts): _*)
    // returns decimal STRINGS: a java.math.BigDecimal return would be
    // inferred as Decimal(38,18) and silently NULL ids/amounts ≥ 1e20.
    // Guarded: any contract can emit a log with this topic0 and garbage
    // data — malformed word-streams yield zero rows, not a dead stage.
    val parseBatch = udf((data: String) => {
      try {
        if (data == null || data.length < 2 + 4 * 64)
          Seq.empty[(String, String)]
        else {
          val hex = data.stripPrefix("0x")
          def word(i: Int): BigInt =
            BigInt(1, Codec.hexToBytes(hex.substring(i * 64, i * 64 + 64)))
          // words 0/1: byte offsets of ids / values (÷32 → word index)
          val idsAt = (word(0) / 32).toInt
          val valsAt = (word(1) / 32).toInt
          val n = word(idsAt).toInt
          require(word(valsAt).toInt == n, "ids/values length mismatch")
          (0 until n).map { i =>
            (word(idsAt + 1 + i).toString, word(valsAt + 1 + i).toString)
          }
        }
      } catch { case _: Exception => Seq.empty[(String, String)] }
    })
    val batch = logs
      .filter(size(col("lg.topics")) === 4 &&
        col("lg.topics")(0) === TransferBatchTopic)
      .select(base ++ Seq(explode(parseBatch(col("lg.data")))
        .as("pair")) ++ passthrough(txReceipts): _*)
      .select(Seq(col("transaction_hash"), col("block_number"),
        col("log_index"), col("token_address"), col("operator"),
        col("from_address"), col("to_address"),
        col("pair._1").cast("decimal(38,0)").as("token_id"),
        col("pair._2").cast("decimal(38,0)").as("raw_value"),
        // the parser already yields unbounded decimal strings — the
        // decimal casts above null out ≥1e38, these never do
        col("pair._1").as("token_id_str"),
        col("pair._2").as("raw_value_str")) ++
        passthrough(txReceipts): _*)
    single.unionByName(batch)
  }

  // ---- tx input (calldata) ABI decode ----

  /** The scoped selector table (ref ethTool.js:247-310 erc20/721/1155
    * func lists). Args are static 32-byte words after the 4-byte
    * selector; `a` = address (low 20 bytes), `u` = uint256. */
  private val knownSelectors: Seq[(String, String, String)] = Seq(
    ("transfer(address,uint256)", "transfer", "au"),
    ("transferFrom(address,address,uint256)", "transferFrom", "aau"),
    ("approve(address,uint256)", "approve", "au"),
    ("safeTransferFrom(address,address,uint256)", "safeTransferFrom", "aau"),
    ("safeTransferFrom(address,address,uint256,bytes)",
      "safeTransferFrom", "aau"),
    ("safeTransferFrom(address,address,uint256,uint256,bytes)",
      "safeTransferFrom1155", "aauu"),
    ("setApprovalForAll(address,bool)", "setApprovalForAll", "au"))

  /** Decode the tx `input` column: 4-byte selector → method name +
    * normalized (to_address, token_id/value) columns for the scoped
    * token methods; unknown selectors keep method null (the reference
    * stores the selector and moves on — decode, don't reject). Pure
    * substring/when arithmetic: fully codegen'd, no UDF.
    *
    * This is the curated token projection (fixed columns across
    * methods); ARBITRARY methods — multicall, ERC-4337 handleOps, any
    * held ABI — decode through [[AbiDecode.decodeCalldata]]'s
    * function-fragment compiler (ref ethTool.js
    * decodeTransactionInput). */
  def decodeInput(txs: DataFrame): DataFrame = {
    val sel = lower(substring(col("input"), 1, 10))
    def word(i: Int): Column = substring(col("input"), 11 + i * 64, 64)
    def addrArg(i: Int): Column = concat(lit("0x"), substring(word(i), 25, 40))
    val method = knownSelectors.foldLeft(lit(null).cast("string")) {
      case (acc, (sig, name, _)) =>
        when(sel === selector(sig), lit(name)).otherwise(acc)
    }
    // arg layout by shape: value = last uint word, to = last address word
    val decoded = txs
      .withColumn("selector", sel)
      .withColumn("method", method)
      .withColumn("arg_to",
        when(col("method").isin("transfer", "approve", "setApprovalForAll"),
          addrArg(0))
          .when(col("method").isin("transferFrom", "safeTransferFrom",
            "safeTransferFrom1155"), addrArg(1)))
      // safeTransferFrom(a,a,u) is ERC-721-only: its uint is a tokenId,
      // never a value. transferFrom's uint stays in arg_value — the
      // 0x23b872dd selector is genuinely shared between ERC-20 (amount)
      // and ERC-721 (tokenId); disambiguating needs the contract's
      // standard, which is a join away, not a calldata property.
      .withColumn("arg_value_hex",
        when(col("method").isin("transfer", "approve"), word(1))
          .when(col("method") === "transferFrom", word(2))
          .when(col("method") === "safeTransferFrom1155", word(3)))
      .withColumn("arg_token_id_hex",
        when(col("method") === "safeTransferFrom", word(2))
          .when(col("method") === "safeTransferFrom1155", word(2)))
    decoded
      .withColumn("arg_value",
        when(col("arg_value_hex").isNotNull, hexToDec(col("arg_value_hex"))))
      .withColumn("arg_token_id",
        when(col("arg_token_id_hex").isNotNull,
          hexToDec(col("arg_token_id_hex"))))
      .drop("arg_value_hex", "arg_token_id_hex")
  }

  // ---- contract-creation tracking (ref evmManager.js decodeTransaction
  // `txn.creates` / receipt contractAddress; the derivations are the
  // yellow-paper CREATE rule and EIP-1014 CREATE2) ----

  /** Minimal RLP of the CREATE preimage `[sender(20 bytes), nonce]` —
    * the only shape the address rule needs. Integer rule: 0 → empty
    * string (0x80), 1..0x7f → the byte itself, else length-prefixed
    * big-endian with no leading zeros. */
  private def rlpCreate(sender: Array[Byte], nonce: Long): Array[Byte] = {
    require(sender.length == 20, "sender must be 20 bytes")
    require(nonce >= 0, "nonce must be non-negative")
    val nonceRlp: Array[Byte] =
      if (nonce == 0) Array(0x80.toByte)
      else if (nonce <= 0x7f) Array(nonce.toByte)
      else {
        val be = BigInt(nonce).toByteArray.dropWhile(_ == 0)
        (0x80 + be.length).toByte +: be
      }
    val payload = (0x94.toByte +: sender) ++ nonceRlp // 0x80+20 = 0x94
    (0xc0 + payload.length).toByte +: payload
  }

  /** CREATE address: keccak256(rlp([sender, nonce]))[12:], lowercase
    * 0x-hex (yellow paper eq. 77; ref ethTool contract tracking). */
  def createAddress(senderHex: String, nonce: Long): String =
    "0x" + Codec.bytesToHex(
      Keccak.keccak256(rlpCreate(Codec.hexToBytes(senderHex), nonce))
        .drop(12), prefix = false)

  /** CREATE2 address (EIP-1014):
    * keccak256(0xff ++ sender ++ salt32 ++ keccak256(initCode))[12:]. */
  def create2Address(senderHex: String, saltHex: String,
      initCodeHex: String): String = {
    val sender = Codec.hexToBytes(senderHex)
    require(sender.length == 20, "sender must be 20 bytes")
    val salt = Codec.hexToBytes(saltHex)
    require(salt.length == 32, "salt must be 32 bytes")
    val pre = Array(0xff.toByte) ++ sender ++ salt ++
      Keccak.keccak256(Codec.hexToBytes(initCodeHex))
    "0x" + Codec.bytesToHex(Keccak.keccak256(pre).drop(12),
      prefix = false)
  }

  private val createAddressUdf = udf(
    // boxed Long: a null nonce must propagate to a null address, not
    // silently unbox to 0 and derive the plausible nonce-0 address;
    // a malformed/truncated from_address quarantines to null instead
    // of throwing the whole job down ("decode, don't reject" — the
    // convention every other decode tier here follows)
    new org.apache.spark.sql.api.java.UDF2[String, java.lang.Long,
        String] {
      override def call(from: String, nonce: java.lang.Long): String =
        if (from == null || nonce == null) null
        else try createAddress(from, nonce)
        catch { case scala.util.control.NonFatal(_) => null }
    }, org.apache.spark.sql.types.DataTypes.StringType)

  /** Contract creations from a tx frame: a creation is a tx with no
    * `to_address` (ref evmManager.js decodeTransaction creates
    * handling); the created address derives deterministically from
    * (from_address, nonce), cross-checked against the receipt's
    * `contract_address` when present (`address_match` = false rows are
    * node/indexer inconsistencies worth surfacing, not dropping; rows
    * whose from_address would not decode keep a null created_address —
    * quarantined, visible, never fatal). The output is the
    * contracts-dimension feed `classifyContracts` consumes. */
  def contractCreations(txs: DataFrame): DataFrame =
    txs.filter(col("to_address").isNull)
      .withColumn("created_address",
        createAddressUdf(lower(col("from_address")), col("nonce")))
      .withColumn("address_match",
        when(col("contract_address").isNotNull,
          lower(col("contract_address")) === col("created_address")))

  // ---- contract-standard classification ----

  /** Required function selectors per token standard (ref
    * ethTool.js:255 detectERC20, :283 detectERC721, :312 detectERC1155
    * — the reference classifies a contract by whether its code exposes
    * every required selector). */
  private val Erc20Required = Seq("0x18160ddd", "0x70a08231",
    "0xa9059cbb", "0x23b872dd", "0x095ea7b3", "0xdd62ed3e")
  private val Erc721Required = Seq("0x70a08231", "0x6352211e",
    "0x42842e0e", "0xb88d4fde", "0x23b872dd", "0x095ea7b3",
    "0x081812fc", "0xa22cb465", "0xe985e9c5")
  private val Erc1155Required = Seq("0x00fdd58e", "0x4e1273f4",
    "0xa22cb465", "0xe985e9c5", "0xf242432a", "0x2eb2c2d6")

  /** Precompile / system-contract predicate (ref precompiles/README.md
    * + query.getAddressContract's isSystemContract mark): the
    * Ethereum-native precompiles (0x01-0x09) and the parachain
    * precompile banks (Moonbeam 0x0800-0x080d, Astar 0x5001-…, all
    * published ≤ 0xffff) live in the low address space — an H160 whose
    * first 18 bytes are zero is a system address, not a deployed
    * contract. Pure regex over the hex column, codegen'd. */
  def isSystemContract(addr: Column): Column =
    lower(addr).rlike("^0x0{36}[0-9a-f]{4}$")

  /** Classify contracts by required-selector subset: `standard` =
    * erc1155/erc721/erc20/unknown from the contract's selector set
    * (an `array<string>` column of 4-byte selectors, as extracted from
    * code metadata). Pure array_contains conjunctions — codegen'd, no
    * UDF; most-specific standard first (the 721 and 20 lists share
    * balanceOf/transferFrom/approve but each has members the other
    * lacks, so the order only matters for nonconforming hybrids). */
  def classifyContracts(contracts: DataFrame,
      selectorsCol: String = "selectors"): DataFrame = {
    def hasAll(sels: Seq[String]): Column =
      sels.map(s => array_contains(col(selectorsCol), s))
        .reduce(_ && _)
    contracts.withColumn("standard",
      when(hasAll(Erc1155Required), "erc1155")
        .when(hasAll(Erc721Required), "erc721")
        .when(hasAll(Erc20Required), "erc20")
        .otherwise("unknown"))
  }
}
