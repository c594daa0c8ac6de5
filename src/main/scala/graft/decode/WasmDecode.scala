package graft.decode

import graft.functions.Codec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ink!/WASM contract message decode (ref
  * substrate/test/testWASMContractDecode.js): call data is a 4-byte
  * selector followed by SCALE-encoded args; the contract's metadata
  * (per code hash) maps selector → message name + arg types. Where the
  * reference asks `@polkadot/api-contract` to decode against full ink!
  * metadata, this engine models the metadata as a broadcast DIMENSION
  * (code_hash, selector, method, arg_types) — the 100 TB shape: the
  * registry is tiny and broadcasts; decode is a guarded per-row map.
  *
  * Supported arg type tags (the spec subset the fixtures exercise):
  * `accountid` (32 raw bytes → 0x-hex), `u8`/`u32`/`u64`/`u128`
  * (little-endian fixed width → decimal string), `bool`, `compact`
  * (SCALE compact integer). Unknown tags or short payloads decode to
  * null (guarded-null policy, same as the codec UDFs).
  */
object WasmDecode {

  /** Sequentially decode `types` from `bytes` (args region, selector
    * already stripped). None on any malformation — never a truncated
    * plausible answer. */
  def decodeArgs(bytes: Array[Byte], types: Seq[String]): Option[Seq[String]] = {
    var off = 0
    val out = Seq.newBuilder[String]
    def takeLE(n: Int): Option[BigInt] =
      if (off + n > bytes.length) None
      else {
        val b = bytes.slice(off, off + n).reverse
        off += n
        Some(BigInt(1, b))
      }
    val ok = types.forall {
      case "accountid" =>
        if (off + 32 > bytes.length) false
        else {
          out += Codec.bytesToHex(bytes.slice(off, off + 32))
          off += 32; true
        }
      case "bool" =>
        takeLE(1) match {
          case Some(v) if v == 0 || v == 1 =>
            out += (v == 1).toString; true
          case _ => false
        }
      case "u8" => takeLE(1).exists { v => out += v.toString; true }
      case "u32" => takeLE(4).exists { v => out += v.toString; true }
      case "u64" => takeLE(8).exists { v => out += v.toString; true }
      case "u128" => takeLE(16).exists { v => out += v.toString; true }
      case "compact" =>
        try {
          val (v, used) = Codec.compactDecode(bytes, off)
          off += used
          out += v.toString
          true
        } catch { case _: Exception => false }
      case "option_accountid" =>
        // Option<AccountId>: 0x00 None | 0x01 ++ 32 bytes (the ink!
        // ERC-20 Transfer event's from/to shape)
        takeLE(1) match {
          case Some(tag) if tag == 0 => out += "null"; true
          case Some(tag) if tag == 1 && off + 32 <= bytes.length =>
            out += Codec.bytesToHex(bytes.slice(off, off + 32))
            off += 32; true
          case _ => false
        }
      case _ => false // unknown type tag
    }
    // trailing bytes = wrong message spec or corrupt data
    if (ok && off == bytes.length) Some(out.result()) else None
  }

  /** Strip an optional 0x prefix — Codec.hexToBytes accepts both forms,
    * so the join keys must too or an unprefixed payload computes a
    * silently wrong selector/index. */
  private def stripped(dataHex: Column): Column =
    lower(regexp_replace(dataHex, "^0x", ""))

  /** The selector of a hex call payload (0x-prefixed or bare), as a
    * 0x-prefixed lowercase join key. */
  def selectorOf(dataHex: Column): Column =
    concat(lit("0x"), substring(stripped(dataHex), 1, 8))

  /** The event index (first byte) of a hex contract-event payload —
    * ink! events dispatch on a leading index into the contract's event
    * list, not a 4-byte selector (ref testWASMContractDecodeEvent.js
    * decodeEvent). */
  def eventIdxOf(dataHex: Column): Column =
    conv(substring(stripped(dataHex), 1, 2), 16, 10).cast("int")

  /** Decode contract events against a broadcast event registry.
    *
    * `events`: rows with `code_hash` and `data` (0x-hex index+args).
    * `specs`: (code_hash, event_idx, method, arg_types: array<string>).
    * Same left-join keep-unknowns contract as [[decodeMessages]]. */
  def decodeEvents(events: DataFrame, specs: DataFrame): DataFrame = {
    val decode = udf { (dataHex: String, types: Seq[String]) =>
      if (dataHex == null || types == null) null
      else
        try {
          val bytes = Codec.hexToBytes(dataHex)
          if (bytes.length < 1) null
          else decodeArgs(bytes.drop(1), types).orNull
        } catch { case _: IllegalArgumentException => null }
    }
    events
      .withColumn("event_idx", eventIdxOf(col("data")))
      .join(broadcast(specs), Seq("code_hash", "event_idx"), "left")
      .withColumn("args",
        when(col("arg_types").isNotNull,
          decode(col("data"), col("arg_types"))))
      .drop("arg_types")
  }

  /** Decode contract calls against a broadcast message registry.
    *
    * `calls`: rows with `code_hash` and `data` (0x-hex selector+args).
    * `specs`: (code_hash, selector, method, arg_types: array<string>).
    * Left join: unknown selectors survive with null method/args (the
    * same keep-unknowns contract as EvmDecode.decodeInput). */
  def decodeMessages(calls: DataFrame, specs: DataFrame): DataFrame = {
    val decode = udf { (dataHex: String, types: Seq[String]) =>
      if (dataHex == null || types == null) null
      else
        try {
          val bytes = Codec.hexToBytes(dataHex)
          if (bytes.length < 4) null
          else decodeArgs(bytes.drop(4), types).orNull
        } catch { case _: IllegalArgumentException => null }
    }
    calls
      .withColumn("selector", selectorOf(col("data")))
      .join(broadcast(specs), Seq("code_hash", "selector"), "left")
      .withColumn("args",
        when(col("arg_types").isNotNull,
          decode(col("data"), col("arg_types"))))
      .drop("arg_types")
  }
}
