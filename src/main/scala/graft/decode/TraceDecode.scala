package graft.decode

import graft.functions.Codec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-trace decode — SURVEY P9 (ref substrateetl.js:6605-6773
  * `parse_trace`) and spec-version as-of selection — SURVEY §1.2
  * (ref substrateetl.js:6290 `getSpecVersionForBlockNumber`).
  *
  * The reference resolves a storage key's (pallet, storage) by matching
  * its twox128-prefix pair against a hash→name dimension built from the
  * chain metadata (paraTool.js:2025 parseStorageKey), then SCALE-decodes
  * the value with compact-length disambiguation. Here:
  *
  *  - the prefix dimension is a small DataFrame built with
  *    [[Codec.twox128]] and broadcast-joined against traces;
  *  - the value decode runs [[Codec.compactDecode]] inside a
  *    mapPartitions-friendly scala function exposed as a UDF;
  *  - spec-version selection is an as-of join on block_number.
  */
object TraceDecode {

  /** Build the (prefix_hex → section, storage) dimension from pallet and
    * storage names — the metadata-driven lookup table. */
  def prefixDim(spark: SparkSession,
      entries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    entries.map { case (section, storage) =>
      val p = Codec.bytesToHex(
        Codec.twox128(section.getBytes("UTF-8")) ++
          Codec.twox128(storage.getBytes("UTF-8")), prefix = false)
      (p, section, storage)
    }.toDF("prefix", "section", "storage")
  }

  /** Decode a compact-prefixed u128 from a hex value (the trace value's
    * leading balance field; both compact branches —
    * ref substrateetl.js:6699-6754). Returns null on malformed input. */
  val decodeCompactHex: String => java.lang.Double = (hexVal: String) => {
    try {
      if (hexVal == null || hexVal.isEmpty) null
      else {
        val bytes = Codec.hexToBytes(hexVal)
        val (v, _) = Codec.compactDecode(bytes)
        java.lang.Double.valueOf(v.toDouble)
      }
    } catch { case _: Exception => null }
  }

  /** Resolve (section, storage) for raw storage keys via the broadcast
    * prefix dimension and decode the leading compact value. */
  def decodeTraces(traces: DataFrame, dim: DataFrame): DataFrame = {
    val spark = traces.sparkSession
    val compactUdf = udf(decodeCompactHex)
    traces
      .withColumn("prefix",
        lower(regexp_replace(substring(col("k"), 1, 66), "^0x", "")))
      .join(broadcast(dim), Seq("prefix"), "left")
      .withColumn("decoded_value", compactUdf(col("v")))
  }

  /** As-of spec-version selection: latest spec with
    * `spec.block_number <= block.block_number`
    * (ref substrateetl.js:6290).
    *
    * The upgrade dimension is tiny (one row per runtime upgrade), so
    * each spec becomes a half-open validity interval via `lead` over the
    * DIM ONLY, and the block side flows through a broadcast range join
    * — no window, no shuffle, no single-partition sort of the (enormous)
    * block table. Intervals partition the number line, so the range
    * predicate matches each block at most once. Blocks before the first
    * upgrade keep a null spec_version (left join). */
  def withSpecVersion(blocks: DataFrame, specVersions: DataFrame): DataFrame = {
    val w = Window.orderBy(col("sv_from")) // dim-only: rows = upgrades
    val iv = specVersions
      .select(col("block_number").as("sv_from"),
        col("spec_version").as("sv"))
      .withColumn("sv_to", lead(col("sv_from"), 1).over(w))
    blocks.select(col("block_number"))
      .join(broadcast(iv),
        col("block_number") >= col("sv_from") &&
          (col("sv_to").isNull || col("block_number") < col("sv_to")),
        "left")
      .select(col("block_number"), col("sv").as("spec_version"))
  }
}
