package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}

/** SQL-registered scalar functions — the Spark twin of the reference's
  * BigQuery JS UDF surface (ref substrate/tools/udfs.sql; SURVEY §2.8)
  * plus the paraTool conversions used on every exported row
  * (ref substrateetl.js:6301,6396). All pure → Catalyst treats them as
  * deterministic and can collapse/reorder them.
  *
  * The per-row string kernels (address render, decimal scaling, asset
  * canonicalization, hex hashing) register as `StaticInvoke`
  * expressions over [[graft.plans.CodecKernels]] rather than Scala
  * UDFs: a UDF is a codegen barrier with per-row catalyst↔scala
  * conversion, and these run on EVERY row of Dump's six projections.
  * StaticInvoke compiles to a direct static call inside whole-stage
  * codegen. Functions over arrays/structs (multisig) and the rarely-
  * per-row ones stay plain UDFs. */
object Udfs {

  /** Guarded-null policy (same contract as compact_decode): these
    * functions run on every row of Dump's projections, so malformed
    * input (bad hex, wrong pubkey length, bad base58/checksum) yields
    * NULL rather than killing the stage. */
  private def guard[T >: Null](f: => T): T =
    try f catch {
      case _: IllegalArgumentException | _: NumberFormatException |
           _: IndexOutOfBoundsException => null
    }

  /** Register `name` as a StaticInvoke of CodecKernels.`method`. */
  private def native(spark: SparkSession, name: String, method: String,
      out: DataType, in: Seq[DataType]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (exprs: Seq[Expression]) => StaticInvoke(
        classOf[graft.plans.CodecKernels.type],
        out, method, exprs, inputTypes = in,
        propagateNull = true, returnNullable = true),
      "scala_udf")

  def register(spark: SparkSession): Unit = {
    val u = spark.udf

    // P12 — address normalization (ref paraTool.js:1666 getPubKey /
    // getAddress)
    native(spark, "ss58_encode", "ss58Encode", StringType,
      Seq(StringType, IntegerType))
    native(spark, "ss58_pubkey", "ss58Pubkey", StringType,
      Seq(StringType))

    // crypto/encoding (ref paraTool.js:1785,1883)
    native(spark, "twox128_hex", "twox128Hex", StringType,
      Seq(StringType))
    native(spark, "blake2_256_hex", "blake2b256Hex", StringType,
      Seq(StringType))

    // bounded edit distance for candidate-verify joins (x22 SymSpell,
    // fuzzy entity matching): exact when ≤ k, else k+1 — banded DP with
    // early exit instead of the built-in's full n·m fill
    native(spark, "levenshtein_le", "levenshteinLe", IntegerType,
      Seq(StringType, StringType, IntegerType))

    // decimal scaling of raw chain amounts (ref paraTool.js:214
    // toBaseUnit; hex u128 → double at token decimals)
    native(spark, "to_base_unit", "toBaseUnit", DoubleType,
      Seq(StringType, IntegerType))

    // composite keys, dispatched through the per-chain parser seam so
    // chain-specific asset canonicalization (Acala token JSON, Moonbeam
    // H160 lowercase, Parallel numeric ids) applies inside Dump's
    // transfers projection (ref paraTool.js:1945 makeAssetChain +
    // indexer.js:6697 setup_chainParser)
    native(spark, "asset_chain", "assetChain", StringType,
      Seq(StringType, IntegerType))

    // module-account name decode (ref paraTool.js:378
    // pubKey_hex2ascii — the assethub snapshotter's named-holder gate)
    native(spark, "pubkey_ascii", "pubkeyAscii", StringType,
      Seq(StringType))

    // substrate↔EVM account mapping (ref paraTool.js:517,522)
    native(spark, "pubkey_to_h160", "pubkeyToH160", StringType,
      Seq(StringType))
    native(spark, "h160_to_pubkey", "h160ToPubkey", StringType,
      Seq(StringType))

    // derived account ids (ref paraTool.js:311 computeMultisig,
    // paraTool.js:889 compute_sovereign_account)
    u.register("multisig_account", (pubkeysHex: Seq[String], threshold: Int) =>
      if (pubkeysHex == null) null
      else guard(Codec.bytesToHex(
        Codec.multisigAccount(pubkeysHex.map(Codec.hexToBytes), threshold))))
    u.register("sovereign_account", (paraId: Long, sibling: Boolean) =>
      guard(Codec.bytesToHex(Codec.sovereignAccount(paraId, sibling))))

    // SCALE compact decode (leading field of a storage value); null on
    // malformed input — one bad value must not fail the stage. The
    // NATIVE expression, and registered HERE too so the two
    // registration paths can never shadow each other with different
    // implementations under one name.
    graft.plans.CodecExpressions.register(spark)

    // XCM MultiLocation surface (ref paraTool.js:1237 interior keys,
    // xcmmanager.js:986 descend-origin derivative) — both internally
    // guarded (null on malformed keys/addresses)
    native(spark, "xcm_loc_bytes", "xcmLocBytes", StringType,
      Seq(StringType))
    u.register("xcm_dest_para",
      (key: String) => XcmLocation.destParaId(key))
    u.register("xcm_derivative20", (paraId: Long, address: String) =>
      if (address == null) null
      else guard(Codec.bytesToHex(
        XcmLocation.multilocationDerivative(Some(paraId),
          Some(address))._1)))

    // EVM sender recovery (ref ethTool.js signature handling) —
    // internally guarded: null on malformed hash/r/s or invalid point
    // v is Long: EIP-155 v = 35 + 2·chainId exceeds Int range for real
    // chainIds (Aurora, Palm); an Int signature would let Spark's
    // implicit BIGINT→INT cast wrap v into a valid recId range and
    // silently recover a wrong address instead of null.
    u.register("ecrecover_address",
      (msgHashHex: String, v: Long, rHex: String, sHex: String) =>
        Secp256k1.recoverAddressHex(msgHashHex, v, rHex, sHex))
  }
}
