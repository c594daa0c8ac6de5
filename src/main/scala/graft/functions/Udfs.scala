package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-registered scalar functions — the Spark twin of the reference's
  * BigQuery JS UDF surface (ref substrate/tools/udfs.sql; SURVEY §2.8)
  * plus the paraTool conversions used on every exported row
  * (ref substrateetl.js:6301,6396). All pure → Catalyst treats them as
  * deterministic and can collapse/reorder them. */
object Udfs {

  /** Guarded-null policy (same contract as compact_decode): these UDFs
    * run on every row of Dump's projections, so malformed input (bad
    * hex, wrong pubkey length, bad base58/checksum) yields NULL rather
    * than killing the stage. */
  private def guard[T >: Null](f: => T): T =
    try f catch {
      case _: IllegalArgumentException | _: NumberFormatException |
           _: IndexOutOfBoundsException => null
    }

  def register(spark: SparkSession): Unit = {
    val u = spark.udf

    // P12 — address normalization (ref paraTool.js:1666 getPubKey /
    // getAddress)
    u.register("ss58_encode", (pubkeyHex: String, network: Int) =>
      if (pubkeyHex == null) null
      else guard(Codec.ss58Encode(Codec.hexToBytes(pubkeyHex), network)))
    u.register("ss58_pubkey", (address: String) =>
      if (address == null) null
      else guard(Codec.bytesToHex(Codec.ss58Decode(address)._2)))

    // crypto/encoding (ref paraTool.js:1785,1883)
    u.register("twox128_hex", (s: String) =>
      if (s == null) null
      else Codec.bytesToHex(Codec.twox128(s.getBytes("UTF-8")), prefix = false))
    u.register("blake2_256_hex", (hex: String) =>
      if (hex == null) null
      else guard(
        Codec.bytesToHex(Codec.blake2b256(Codec.hexToBytes(hex)), prefix = false)))

    // decimal scaling of raw chain amounts (ref paraTool.js:214
    // toBaseUnit; hex u128 → double at token decimals)
    u.register("to_base_unit", (rawHex: String, decimals: Int) =>
      if (rawHex == null) null
      else guard(java.lang.Double.valueOf(
        Codec.toBaseUnit(BigInt(1, Codec.hexToBytes(rawHex)), decimals))))

    // composite keys, dispatched through the per-chain parser seam so
    // chain-specific asset canonicalization (Acala token JSON, Moonbeam
    // H160 lowercase, Parallel numeric ids) applies inside Dump's
    // transfers projection (ref paraTool.js:1945 makeAssetChain +
    // indexer.js:6697 setup_chainParser)
    u.register("asset_chain", (asset: String, chainId: Int) =>
      if (asset == null) null
      else graft.decode.ChainParser.forChain(chainId).assetKey(asset))

    // substrate↔EVM account mapping (ref paraTool.js:517,522)
    u.register("pubkey_to_h160", (pubkeyHex: String) =>
      if (pubkeyHex == null) null
      else guard(Codec.bytesToHex(
        Codec.pubkeyToH160(Codec.hexToBytes(pubkeyHex)))))
    u.register("h160_to_pubkey", (h160Hex: String) =>
      if (h160Hex == null) null
      else guard(Codec.bytesToHex(
        Codec.h160ToPubkey(Codec.hexToBytes(h160Hex)))))

    // derived account ids (ref paraTool.js:311 computeMultisig,
    // paraTool.js:889 compute_sovereign_account)
    u.register("multisig_account", (pubkeysHex: Seq[String], threshold: Int) =>
      if (pubkeysHex == null) null
      else guard(Codec.bytesToHex(
        Codec.multisigAccount(pubkeysHex.map(Codec.hexToBytes), threshold))))
    u.register("sovereign_account", (paraId: Long, sibling: Boolean) =>
      guard(Codec.bytesToHex(Codec.sovereignAccount(paraId, sibling))))

    // SCALE compact decode (leading field of a storage value); null on
    // malformed input — one bad value must not fail the stage (reuses
    // the guarded TraceDecode path)
    u.register("compact_decode",
      graft.decode.TraceDecode.decodeCompactHex)

    // XCM MultiLocation surface (ref paraTool.js:1237 interior keys,
    // xcmmanager.js:986 descend-origin derivative) — both internally
    // guarded (null on malformed keys/addresses)
    u.register("xcm_loc_bytes",
      (key: String) => XcmLocation.interiorKeyToBytesHex(key))
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
