package graft.etl

import graft.functions.Keccak
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XCM Global Asset Registry build — the job that CONSTRUCTS the
  * `xcmasset` dimension by aggregating per-chain on-chain asset
  * registries (ref gar/README.md:1-14: ~55 chains' registries unify
  * into one global registry; gar/xcmgar.js:613-624 setXcmAsset's
  * first-wins + confidence merge; schema/xcmassets.json the output
  * shape). The reference crawls RPC endpoints chain by chain and
  * mutates a driver-side map; here the fetched per-chain payloads are
  * JsonFeed-style files and the merge is ONE distributed aggregation.
  *
  * Conflict resolution is deterministic rather than crawl-order
  * first-wins: the ORIGIN chain (the parachain named in the interior
  * key itself) owns the canonical symbol/name/decimals; among
  * non-origin publishers the smallest para_id wins. `confidence` =
  * count of non-origin parachains publishing the same multilocation
  * (schema/xcmassets.json confidence description), so independently
  * corroborated assets rank above single-chain claims.
  *
  * Scale shape: registries are tiny (10³-10⁴ rows) — one hash
  * aggregation keyed on xcm_interior_key; the result is the broadcast
  * side of every downstream asset join (J6/J8-class dimension joins).
  */
object GarRegistry {

  /** Read one relay's per-chain registry files (the `assets/{relay}/`
    * JSON payloads): arrays of rows shaped like schema/assets.json.
    * `path` may be a glob over many per-chain files — Spark fans the
    * read out, no per-chain driver loop. */
  def readChainAssets(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("para_id INT, chain_name STRING, asset STRING, " +
        "name STRING, symbol STRING, decimals INT, currency_id STRING, " +
        "xcm_interior_key STRING, is_evm BOOLEAN")
      .option("multiLine", "true").json(path)

  /** Interior portion of the `<interior>~<relay>` key. */
  private def interior(key: Column): Column =
    regexp_extract(key, "^([^~]+)", 1)

  /** Whether the key is the relay's own asset. EXACT match on the
    * interior — a substring test would also hit any key containing
    * "ethereum" (et-HERE-um), e.g. globalConsensus bridge assets. */
  private def isHere(key: Column): Column =
    interior(key).isin("here", "\"here\"")

  /** Parachain the interior key itself names — `here` (the relay
    * asset) is para 0. */
  private def originPara(key: Column): Column =
    when(isHere(key), lit(0))
      .otherwise(get_json_object(key, "$[0].parachain").cast("int"))

  /** EVM precompile address of an xc-asset id:
    * `0xFFFFFFFF ‖ u128-BE id`, EIP-55 checksummed (ref
    * gar/xcmgarTool.js:86-96 xcAssetIDToContractAddr). */
  def xcContractAddress(currencyId: String): String = {
    val id = BigInt(currencyId.replace(",", "").trim)
    val hex = id.toString(16)
    require(hex.length <= 32, s"xc asset id $currencyId exceeds u128")
    eip55("ffffffff" + ("0" * (32 - hex.length)) + hex)
  }

  /** EIP-55 mixed-case checksum of a 40-hex-digit address body. */
  private[etl] def eip55(body: String): String = {
    val lower = body.toLowerCase
    val hash = Keccak.keccak256(lower.getBytes("US-ASCII"))
    "0x" + lower.zipWithIndex.map { case (ch, i) =>
      val nibble = (hash(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
      if (ch.isLetter && nibble >= 8) ch.toUpper else ch
    }.mkString
  }

  // guarded-null: an undecodable id (empty, non-numeric, beyond u128)
  // yields null, never an executor-killing exception — registries are
  // scraped data and DO contain garbage rows
  private val xcContractUdf = udf { currencyId: String =>
    val cleaned = Option(currencyId).map(_.replace(",", "").trim)
    cleaned match {
      case Some(c) if c.nonEmpty && c.length <= 39 && c.forall(_.isDigit)
          && BigInt(c) < (BigInt(1) << 128) =>
        xcContractAddress(c)
      case _ => null
    }
  }

  /** Aggregate per-chain registry rows into the global `xcmasset`
    * dimension (one row per xcm_interior_key). Two-stage: per
    * (key, para) first — real registries contain duplicate rows for one
    * para, and a single-stage map_from_entries would die on the
    * duplicate map key — then the global merge. Both stages are
    * map-side-combinable hash aggregations on a tiny dimension. */
  def buildXcmAssets(chainAssets: DataFrame): DataFrame = {
    val keyed = chainAssets
      .filter(col("xcm_interior_key").isNotNull)
      .withColumn("origin_para_id", originPara(col("xcm_interior_key")))
      // origin rows sort first, then smallest para_id: the struct min
      // IS the conflict resolution, one map-side-combinable aggregate
      .withColumn("rank", struct(
        (col("para_id") =!= col("origin_para_id")).cast("int")
          .as("non_origin"),
        col("para_id"),
        struct(col("symbol"), col("name"), col("decimals")).as("meta")))
    // ONE representative row per (key, para): currency_id and is_evm
    // must come from the SAME row (a per-field min/max could pair a
    // non-EVM row's currency with another row's evm flag and fabricate
    // a precompile address). Prefer rows WITH a currency id, then the
    // lexicographically smallest id — deterministic, documented.
    val perPara = keyed
      .withColumn("pick", struct(
        col("currency_id").isNull.cast("int").as("no_cur"),
        coalesce(col("currency_id"), lit("")).as("cur"),
        coalesce(col("is_evm"), lit(false)).as("evm")))
      .groupBy(col("xcm_interior_key"), col("para_id"))
      .agg(
        first(col("origin_para_id")).as("origin_para_id"),
        min(col("rank")).as("rank"),
        min(col("pick")).as("pick"))
      .withColumn("currency_id",
        when(col("pick.no_cur") === 1, lit(null)).otherwise(col("pick.cur")))
      .withColumn("is_evm", col("pick.evm"))
    perPara
      .groupBy(col("xcm_interior_key"))
      .agg(
        first(col("origin_para_id")).as("para_id"),
        min(col("rank")).as("winner"),
        sort_array(collect_set(col("para_id"))).as("sources"),
        count_distinct(when(col("para_id") =!= col("origin_para_id"),
          col("para_id"))).cast("int").as("confidence"),
        map_from_entries(sort_array(collect_list(
          when(col("currency_id").isNotNull,
            struct(col("para_id"), col("currency_id"))))))
          .as("xc_currency_ids"),
        map_from_entries(sort_array(collect_list(
          when(col("is_evm") && col("currency_id").isNotNull,
            struct(col("para_id"),
              xcContractUdf(col("currency_id")))))))
          .as("xc_contract_addresses"))
      .select(
        col("xcm_interior_key"),
        when(isHere(col("xcm_interior_key")), lit(1))
          .otherwise(json_array_length(interior(col("xcm_interior_key"))))
          .as("interior_type"),
        col("winner.meta.symbol").as("symbol"),
        col("winner.meta.name").as("name"),
        col("winner.meta.decimals").as("decimals"),
        col("para_id"), col("confidence"), col("sources"),
        col("xc_currency_ids"), col("xc_contract_addresses"))
  }

  /** Decorate an interior-keyed frame with the built registry's
    * symbol/decimals — the `asset LEFT JOIN xcmasset` serve shape
    * (ref query.js:2214). The registry is the broadcast side by
    * construction: it is 10³-10⁴ rows however big the fact side is. */
  def decorate(df: DataFrame, xcmAssets: DataFrame,
      keyCol: String): DataFrame =
    df.join(
      broadcast(xcmAssets.select(
        col("xcm_interior_key").as(keyCol),
        col("symbol").as("asset_symbol"),
        col("decimals").as("asset_decimals"),
        col("confidence").as("asset_confidence"))),
      Seq(keyCol), "left")
}
