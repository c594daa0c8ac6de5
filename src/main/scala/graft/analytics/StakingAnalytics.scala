package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Staking analytics — the reference's flagship BigQuery pipeline
  * (ref docs/StakingAnalytics.md:1-320; SURVEY A13/J9/W2) on the domain
  * `stakings` schema (FIXTURES.md §7).
  *
  * Input rows carry `storage` discriminators exactly like the reference's
  * exports: `ErasStakers` (validator era snapshots), `Nominators`
  * (nominator → targets JSON array), `PoolMembers` / `BondedPools`.
  *
  * Scale notes: everything groups/joins on (era) or (era, address) —
  * high-cardinality equi keys; the nominator edge list is produced by
  * `explode` of the targets array (graph-as-edge-DataFrame per SURVEY
  * §1.1), never driver-side.
  */
object StakingAnalytics {

  /** Era-level totals (ref StakingAnalytics.md:15-41 `eraRaw` CTE):
    * per era: total staked, total reward points, validator count, and
    * `ARRAY_AGG`-style validator list. */
  def eraAggregates(stakings: DataFrame): DataFrame =
    stakings.filter(col("storage") === "ErasStakers")
      .groupBy(col("era"))
      .agg(
        count(lit(1)).as("n_validators"),
        sum(col("validator_total")).as("era_total_staked"),
        sum(col("validator_reward_points")).as("era_reward_points"),
        sort_array(collect_list(col("address_pubkey")))
          .as("validators"))

  /** Validator rows augmented with era totals + reward share
    * (ref StakingAnalytics.md:41-105 `validator_augmented`:
    * validators LEFT JOIN eraRaw ON era). */
  def validatorAugmented(stakings: DataFrame): DataFrame = {
    val validators = stakings.filter(col("storage") === "ErasStakers")
      .select(col("era"), col("address_pubkey"), col("validator_total"),
        col("validator_own"), col("validator_commission"),
        col("validator_reward_points"))
    validators
      .join(eraAggregates(stakings).drop("validators"), Seq("era"), "left")
      .withColumn("reward_share",
        col("validator_reward_points").cast("double") /
          col("era_reward_points"))
  }

  /** Nominator → validator edges from the targets JSON array
    * (ref StakingAnalytics.md:5-14:
    * UNNEST(JSON_EXTRACT_ARRAY(pv,'$.targets'))). */
  def nominatorEdges(stakings: DataFrame): DataFrame =
    stakings.filter(col("storage") === "Nominators")
      .select(col("era"), col("address_pubkey").as("nominator"),
        col("member_bonded"),
        explode(from_json(col("targets"), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
          .as("validator"))

  /** The call-side twin of [[nominatorEdges]]: nominator→validator
    * edges from decoded `staking.nominate`/`chill` calls (metadata tier
    * — MetaDecode.StandardPallets.staking). A nominate REPLACES the
    * nominator's whole target set and a chill clears it, so the latest
    * action per (chain, nominator) wins before the winning target array
    * explodes into edges — same latest-wins argmax shape as the
    * proxy/identity relation builds. */
  def nominationEdgesFromCalls(calls: DataFrame,
      extrinsics: DataFrame): DataFrame = {
    val signer = extrinsics
      .select(col("extrinsic_id"), col("signer_pub_key"))
    val acts = calls
      .filter(col("call_section") === "staking" &&
        col("call_method").isin("nominate", "chill"))
      .join(signer, Seq("extrinsic_id"))
      .select(col("chain_id"),
        col("signer_pub_key").as("nominator_pub"),
        (col("call_method") === "nominate").as("is_nominate"),
        from_json(get_json_object(col("call_args"), "$.targets"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)).as("targets"),
        col("block_number"), col("extrinsic_id"), col("call_id"))
    val w = Window.partitionBy(col("chain_id"), col("nominator_pub"))
      .orderBy(col("block_number").desc,
        graft.etl.idKey(col("extrinsic_id")).desc,
        graft.etl.callPathKey(col("call_id")).desc)
    acts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("is_nominate"))
      .select(col("chain_id"), col("nominator_pub"),
        explode(col("targets")).as("validator_pub"),
        col("block_number").as("since_block"))
  }

  /** Nominators joined to their validators' augmented rows
    * (ref StakingAnalytics.md:120-240: nominator APR via the validator's
    * share). Estimated nominator reward =
    * bonded/validator_total × points_share × (1 − commission). */
  def nominatorAugmented(stakings: DataFrame): DataFrame =
    nominatorEdges(stakings)
      .join(validatorAugmented(stakings)
          .withColumnRenamed("address_pubkey", "validator"),
        Seq("era", "validator"), "left")
      .withColumn("est_share",
        col("member_bonded") / col("validator_total") *
          col("reward_share") * (lit(1.0) - col("validator_commission")))

  /** Pool members joined to their pools (ref StakingAnalytics.md:244-320:
    * member LEFT JOIN nominationpools). */
  def poolMembers(stakings: DataFrame): DataFrame = {
    val pools = stakings.filter(col("storage") === "BondedPools")
      .select(col("era"), col("nominationpools_id"),
        col("nominationpools_total"), col("nominationpools_commission"))
    stakings.filter(col("storage") === "PoolMembers")
      .select(col("era"), col("address_pubkey"),
        col("nominationpools_id"), col("member_bonded"))
      .join(pools, Seq("era", "nominationpools_id"), "left")
      .withColumn("pool_share",
        col("member_bonded") / col("nominationpools_total"))
  }

  /** Bonded delta per member across eras (ref StakingAnalytics.md:285
    * `member_bond` CTE: LAG(member_bonded) OVER (PARTITION BY address
    * ORDER BY era)). */
  def memberBondDeltas(stakings: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("address_pubkey")).orderBy(col("era"))
    stakings.filter(col("storage") === "PoolMembers")
      .select(col("era"), col("address_pubkey"), col("member_bonded"))
      .withColumn("prev_bonded", lag(col("member_bonded"), 1).over(w))
      .withColumn("bond_delta",
        col("member_bonded") - coalesce(col("prev_bonded"), lit(0.0)))
  }
}
