package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** On-chain identity dimension (ref identityManager.js:40 dump_identity;
  * registrar decode feeding the `account`/`subaccount` tables the
  * reference joins into its serving faces). Built purely from decoded
  * calls/events — the identity pallet needs no hand dispatch table, it
  * decodes through the MetaDecode tier:
  *
  *  - `identity.setIdentity` (display/legal/web) sets an account's
  *    identity; `identity.clearIdentity` tombstones it; latest action
  *    in block order wins (argmax window per account — the same shape
  *    as AccountRelations.proxyAccounts).
  *  - `identity.addSub(sub, name)` declares sub-identities; latest
  *    name per (parent, sub) wins.
  *  - `identity.JudgementGiven(target, registrar, judgement)` events:
  *    latest judgement per (target, registrar) wins; an account is
  *    `verified` when any live judgement is KnownGood/Reasonable
  *    (identityManager.js:64 verifiedStatus).
  *
  * Scale shape: three keyed argmax windows + outer joins on pubkey —
  * every stage shuffles on the account key once; no driver state. */
object Identity {

  // full numeric ordering incl. the call path: two identity calls in
  // ONE batch extrinsic share (block, extrinsic idx) and only the call
  // path breaks the tie deterministically
  private def latestWins(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("block_number").desc, idKey(col("extrinsic_id")).desc,
        callPathKey(col("call_id")).desc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
  }

  /** Live identity records: (pubkey, display, legal, web). */
  def identityInfo(calls: DataFrame, extrinsics: DataFrame): DataFrame = {
    val signer = extrinsics
      .select(col("extrinsic_id"), col("signer_pub_key"))
    val actions = calls
      .filter(col("call_section") === "identity" &&
        col("call_method").isin("setIdentity", "clearIdentity"))
      .join(signer, Seq("extrinsic_id"))
      .select(col("signer_pub_key").as("pubkey"),
        (col("call_method") === "setIdentity").as("is_set"),
        get_json_object(col("call_args"), "$.display").as("display"),
        get_json_object(col("call_args"), "$.legal").as("legal"),
        get_json_object(col("call_args"), "$.web").as("web"),
        col("block_number"), col("extrinsic_id"), col("call_id"))
    latestWins(actions, Seq("pubkey")).filter(col("is_set"))
      .select(col("pubkey"), col("display"), col("legal"), col("web"))
  }

  /** Live sub-identity edges: (sub_pub, parent_pub, subname). */
  def subIdentities(calls: DataFrame, extrinsics: DataFrame): DataFrame = {
    val signer = extrinsics
      .select(col("extrinsic_id"), col("signer_pub_key"))
    val actions = calls
      .filter(col("call_section") === "identity" &&
        col("call_method").isin("addSub", "removeSub"))
      .join(signer, Seq("extrinsic_id"))
      .select(col("signer_pub_key").as("parent_pub"),
        get_json_object(col("call_args"), "$.sub").as("sub_pub"),
        (col("call_method") === "addSub").as("is_add"),
        get_json_object(col("call_args"), "$.name").as("subname"),
        col("block_number"), col("extrinsic_id"), col("call_id"))
    // Latest-wins per sub_pub ALONE: the pallet's SuperOf mapping is one
    // parent per sub, so a later addSub by a different parent replaces
    // the old edge — keying by (parent, sub) kept both and duplicated
    // the sub's row in the dimension (fanning out decorate's join).
    latestWins(actions, Seq("sub_pub"))
      .filter(col("is_add"))
      .select(col("sub_pub"), col("parent_pub"), col("subname"))
  }

  /** Judgement state per account: n_judgements + verified flag from the
    * latest judgement per (target, registrar). */
  def judgements(events: DataFrame): DataFrame = {
    val j = events
      .filter(col("section") === "identity" &&
        col("method") === "JudgementGiven")
      .select(
        get_json_object(col("data"), "$.target").as("pubkey"),
        get_json_object(col("data"), "$.registrarIndex").cast("int")
          .as("registrar"),
        get_json_object(col("data"), "$.judgement.variant")
          .as("judgement"),
        col("block_number"), col("event_id"))
    val w = Window.partitionBy(col("pubkey"), col("registrar"))
      .orderBy(col("block_number").desc, idKey(col("event_id")).desc)
    j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy(col("pubkey"))
      .agg(count(lit(1)).as("n_judgements"),
        max(col("judgement").isin("KnownGood", "Reasonable"))
          .as("verified"))
  }

  /** The full identity dimension: any account with an identity, a
    * sub-identity, or a judgement — decorated with both ss58 forms
    * (identityManager.js:70-71 getAddress(pubkey, 0/2)). Callers must
    * have `Udfs.register`ed the session. */
  def identities(calls: DataFrame, extrinsics: DataFrame,
      events: DataFrame): DataFrame = {
    val info = identityInfo(calls, extrinsics)
    val subs = subIdentities(calls, extrinsics)
      .withColumnRenamed("sub_pub", "pubkey")
    val judg = judgements(events)
    info.join(subs, Seq("pubkey"), "full_outer")
      .join(judg, Seq("pubkey"), "full_outer")
      .withColumn("verified", coalesce(col("verified"), lit(false)))
      .withColumn("is_subidentity", col("parent_pub").isNotNull)
      .withColumn("polkadot_ss58", expr("ss58_encode(pubkey, 0)"))
      .withColumn("kusama_ss58", expr("ss58_encode(pubkey, 2)"))
      .select(col("pubkey"), col("display"), col("legal"), col("web"),
        col("is_subidentity"), col("parent_pub"), col("subname"),
        col("n_judgements"), col("verified"),
        col("polkadot_ss58"), col("kusama_ss58"))
  }

  /** Serve-face decoration: left-join identity display/verified onto
    * any account-keyed result (the reference decorates related-account
    * and extrinsic lookups the same way, query.js identity joins).
    * No broadcast hint: the identity dimension is usually small but can
    * reach millions of rows fleet-wide — AQE broadcasts it when it
    * fits and falls back to a shuffle join when it doesn't. */
  def decorate(df: DataFrame, identities: DataFrame,
      pubkeyCol: String): DataFrame =
    df.join(
      identities.select(col("pubkey").as(pubkeyCol),
        col("display").as("identity_display"),
        col("verified").as("identity_verified")),
      Seq(pubkeyCol), "left")
      .withColumn("identity_verified",
        coalesce(col("identity_verified"), lit(false)))
}
