package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** XCM cross-chain correlation on the domain schemas (FIXTURES.md §9/§10)
  * — the reference's flagship matching pipeline re-expressed as two
  * DataFrame programs (SURVEY §2.4 J1-J5, §3 honorable-mention trace).
  *
  * Scale design: both matchers join on an equi-key first (msg_hash /
  * (msg_hash, chain pair)) and apply the bounded time predicates as
  * post-join filters, so they plan as shuffled hash joins keyed by the
  * hash — candidate sets per key are tiny (the reference's window is 4
  * relay blocks / 130 s), and the rank-1 window runs per key.
  */
object XcmMatcher {

  /** J1/J2 — message matching (ref xcmmanager.js:423-497, SQL at 427-440,
    * first-wins dedup map at 460-481):
    * source (incoming=0) × dest (incoming=1) on (msg_hash, chain pair),
    * `0 <= destSentAt - srcSentAt <= 4`, closest (sentAt delta, ts delta)
    * wins per source; then each dest row may be consumed once (first
    * source wins, ordered the same way).
    */
  def matchMessages(messages: DataFrame): DataFrame = {
    val src = messages.filter(col("incoming") === 0)
      .select(col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("sent_at").as("s_sent_at"), col("block_ts").as("s_ts"),
        col("block_number").as("s_block_number"))
    val dst = messages.filter(col("incoming") === 1)
      .select(col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("sent_at").as("d_sent_at"), col("block_ts").as("d_ts"),
        col("block_number").as("d_block_number"))
    val cand = src.join(dst, Seq("msg_hash", "chain_id", "chain_id_dest"))
      .withColumn("diff_sent_at", col("d_sent_at") - col("s_sent_at"))
      .filter(col("diff_sent_at").between(0, 4))
      .withColumn("diff_ts",
        abs(unix_timestamp(col("d_ts")) - unix_timestamp(col("s_ts"))))
    // closest dest per source… (the source identity includes the chain
    // pair: a multi-hop message reuses its msg_hash on several pairs,
    // ref xcmmanager.js groups by (msgHash, chains))
    val perSrc = Window
      .partitionBy(col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("s_sent_at"), col("s_block_number"))
      .orderBy(col("diff_sent_at"), col("diff_ts"), col("d_block_number"))
    val best = cand.withColumn("rn", row_number().over(perSrc))
      .filter(col("rn") === 1).drop("rn")
    // …then each dest consumed once, first source (same ordering) wins
    val perDst = Window
      .partitionBy(col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("d_sent_at"), col("d_block_number"))
      .orderBy(col("diff_sent_at"), col("diff_ts"), col("s_block_number"))
    best.withColumn("rn", row_number().over(perDst))
      .filter(col("rn") === 1).drop("rn")
      .select(col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("s_block_number"), col("d_block_number"),
        col("s_sent_at"), col("d_sent_at"), col("diff_sent_at"),
        col("diff_ts"))
  }

  /** J5 — parent/child XCM correlation by instruction-fingerprint
    * subset inclusion within a 60 s window (ref xcmmanager.js:521-605:
    * a child message's fingerprint set must be contained in the
    * parent's, destination chain of the parent = origin of the child).
    * Equi-join on the chain handoff key first; the window predicate and
    * the array-containment check are post-join filters — no cross join.
    */
  def matchFingerprints(parents: DataFrame, children: DataFrame): DataFrame = {
    val p = parents.select(col("msg_hash").as("parent_hash"),
      col("chain_id_dest").as("handoff_chain"),
      col("block_ts").as("p_ts"),
      col("fingerprints").as("p_fp"))
    val c = children.select(col("msg_hash").as("child_hash"),
      col("chain_id").as("handoff_chain"),
      col("block_ts").as("c_ts"),
      col("fingerprints").as("c_fp"))
    val cand = p.join(c, Seq("handoff_chain"))
      .filter(col("c_ts") >= col("p_ts") &&
        col("c_ts") <= col("p_ts") + expr("INTERVAL 60 SECONDS"))
      // an empty child fingerprint set is vacuously ⊆ everything — no
      // evidence, no match
      .filter(size(col("c_fp")) > 0)
      // child fingerprint set ⊆ parent fingerprint set
      .filter(size(array_except(col("c_fp"), col("p_fp"))) === 0)
    // one parent per child: closest preceding parent wins (same
    // first-wins discipline as matchMessages/matchTransfers)
    val w = Window.partitionBy(col("child_hash"))
      .orderBy((unix_timestamp(col("c_ts")) -
        unix_timestamp(col("p_ts"))).asc, col("parent_hash"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .select(col("parent_hash"), col("child_hash"),
        col("handoff_chain"), col("p_ts"), col("c_ts"))
  }

  /** J3 — transfer → dest-candidate tolerance matching
    * (ref xcmCleaner.js:569-666): candidate window
    * `dest_ts ∈ [source_ts − 10 s, source_ts + 120 s]`, exact-amount
    * predicate `amount_received + fees == amount_sent` preferred, else
    * highest confidence = 1 − |received+fees − sent| / sent (>0.5
    * required), reaped candidates rejected; one winner per transfer, and
    * each candidate event consumed at most once.
    */
  def matchTransfers(transfers: DataFrame, candidates: DataFrame): DataFrame = {
    val cand = transfers.join(candidates, Seq("msg_hash", "chain_id_dest"))
      .filter(col("dest_ts") >= col("source_ts") - expr("INTERVAL 10 SECONDS") &&
        col("dest_ts") <= col("source_ts") + expr("INTERVAL 120 SECONDS"))
      .filter(col("reaped") === 0)
      .withColumn("recv_total",
        col("amount_received") + col("xcm_teleport_fees"))
      .withColumn("exact",
        (col("recv_total") === col("amount_sent")).cast("int"))
      .withColumn("confidence",
        when(col("exact") === 1, lit(1.0)).otherwise(
          lit(1.0) - abs((col("recv_total") - col("amount_sent"))
            .cast("double")) / col("amount_sent").cast("double")))
      .filter(col("confidence") > 0.5)
    val perTransfer = Window
      .partitionBy(col("extrinsic_id"), col("transfer_index"), col("xcm_index"))
      .orderBy(col("exact").desc, col("confidence").desc, col("event_id"))
    val best = cand.withColumn("rn", row_number().over(perTransfer))
      .filter(col("rn") === 1).drop("rn")
    val perEvent = Window.partitionBy(col("event_id"))
      .orderBy(col("exact").desc, col("confidence").desc,
        col("extrinsic_id"), col("transfer_index"), col("xcm_index"))
    best.withColumn("rn", row_number().over(perEvent))
      .filter(col("rn") === 1).drop("rn")
      .select(col("extrinsic_id"), col("transfer_index"), col("xcm_index"),
        col("msg_hash"), col("chain_id"), col("chain_id_dest"),
        col("event_id"), col("amount_sent"), col("recv_total"),
        col("exact"), round(col("confidence"), 6).as("confidence"))
  }
}
