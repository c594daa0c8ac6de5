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
  /** Derive the matcher's (chain_id_dest, dest_pubkey) join keys from a
    * raw XCM destination MultiLocation interior key (the form the
    * message payload actually carries — ref xcmCleaner analyzeXCMDest):
    * Parachain junction → chain_id_dest (−1 = relay), AccountId32 /
    * AccountKey20 junction → dest_pubkey hex. Both guarded-null, so a
    * malformed location flows to the unmatched audit instead of
    * failing the stage. */
  def resolveDestinations(transfers: DataFrame,
      locCol: String = "dest_location"): DataFrame = {
    val para = udf((k: String) => graft.functions.XcmLocation.destParaId(k))
    val acct = udf((k: String) =>
      graft.functions.XcmLocation.destAccountHex(k))
    transfers
      .withColumn("chain_id_dest", para(col(locCol)))
      .withColumn("dest_pubkey", acct(col(locCol)))
  }

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

  /** J4 — multi-strategy destination search with prioritized fallback
    * (ref xcmCleaner.js:846-873: the WATERFALL over dest candidates →
    * substrate-etl deposit events → balance probes at the N closest
    * blocks; :73 searchDestinationChainBalances, :360
    * searchSubstrateETLEvents). Strategy tiers, lowest wins per transfer:
    *
    *   1 candidate-exact  dest candidate, received + fees == sent
    *   2 events-exact     deposit event, exact amount, ts ∈ [s, s+180s)
    *   3 candidate-fuzzy  confidence = 1 − |Δ|/sent, > 0.5
    *   4 events-fuzzy     same confidence model on deposit events
    *   5 balance-delta    positive balance change at a block with
    *                      ts ∈ [s−30s, s+N·60s], confidence ≥ 0.75
    *
    * The reference runs the tiers as sequential lookups per transfer;
    * here every tier is an equi-join on (chain_id_dest, dest_pubkey)
    * with a bounded time window, unioned with a `priority` column, and
    * ONE row_number window implements the waterfall — same first-
    * non-null-wins semantics, no per-row driver round trips, and the
    * winner carries its tier's confidence (inheritance).
    *
    * Inputs: `transfers(extrinsic_id, chain_id_dest, dest_pubkey,
    * source_ts, amount_sent, xcm_teleport_fees)`;
    * `candidates(chain_id_dest, dest_pubkey, event_id, dest_ts,
    * amount_received, reaped)`; `events(chain_id, addr_pubkey, event_id,
    * ts, amount)` (deposit-shaped); `balances(chain_id, addr_pubkey,
    * block_number, block_ts, free)`.
    */
  def searchDestination(transfers: DataFrame, candidates: DataFrame,
      events: DataFrame, balances: DataFrame, nBlocks: Int = 3): DataFrame = {
    val t = transfers.select(col("extrinsic_id"), col("chain_id_dest"),
      col("dest_pubkey"), col("source_ts"), col("amount_sent"),
      col("xcm_teleport_fees"))

    def fuzzyConf(recv: org.apache.spark.sql.Column) =
      lit(1.0) - abs((recv - col("amount_sent")).cast("double")) /
        col("amount_sent").cast("double")

    // tiers 1/3 — dest candidates within [s−10s, s+120s]
    val cand = t.join(candidates, Seq("chain_id_dest", "dest_pubkey"))
      .filter(col("dest_ts") >= col("source_ts") - expr("INTERVAL 10 SECONDS") &&
        col("dest_ts") <= col("source_ts") + expr("INTERVAL 120 SECONDS") &&
        col("reaped") === 0)
      .withColumn("recv_total", col("amount_received") + col("xcm_teleport_fees"))
      .withColumn("confidence",
        when(col("recv_total") === col("amount_sent"), lit(1.0))
          .otherwise(fuzzyConf(col("recv_total"))))
      .withColumn("priority",
        when(col("confidence") === 1.0, lit(1)).otherwise(lit(3)))
      .filter(col("confidence") > 0.5)
      .select(col("extrinsic_id"), col("priority"), lit("candidate").as("strategy"),
        col("event_id").as("matched_id"), col("recv_total").as("matched_amount"),
        col("confidence"))

    // tiers 2/4 — deposit events within [s, s+180s)
    val ev = t.join(events,
        col("chain_id_dest") === col("chain_id") &&
          col("dest_pubkey") === col("addr_pubkey"))
      .filter(col("ts") >= col("source_ts") &&
        col("ts") < col("source_ts") + expr("INTERVAL 180 SECONDS"))
      .withColumn("recv_total", col("amount") + col("xcm_teleport_fees"))
      .withColumn("confidence",
        when(col("amount") === col("amount_sent"), lit(1.0))
          .otherwise(fuzzyConf(col("recv_total"))))
      .withColumn("priority",
        when(col("confidence") === 1.0, lit(2)).otherwise(lit(4)))
      .filter(col("confidence") > 0.5)
      .select(col("extrinsic_id"), col("priority"), lit("events").as("strategy"),
        col("event_id").as("matched_id"), col("recv_total").as("matched_amount"),
        col("confidence"))

    // tier 5 — positive balance deltas at the N closest blocks
    val wBal = Window.partitionBy(col("chain_id"), col("addr_pubkey"))
      .orderBy(col("block_number"))
    val deltas = balances
      .withColumn("delta", col("free") - lag(col("free"), 1).over(wBal))
      .filter(col("delta") > 0)
    val bal = t.join(deltas,
        col("chain_id_dest") === col("chain_id") &&
          col("dest_pubkey") === col("addr_pubkey"))
      .filter(col("block_ts") >= col("source_ts") - expr("INTERVAL 30 SECONDS") &&
        col("block_ts") <= col("source_ts") +
          expr(s"INTERVAL ${nBlocks * 60} SECONDS"))
      .withColumn("confidence", fuzzyConf(col("delta")))
      .filter(col("confidence") >= 0.75)
      .select(col("extrinsic_id"), lit(5).as("priority"),
        lit("balance").as("strategy"),
        // zero-padded so the string-widened matched_id tie-break stays
        // numeric, not lexicographic ("21" < "100")
        format_string("%012d", col("block_number")).as("matched_id"),
        col("delta").as("matched_amount"), col("confidence"))

    // the waterfall: lowest tier wins; within a tier, best confidence,
    // then smallest id for determinism
    val w = Window.partitionBy(col("extrinsic_id"))
      .orderBy(col("priority"), col("confidence").desc, col("matched_id"))
    val best = cand.unionByName(ev).unionByName(bal)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // …then each physical match (deposit event / candidate / balance
    // delta) is consumed by at most ONE transfer — first wins in the
    // same order (the two-pass discipline of matchMessages/
    // matchTransfers; the reference marks candidates consumed)
    val perMatch = Window.partitionBy(col("strategy"), col("matched_id"))
      .orderBy(col("priority"), col("confidence").desc, col("extrinsic_id"))
    best.withColumn("rn", row_number().over(perMatch))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("confidence", round(col("confidence"), 6))
  }

  /** J18 — multi-hop trace/span assembly (ref xcmtracer.js:73-160:
    * `generate_span_trace/extrinsic/dest` + `submitleg` build one
    * traceId per origin extrinsic and hang the origination span, each
    * message-leg span, and the destination span under it). The repo's
    * matchers (J1-J5) produce PAIRWISE legs; this chains them into
    * origin→hop→dest traces:
    *
    *  - a leg is a trace ROOT when no other leg of the same msg_hash
    *    arrives at its origin chain within the forwarding window
    *    (`s_sent_at ∈ [pred.d_sent_at, pred.d_sent_at + slack]`) — so
    *    window-broken orphan legs surface as their own 1-leg traces
    *    instead of disappearing;
    *  - hop h+1 is the leg whose origin chain is hop h's destination,
    *    same msg_hash, sent within the window after h's arrival (the
    *    multi-hop msg_hash-reuse chain noted at matchMessages);
    *  - the trace's deepest assembled hop is its destination span
    *    (`is_terminal`), mirroring generate_span_dest.
    *
    * Scale shape: the WHOLE assembly is one lazy plan — a left-anti
    * root filter plus `maxHops−1` equi-joins keyed on (msg_hash,
    * chain), each a shuffled hash join with the time window as a
    * post-join filter; depth is bounded by construction (XCM routes
    * are ≤ a few hops), so no iterate-to-fixpoint and no driver-side
    * recursion over data.
    *
    * Input legs need `msg_hash, chain_id, chain_id_dest, s_sent_at,
    * d_sent_at` (the matchMessages output shape). */
  def assembleTraces(legs: DataFrame, maxHops: Int = 4,
      slack: Long = 4): DataFrame = {
    val l = legs.select(col("msg_hash"), col("chain_id"),
      col("chain_id_dest"), col("s_sent_at").cast("long").as("s_sent_at"),
      col("d_sent_at").cast("long").as("d_sent_at"))
    val pred = l.select(col("msg_hash").as("p_hash"),
      col("chain_id_dest").as("p_dest"), col("d_sent_at").as("p_arr"))
    val cols = Seq("trace_id", "hop", "msg_hash", "chain_id",
      "chain_id_dest", "s_sent_at", "d_sent_at").map(col)
    val roots = l.join(pred,
        col("msg_hash") === col("p_hash") &&
          col("chain_id") === col("p_dest") &&
          col("s_sent_at") >= col("p_arr") &&
          col("s_sent_at") <= col("p_arr") + slack,
        "left_anti")
      .withColumn("trace_id", concat_ws(":", col("msg_hash"),
        col("chain_id"), col("s_sent_at")))
      .withColumn("hop", lit(0))
      .select(cols: _*)
    var frontier = roots
    var out = roots
    for (h <- 1 until maxHops) {
      val f = frontier.select(col("trace_id"),
        col("msg_hash").as("f_hash"), col("chain_id_dest").as("f_dest"),
        col("d_sent_at").as("f_arr"))
      val next = f.join(l,
          col("f_hash") === col("msg_hash") &&
            col("f_dest") === col("chain_id") &&
            col("s_sent_at") >= col("f_arr") &&
            col("s_sent_at") <= col("f_arr") + slack)
        .withColumn("hop", lit(h))
        .select(cols: _*)
      out = out.unionByName(next)
      frontier = next
    }
    val w = Window.partitionBy(col("trace_id"))
    out.withColumn("is_terminal", col("hop") === max(col("hop")).over(w))
  }

  /** J19 — XCM `Transact` inner-call decode → `remoteexecution` spans
    * (ref xcmtransact.js:889-1055: `index_origination_extrinsic` stores
    * the call carried by a Transact instruction at origination,
    * `indexDestinationChainBlock` matches its execution on the
    * destination chain; xcmtracer.js:83 hangs the result under the
    * trace as a remote-execution span).
    *
    * `transacts(msg_hash, transact_call)` carries the SCALE-encoded
    * inner call as hex; it decodes through the SAME metadata tier as
    * block decode ([[graft.decode.MetaDecode]] via
    * [[graft.decode.BlockDecode.decodeCall]]), so any pallet a chain's
    * metadata describes — including v9-v11 legacy-Address-era shapes —
    * resolves with zero per-chain code. The spans attach to each
    * trace's TERMINAL leg (that hop's destination is the executing
    * chain), `kind = remoteexecution`, `hop = terminal hop + 1` —
    * mirroring generate_span_dest.
    *
    * Scale shape: the PalletDef registry is a few KB riding the task
    * closure (same as RuntimeMeta in the dump path); decode is per-row
    * map-side; the only shuffle is the (msg_hash) equi-join of terminal
    * legs against transact payloads. Undecodable payloads drop their
    * row (per-item leniency, like the registry itself) instead of
    * failing the stage.
    *
    * `traces` is [[assembleTraces]] output (needs trace_id, hop,
    * msg_hash, chain_id_dest, is_terminal). */
  def transactSpans(traces: DataFrame, transacts: DataFrame,
      pallets: Seq[graft.decode.MetaDecode.PalletDef]): DataFrame = {
    import graft.decode.BlockDecode
    val meta = BlockDecode.RuntimeMeta(0, 0, calls = Seq.empty,
      events = Seq.empty, pallets = pallets)
    val decode = udf((hex: String) =>
      scala.util.Try {
        val n = BlockDecode.decodeCall(
          new BlockDecode.Cursor(graft.functions.Codec.hexToBytes(hex)),
          meta)
        (n.section, n.method, n.args)
      }.toOption)
    traces.filter(col("is_terminal"))
      .select(col("trace_id"), col("hop"), col("msg_hash"),
        col("chain_id_dest").as("exec_chain"))
      .join(transacts, Seq("msg_hash"))
      .withColumn("dec", decode(col("transact_call")))
      .filter(col("dec").isNotNull)
      .select(col("trace_id"), (col("hop") + 1).as("hop"),
        col("msg_hash"), col("exec_chain"),
        lit("remoteexecution").as("kind"),
        col("dec._1").as("section"), col("dec._2").as("method"),
        col("dec._3").as("args_json"))
  }

  /** The unified trace document (ref xcmtracer.js:83-160 emits ONE
    * span list per trace: origination, message legs, destination /
    * remote execution): every [[assembleTraces]] leg becomes a
    * `message` span and every decoded Transact execution a
    * `remoteexecution` span, in one frame ordered by (trace_id, hop).
    * Columns are the union — message spans carry the leg chain pair
    * and times, execution spans carry the decoded call. */
  def fullTrace(traces: DataFrame, transacts: DataFrame,
      pallets: Seq[graft.decode.MetaDecode.PalletDef]): DataFrame = {
    val msg = traces.select(col("trace_id"), col("hop"), col("msg_hash"),
      lit("message").as("kind"), col("chain_id"), col("chain_id_dest"),
      col("s_sent_at"), col("d_sent_at"),
      lit(null).cast("string").as("section"),
      lit(null).cast("string").as("method"),
      lit(null).cast("string").as("args_json"))
    val exec = transactSpans(traces, transacts, pallets)
      .select(col("trace_id"), col("hop"), col("msg_hash"), col("kind"),
        lit(null).cast(msg.schema("chain_id").dataType).as("chain_id"),
        col("exec_chain").as("chain_id_dest"),
        lit(null).cast("long").as("s_sent_at"),
        lit(null).cast("long").as("d_sent_at"),
        col("section"), col("method"), col("args_json"))
    msg.unionByName(exec).orderBy(col("trace_id"), col("hop"))
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
        col("exact"), round(col("confidence"), 6).as("confidence"),
        // destination detail the xcmtransfers export projects
        // (ref xcmtransfers.json destination_* columns)
        col("dest_ts"), col("block_number_dest"),
        col("amount_received"), col("xcm_teleport_fees"))
  }
}
