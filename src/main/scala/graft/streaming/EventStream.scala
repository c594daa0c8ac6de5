package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming faces of the engine — SURVEY.md §2.9 (ST1-ST8).
  *
  * The reference ingests via WebSocket subscriptions with a
  * tip/finalized duality (crawler.js:1572-1720): unfinalized candidate
  * blocks arrive optimistically, finalization picks the winning fork and
  * deletes the losers. In Spark:
  *
  *  - bronze = append-only candidate stream (possibly multiple rows per
  *    (chain_id, block_number) from redundant crawlers / forks);
  *  - silver = finalized-only view: watermarked dedup keeping the
  *    finalized (or latest) candidate per key — `flatMapGroupsWithState`
  *    when retraction timing matters, `dropDuplicates` + filter when the
  *    2-tier layout suffices (SURVEY §7.3 recommends the 2-tier dodge).
  *
  * Tests drive these with a file/memory source at small scale; the same
  * code runs against a Kafka/file stream on a cluster (watermarks bound
  * all state).
  */
object EventStream {

  /** Candidate block row (bronze). */
  case class Candidate(chain_id: Int, block_number: Long, block_hash: String,
      finalized: Boolean, ts: java.sql.Timestamp)

  /** Resolved block row (silver). */
  case class Finalized(chain_id: Int, block_number: Long, block_hash: String,
      ts: java.sql.Timestamp)

  val candidateSchema: StructType = StructType(Seq(
    StructField("chain_id", IntegerType),
    StructField("block_number", LongType),
    StructField("block_hash", StringType),
    StructField("finalized", BooleanType),
    StructField("ts", TimestampType)))

  /** ST1/ST5 — finality resolution with bounded state: one state entry
    * per (chain, block), evicted by event-time timeout once the
    * watermark passes the block by `stateRetention`. Emits exactly one
    * row per key within the retention window: after emission the entry
    * becomes an empty-list tombstone so redundant crawlers re-delivering
    * the finalized block in later micro-batches (the ST5 bronze model)
    * don't re-emit. A duplicate arriving later than the retention window
    * could re-emit — at that lateness the ST3 reconciliation pass (which
    * rebuilds silver idempotently from bronze) is the authority anyway.
    * (ref crawler.js:1572-1619 processFinalizedHead + candidate delete.)
    */
  def finalizeStream(candidates: org.apache.spark.sql.Dataset[Candidate],
      watermarkDelay: String = "10 minutes",
      stateRetentionMs: Long = 60L * 60 * 1000)(
      implicit spark: SparkSession): org.apache.spark.sql.Dataset[Finalized] = {
    import spark.implicits._
    candidates
      .withWatermark("ts", watermarkDelay)
      .groupByKey(c => (c.chain_id, c.block_number))
      .flatMapGroupsWithState[List[Candidate], Finalized](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((chain, bn), rows, state: GroupState[List[Candidate]]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed: evict (tombstone or fork)
            Iterator.empty
          } else {
            val batch = rows.toList // the iterator is single-use
            def armEviction(): Unit = {
              val maxTs = batch.map(_.ts.getTime).foldLeft(
                state.getCurrentWatermarkMs())(math.max)
              state.setTimeoutTimestamp(maxTs + stateRetentionMs)
            }
            val emitted = state.getOption.exists(_.isEmpty)
            if (emitted) { armEviction(); Iterator.empty }
            else {
              val all = state.getOption.getOrElse(Nil) ++ batch
              all.find(_.finalized) match {
                case Some(win) =>
                  state.update(Nil) // tombstone until eviction
                  armEviction()
                  Iterator.single(
                    Finalized(chain, bn, win.block_hash, win.ts))
                case None =>
                  state.update(all)
                  armEviction()
                  Iterator.empty
              }
            }
          }
      }
  }

  /** ST5 batch/stream dedup twin: finalized-preferred latest-candidate
    * per (chain, block) as a plain DataFrame op (works on both batch and
    * streaming inputs; streaming requires a watermark upstream). */
  def dedupCandidates(bronze: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("chain_id"), col("block_number"))
      .orderBy(col("finalized").desc, col("ts").desc, col("block_hash"))
    bronze.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** ST6 — tumbling-window aggregation with watermark (the streaming twin
    * of Aggregates a12; ref priceManager.js:223 five-minute buckets).
    * The float sum runs through the engine-identical DECIMAL(38,6)
    * template (operators.dsumOut) so the emitted value is independent
    * of partial-aggregation order — what lets st4 put this operator
    * under the cross-engine hash gate. */
  def windowedCounts(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.operators.dsumOut(col("value")).as("sum_value"))
      .select(col("window.start").as("hr_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** ST5 scale variant — state-bounded EXACT dedup on the full candidate
    * identity via `dropDuplicatesWithinWatermark`: keeps the first
    * arrival per (chain, block, hash) and expires the key's state once
    * the watermark passes its event time, so redundant-crawler replays
    * cost O(in-flight blocks) state instead of O(history). Complements
    * [[dedupCandidates]] (finalized-preferred LATEST, a ranking) — this
    * one is the raw at-least-once → effectively-once gate in front of
    * bronze. */
  def dedupExactStream(bronze: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    bronze.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("chain_id", "block_number",
        "block_hash")

  /** ST6 variant — event-time SESSION windows (gap-merged user
    * sessions): the same `session_window` call as the batch
    * `w6_sessionize` query, so StreamingSpec can pin stream ≡ batch on
    * shared input. State per (user, open session) is bounded by the
    * watermark; sessions close and emit once the watermark passes their
    * last event + gap (append mode), or continuously in complete mode. */
  def sessionize(stream: DataFrame, gap: String = "6 hours",
      watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col("ts"))).as("last_us"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        col("last_us"), col("n_events"))

  /** S10/ST3 — file-landing ingest at the tip: stream NDJSON files from
    * a landing directory with schema enforcement (the reference's
    * sidecar-dump → object-store landing pattern, ref substrateetl.js
    * dump → `bq load` flow). `maxFilesPerTrigger` bounds each
    * micro-batch; with a checkpointed parquet sink the pipeline is
    * exactly-once across restarts (each file processed exactly once —
    * proven by FileStreamSpec's stop/append/restart case). */
  def jsonFileSource(spark: SparkSession, dir: String,
      schema: StructType, maxFilesPerTrigger: Int = 10,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .options(options) // reader options (e.g. timestampFormat) —
                        // landing formats vary by producer; applied
                        // LAST so an explicit map entry (incl.
                        // maxFilesPerTrigger) is never silently
                        // overwritten by the parameter default
      .json(dir)

  /** ST2/ST7 — stream-stream interval join with watermarks: the XCM
    * source↔dest correlation (ref xcmmanager.js:423: dest within
    * [source, source+120s]); state bounded by both watermarks + the
    * interval condition. */
  /** Funnel event row and emitted per-user snapshot (streaming w9). */
  case class FunnelEvent(user_id: Long, event_type: String, tus: Long)
  case class FunnelSnap(user_id: Long, seq: Long, ta: Option[Long],
      tb: Option[Long], tc: Option[Long])
  case class FunnelState(minView: Long, clicks: List[Long],
      purchases: List[Long], seq: Long)

  /** ST7 variant — the w9 funnel running INCREMENTALLY: per-user
    * view→click→purchase step times maintained across micro-batches
    * with `flatMapGroupsWithState`, REPAIRING out-of-order arrivals
    * (a click processed before its view still counts once the view
    * lands, because ta only ever decreases and candidates are kept —
    * repair reaches back as far as `watermarkDelay`: events older than
    * the watermark are dropped by the engine's late-input filter
    * before they reach the state function, which is the price of the
    * state bound below). Emits a snapshot per touched user per
    * micro-batch (update mode); `seq` orders a user's snapshots so a
    * sink can keep latest-wins.
    *
    * State bound — two mechanisms, both wired here: (1) per-entry
    * size: one long + the candidate click/purchase times that can
    * still qualify — anything past minView + 2·window is pruned (the
    * windows only move EARLIER as ta decreases, so pruned times can
    * never re-qualify) and times are deduplicated; (2) entry COUNT:
    * EventTimeTimeout evicts a user once the watermark passes their
    * last funnel activity + `stateRetentionMs`, so a user with clicks
    * but no view does NOT hold a candidate list forever — total state
    * is O(users active within retention), not O(users ever seen).
    * StreamingSpec pins the final snapshots frame-equal to the batch
    * `WindowOps.funnelSteps` on the same rows, and pins the eviction
    * lane (a stale user's state is gone after the watermark passes). */
  def funnelStream(ev: org.apache.spark.sql.Dataset[FunnelEvent],
      stepWindowUs: Long = 604800000000L,
      watermarkDelay: String = "30 days",
      stateRetentionMs: Long = 30L * 24 * 3600 * 1000)(
      implicit spark: SparkSession): org.apache.spark.sql.Dataset[FunnelSnap] = {
    import spark.implicits._
    // drop non-funnel events BEFORE keying: otherwise every user who
    // never touches the funnel gets a state entry (idle until eviction)
    // and an all-null snapshot the batch funnelSteps (which filters
    // isin(steps) first) would never emit
    ev.filter((e: FunnelEvent) => e.event_type == "view" ||
        e.event_type == "click" || e.event_type == "purchase")
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FunnelEvent], st: GroupState[FunnelState]) =>
          if (st.hasTimedOut) {
            st.remove() // watermark passed last activity + retention
            Iterator.empty
          } else {
          val prev = st.getOption
            .getOrElse(FunnelState(Long.MaxValue, Nil, Nil, 0L))
          var mv = prev.minView
          var clicks = prev.clicks
          var purchases = prev.purchases
          var maxUs = Long.MinValue
          it.foreach { e =>
            if (e.tus > maxUs) maxUs = e.tus
            e.event_type match {
              case "view" => if (e.tus < mv) mv = e.tus
              case "click" => clicks ::= e.tus
              case "purchase" => purchases ::= e.tus
              case _ =>
            }
          }
          if (mv != Long.MaxValue) {
            clicks = clicks.filter(_ <= mv + stepWindowUs)
            purchases = purchases.filter(_ <= mv + 2 * stepWindowUs)
          }
          clicks = clicks.distinct
          purchases = purchases.distinct
          val ta = if (mv == Long.MaxValue) None else Some(mv)
          val tb = ta.flatMap(a => clicks
            .filter(t => t > a && t <= a + stepWindowUs).minOption)
          val tc = tb.flatMap(b => purchases
            .filter(t => t > b && t <= b + stepWindowUs).minOption)
          val seq = prev.seq + 1
          st.update(FunnelState(mv, clicks, purchases, seq))
          // setTimeoutTimestamp must exceed the current watermark;
          // late-filtered input guarantees maxUs/1000 ≥ watermark only
          // when the batch is non-empty for this key, so clamp anyway
          st.setTimeoutTimestamp(
            math.max(maxUs / 1000L, st.getCurrentWatermarkMs()) +
              stateRetentionMs)
          Iterator(FunnelSnap(uid, seq, ta, tb, tc))
          }
      }
  }

  /** `intervalSeconds` defaults to the reference's 120 s XCM
    * source→dest window; callers on sparser fixtures widen it. With
    * both sides watermarked, Spark keys per-side state off the
    * interval condition and evicts a src row once the global watermark
    * proves no future dst row can land inside its window — state is
    * O(in-flight interval), not O(history). When each side's landing
    * replays in event-time order (no late data), the emitted matches
    * are EXACTLY the batch interval join. */
  def streamIntervalJoin(src: DataFrame, dst: DataFrame,
      intervalSeconds: Long = 120L,
      watermarkDelay: String = "2 minutes"): DataFrame = {
    val s = src.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("s_user"), col("event_id").as("s_event_id"),
        col("ts").as("s_ts"))
    val d = dst.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("d_user"), col("event_id").as("d_event_id"),
        col("ts").as("d_ts"))
    s.join(d,
      col("s_user") === col("d_user") &&
        col("d_ts") >= col("s_ts") &&
        col("d_ts") <= col("s_ts") +
          expr(s"INTERVAL $intervalSeconds SECONDS"))
  }

  /** ST7's straggler lane — the LEFT OUTER stream-stream interval
    * join: matched pairs emit like [[streamIntervalJoin]], and a
    * source row whose window closes unmatched emits ONCE with null
    * dst columns as soon as the watermark passes `s_ts + interval +
    * delay` — the reference's unmatched-XCM timeout (xcmmanager.js
    * `matched=0` rows left for xcmCleaner.js:1018's lookback sweep to
    * mark failed/incomplete). Spark only emits the null-extended row
    * on watermark passage, so rows still inside their window at
    * end-of-input stay in state for the NEXT run (checkpointed) —
    * exactly the reference's "still matchable" pending set; the
    * periodic batch rematch (`XcmMatcher` over a lookback window,
    * idempotent overwrite) remains the authority for stragglers
    * older than any retention. */
  def streamIntervalJoinOuter(src: DataFrame, dst: DataFrame,
      intervalSeconds: Long = 120L,
      watermarkDelay: String = "2 minutes"): DataFrame = {
    val s = src.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("s_user"), col("event_id").as("s_event_id"),
        col("ts").as("s_ts"))
    val d = dst.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("d_user"), col("event_id").as("d_event_id"),
        col("ts").as("d_ts"))
    s.join(d,
      col("s_user") === col("d_user") &&
        col("d_ts") >= col("s_ts") &&
        col("d_ts") <= col("s_ts") +
          expr(s"INTERVAL $intervalSeconds SECONDS"),
      "leftOuter")
  }
}
