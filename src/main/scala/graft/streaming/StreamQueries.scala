package graft.streaming

import graft.Tables
import graft.operators.{queryDumpDir, us}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-oracled faces of the streaming tier (SURVEY.md §2.9) — the
  * two flagship paths run END TO END under the correctness gate, not
  * just under ScalaTest parity:
  *
  *  - `st1` drives the [[CorpusStream]] foreachBatch dump
  *    (ST4 micro-batched ingest + ST8 replay-idempotent writer,
  *    ref indexer.js:7036 / substrateetl.js:5170) and oracles the
  *    READ-BACK of the published parquet against the batch
  *    aggregation's SQL — legitimate because StreamingCorpusSpec pins
  *    stream ≡ batch over the same expression tree, and the dump's
  *    complete-mode replace makes the final artifact independent of
  *    micro-batch boundaries.
  *  - `st2` runs the stream-stream interval correlation
  *    (ST2/ST7, the XCM source↔dest match, ref xcmmanager.js:423)
  *    through a checkpointed parquet sink and oracles the read-back
  *    against the batch interval join.
  *
  * Determinism (what makes a STREAMING query oracle-able) — two
  * DIFFERENT arguments, one per query:
  *  - st2 (watermarked state): each landed file covers a disjoint
  *    event-time range and the file source replays files in mod-time
  *    order (stamped by [[landTimeOrdered]]), so no row is ever late
  *    against the watermark — under that arrival order the
  *    stream-stream join emits EXACTLY the batch result regardless of
  *    where the micro-batch boundaries fall.
  *  - st1 (no watermark): the complete-mode aggregation is
  *    arrival-order INDEPENDENT — counts commute — so its landing
  *    needs no time ordering at all (plain repartition, real
  *    mod-times); the final replace is the full state whatever the
  *    batch boundaries were. Do NOT copy st1's un-stamped landing
  *    into a future query that carries event-time state: that path
  *    needs st2's contract.
  * The out-of-order/late lanes (where stream and batch legitimately
  * diverge) are pinned by StreamingParitySpec instead, where ScalaTest
  * can assert the drop/evict behavior directly.
  *
  * Scale shape: both paths are the real 100 TB deployment shape — a
  * landing directory drained by `Trigger.AvailableNow` with a
  * checkpoint (the scheduled catch-up twin of the always-on tip
  * stream), state bounded by the vocabulary (st1) / the watermarked
  * interval (st2), and an idempotent published artifact.
  */
object StreamQueries {

  /** Land `df` as `n` event-time-ordered parquet files: range
    * partition on `ts` (file k = k-th time slice), then stamp
    * mod-times in range order so the file source's mod-time replay IS
    * event-time order — the no-late-data arrival the determinism
    * contract above requires. */
  private def landTimeOrdered(df: DataFrame, dir: String, n: Int)
      : Unit = {
    df.repartitionByRange(n, col("ts")).write.parquet(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      // a silent stamp failure voids the no-late-data contract and
      // surfaces later as an inexplicable oracle mismatch — fail here
      require(f.setLastModified(1700000000000L + i * 1000L),
        s"could not stamp mod-time on $f")
    }
  }

  /** Move the single part-file of a `coalesce(1)` parquet write from
    * `tmp` into `dir/name` with an explicit mod-time — the one
    * spelling of the land-and-stamp step every fixture file that must
    * replay in a KNOWN micro-batch position goes through. */
  private[graft] def landFileStamped(tmp: String, dir: String,
      name: String, mtime: Long): Unit = {
    // listFiles() is null (not empty) on a missing dir — guard so a
    // failed upstream write hits the require diagnostic, not an NPE
    val parts = Option(new java.io.File(tmp).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.startsWith("part-"))
    // a non-coalesced write landed here would silently drop rows and
    // surface much later as an inexplicable oracle mismatch — fail now
    require(parts.length == 1,
      s"$tmp has ${parts.length} part files; caller must coalesce(1)")
    val tgt = new java.io.File(dir, name)
    require(parts.head.renameTo(tgt),
      s"could not move ${parts.head} to $tgt")
    require(tgt.setLastModified(mtime),
      s"could not stamp mod-time on $tgt")
  }

  /** The checkpointed parquet-sink drain every append-mode row uses:
    * writeStream → parquet + checkpoint → Trigger.AvailableNow →
    * awaitTermination-or-die (stop() in finally so a timeout cannot
    * leak a live query into the shared session). */
  private def drainToParquet(df: DataFrame, out: String, ckpt: String,
      what: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(300000), s"$what timed out")
    finally q.stop()
  }

  /** The foreachBatch drain core — one spelling of the
    * checkpoint/AvailableNow/awaitTermination-or-die guard for the
    * sinks the parquet writer can't express directly. */
  private def drainForeachBatch(df: DataFrame, outputMode: String,
      saveMode: String, out: String, ckpt: String, what: String): Unit = {
    val q = df.writeStream
      .outputMode(outputMode)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(saveMode).parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(300000), s"$what timed out")
    finally q.stop()
  }

  /** The complete-mode replace-writer drain (st1's ST8 shape, reused
    * by st4 and by StreamQueriesSpec so the spec exercises the SAME
    * production path it pins): every micro-batch overwrites `out`
    * with the full aggregate — replay-idempotent by construction. */
  private[graft] def drainCompleteReplace(agg: DataFrame, out: String,
      ckpt: String, what: String): Unit =
    drainForeachBatch(agg, "complete", "overwrite", out, ckpt, what)

  /** The update-mode append-log drain (st8's shape): each micro-batch
    * appends its snapshots; the reader keeps latest-wins. */
  private def drainUpdateAppend(df: DataFrame, out: String,
      ckpt: String, what: String): Unit =
    drainForeachBatch(df, "update", "append", out, ckpt, what)

  private def st1(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_corpus")
    val landing = s"$root/landing"
    val out = s"$root/out"
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.repartition(4).write.parquet(landing)
    CorpusStream.dumpTokenCounts(s, landing, docs.schema, out,
      s"$root/ckpt")
    s.read.parquet(out).orderBy(col("tok"), col("n"))
  }

  private val st1Sql =
    """SELECT tok, count(*) AS n
      |FROM (SELECT unnest(string_split_regex(trim(text), '\s+'))
      |   AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY tok, n""".stripMargin

  /** The reference's window is 120 s on real XCM traffic
    * (xcmmanager.js:423); the synthetic events table is ~1000× sparser
    * per user, so the FIXTURE widens to 6 h to exercise matches —
    * the state/eviction machinery is identical at any width. Shared
    * by st2 (inner) and st7 (left outer): one constant so the two
    * rows gate the SAME interval predicate, diverging only in the
    * straggler lane. */
  private[graft] val FixtureIntervalSec = 21600L

  private def st2(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_xcm")
    // persisted: the frame feeds both side writes — two scans otherwise
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .persist()
    def side(name: String, typ: String): String = {
      val dir = s"$root/$name"
      landTimeOrdered(
        ev.filter(col("event_type") === typ).drop("event_type"), dir, 3)
      dir
    }
    val srcDir = side("src", "view")
    val dstDir = side("dst", "click")
    val schema = ev.drop("event_type").schema
    ev.unpersist()
    def rs(dir: String) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = s"$root/out"
    drainToParquet(EventStream.streamIntervalJoin(rs(srcDir), rs(dstDir),
        intervalSeconds = FixtureIntervalSec),
      out, s"$root/ckpt", "stream-stream interval join")
    s.read.parquet(out)
      .select(col("s_user").as("user_id"), col("s_event_id"),
        col("d_event_id"), us(col("s_ts")).as("s_us"),
        us(col("d_ts")).as("d_us"))
      .orderBy(col("user_id"), col("s_event_id"), col("d_event_id"))
  }

  private val st2Sql =
    s"""SELECT s.user_id AS user_id,
       | s.event_id AS s_event_id, d.event_id AS d_event_id,
       | epoch_us(CAST(s.ts AS TIMESTAMP)) AS s_us,
       | epoch_us(CAST(d.ts AS TIMESTAMP)) AS d_us
       |FROM events s JOIN events d ON s.user_id = d.user_id
       |WHERE s.event_type = 'view' AND d.event_type = 'click'
       | AND epoch_us(CAST(d.ts AS TIMESTAMP))
       |  BETWEEN epoch_us(CAST(s.ts AS TIMESTAMP))
       |  AND epoch_us(CAST(s.ts AS TIMESTAMP))
       |   + ${FixtureIntervalSec}000000
       |ORDER BY user_id, s_event_id, d_event_id""".stripMargin

  /** Watermark delay for the st3/st5 fixture lanes — WIDER than the
    * candidate fixture's ~30-day event-time span, on purpose: Spark's
    * stateful operators (FlatMapGroupsWithStateExec under
    * EventTimeTimeout, streaming dedup) filter late input below the
    * watermark, so at a production-width delay the later-stamped
    * re-delivery file would be silently absorbed by the LATE FILTER
    * and never reach the state store — leaving st3's tombstone guard
    * and st5's state-store-drop guard vacuous. One constant for both
    * lanes; if the fixture's span ever grows past it, BOTH guards go
    * vacuous together, so change it here only with the span in view. */
  private[graft] val FixtureWatermarkDelay = "45 days"

  /** The st3/st5 shared fixture: fork candidates derived from `events`
    * — key = (user_id%4, event_id%499), every event a candidate with
    * its own hash, exactly one finalized per key (min event_id), plus
    * a VERBATIM re-delivery of each finalized row landed as ONE file
    * stamped strictly AFTER the candidate files, so every duplicate
    * arrives in a LATER micro-batch than the original (the redundant-
    * crawler model). Returns (landingDir, schema); memoized per
    * (session, sfDir) — st3 and st5 stream from the SAME read-only
    * landing (checkpoints/sinks stay per-query), so a gate run pays
    * the events scan + window-min + 5-file landing once, not twice. */
  private val landingMemo =
    scala.collection.mutable.Map[(SparkSession, String),
      (String, org.apache.spark.sql.types.StructType)]()

  /** Scope note: the memo is sized for the gate runner's lifetime —
    * ONE session, a handful of sfDirs, entries never evicted (a
    * stopped session's key would pin it and its landing path; no such
    * process exists today). A cache hit re-validates the landing's
    * CONTENTS — all four candidate part files and the later-stamped
    * dup-0.parquet re-delivery — so a cleaned or half-cleaned temp
    * tree rebuilds instead of streaming st3/st5 from a gutted fixture
    * (losing dup-0 alone would leave st3's tombstone lane silently
    * unexercised while the oracle stays green). */
  private def landingIntact(landing: String): Boolean = {
    val files = Option(new java.io.File(landing).listFiles())
      .getOrElse(Array.empty[java.io.File]).map(_.getName)
    files.count(_.startsWith("part-")) == 4 &&
      files.contains("dup-0.parquet")
  }

  private def candidateLanding(s: SparkSession, d: String)
      : (String, org.apache.spark.sql.types.StructType) =
    landingMemo.synchronized {
      landingMemo.get((s, d)) match {
        case Some(hit) if landingIntact(hit._1) => hit
        case _ =>
          val built = buildCandidateLanding(s, d,
            queryDumpDir("graft_stream_cand"))
          landingMemo.update((s, d), built)
          built
      }
    }

  /** The ONE spelling of the candidate fixture derivation (chain =
    * user%4, block = event%499, md5 hash, min-event finality marker)
    * shared by the st3/st5 landing and the st10 ranking fixture — a
    * key/hash change edited in one place cannot leave the two tiers
    * gating silently different fixtures (their SQL twins still need
    * the matching edit, but the gate hash fails loudly if missed).
    * `sparseFinality` restricts the finalized flag to
    * `block_number % 3 != 0` groups (st10's both-branches fixture). */
  private def candidateFrame(s: SparkSession, d: String,
      sparseFinality: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.events(s, d).select(
      (col("user_id") % 4).cast("int").as("chain_id"),
      (col("event_id") % 499).as("block_number"),
      col("event_id"), col("ts"))
    val w = Window.partitionBy(col("chain_id"), col("block_number"))
    val isMin = col("event_id") === min(col("event_id")).over(w)
    base
      .withColumn("finalized",
        if (sparseFinality) isMin && col("block_number") % 3 =!= 0
        else isMin)
      .withColumn("block_hash", concat(lit("0x"),
        md5(concat_ws(":", col("chain_id"), col("block_number"),
          col("event_id")).cast("binary"))))
      .select(col("chain_id"), col("block_number"), col("block_hash"),
        col("finalized"), col("ts"))
  }

  private def buildCandidateLanding(s: SparkSession, d: String,
      root: String): (String, org.apache.spark.sql.types.StructType) = {
    // persisted: the fixture frame feeds two writes (the candidate
    // landing and the duplicate re-delivery file) — without the pin
    // the events scan + window min would run twice
    val cand = candidateFrame(s, d, sparseFinality = false).persist()
    val landing = s"$root/landing"
    landTimeOrdered(cand, landing, 4)
    val dupTmp = s"$root/dup"
    cand.filter(col("finalized")).coalesce(1).write.parquet(dupTmp)
    val schema = cand.schema
    cand.unpersist()
    landFileStamped(dupTmp, landing, "dup-0.parquet", 1700000100000L)
    (landing, schema)
  }

  /** ST1/ST5 — [[EventStream.finalizeStream]] (the reference's tip vs
    * finalized duality, crawler.js:1572-1669) under the driver gate,
    * on the [[candidateLanding]] fixture. Why this is oracle-able:
    * emission picks the first finalized candidate in arrival order,
    * which is only order-sensitive when a key carries ≥2 DISTINCT
    * finalized rows — one winner (the min-event_id row; event_ids are
    * unique, so no ties) + identical duplicates emit the same row
    * under any arrival order and any micro-batch split. The
    * re-delivery file arrives in a LATER micro-batch than each key's
    * emission and must be absorbed by the TOMBSTONE branch, not by
    * same-batch find — [[FixtureWatermarkDelay]] keeps the watermark
    * below every duplicate's event time so the rows genuinely reach
    * the state fn (see that constant's late-filter note); if the
    * tombstone ever regressed to state.remove-after-emit, the
    * re-emission would double the rows and fail the oracle hash
    * (verified by a round-16 regression experiment: 1740 vs 870 rows).
    * (Re-emission via tombstone EVICTION needs the 100-day retention
    * to pass inside the fixture's span — it can't; the
    * eviction/timeout and late-drop lanes stay ScalaTest-pinned in
    * StreamingSpec/StreamingParitySpec where they belong.) Output:
    * exactly one finalized row per key, oracled by DuckDB's
    * min-event_id winner pick. */
  private def st3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val root = queryDumpDir("graft_stream_finality")
    val (landing, schema) = candidateLanding(s, d)
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .as[EventStream.Candidate]
    val out = s"$root/out"
    drainToParquet(EventStream.finalizeStream(stream,
        watermarkDelay = FixtureWatermarkDelay,
        stateRetentionMs = 100L * 24 * 3600 * 1000)(s).toDF(),
      out, s"$root/ckpt", "finality stream")
    s.read.parquet(out)
      .select(col("chain_id"), col("block_number"), col("block_hash"),
        us(col("ts")).as("ts_us"))
      .orderBy(col("chain_id"), col("block_number"))
  }

  private val st3Sql =
    """WITH c AS (
      | SELECT CAST(user_id % 4 AS INT) AS chain_id,
      |  CAST(event_id % 499 AS BIGINT) AS block_number,
      |  event_id, CAST(ts AS TIMESTAMP) AS tsm
      | FROM events),
      |w AS (
      | SELECT chain_id, block_number, min(event_id) AS win
      | FROM c GROUP BY 1, 2)
      |SELECT c.chain_id, c.block_number,
      | '0x' || md5(CAST(c.chain_id AS VARCHAR) || ':'
      |  || CAST(c.block_number AS VARCHAR) || ':'
      |  || CAST(c.event_id AS VARCHAR)) AS block_hash,
      | epoch_us(c.tsm) AS ts_us
      |FROM c JOIN w ON c.chain_id = w.chain_id
      | AND c.block_number = w.block_number AND c.event_id = w.win
      |ORDER BY c.chain_id, c.block_number""".stripMargin

  /** ST6 — [[EventStream.windowedCounts]] (the reference's 5-min/hourly
    * price-bucket tier, priceManager.js:223) under the driver gate: the
    * watermarked tumbling-window aggregation runs through a checkpointed
    * foreachBatch replace-writer (complete mode — the same
    * replay-idempotent publish st1 uses) and the read-back is oracled
    * against DuckDB's date_trunc group-by. Determinism is st1's
    * argument: complete-mode aggregation state is arrival-order
    * independent (counts commute; the float sum runs through the
    * engine-identical DECIMAL(38,6) template inside windowedCounts), so
    * the landing needs no time ordering and the final replace is the
    * full state whatever the micro-batch boundaries were. */
  private def st4(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_windowed")
    val landing = s"$root/landing"
    val out = s"$root/out"
    val ev = Tables.events(s, d)
      .select(col("ts"), col("event_type"), col("value"))
    ev.repartition(3).write.parquet(landing)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    drainCompleteReplace(EventStream.windowedCounts(stream), out,
      s"$root/ckpt", "windowed-counts stream")
    s.read.parquet(out)
      .select(us(col("hr_start")).as("hr_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("hr_us"), col("event_type"))
  }

  private val st4Sql =
    """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hr_us,
      | event_type, count(*) AS n,
      | round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6)
      |  AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hr_us, event_type""".stripMargin

  /** ST5 — [[EventStream.dedupExactStream]]
    * (dropDuplicatesWithinWatermark, the at-least-once →
    * effectively-once gate in front of bronze) under the driver gate,
    * on the same fixture as st3: candidate rows unique per (chain,
    * block, hash) except the finalized rows' VERBATIM re-deliveries,
    * which land as a later-stamped file and therefore arrive in a
    * later micro-batch — the drop must come from the state store, not
    * same-batch dedup. Determinism: duplicates are verbatim, so
    * whichever arrival is kept carries identical values;
    * [[FixtureWatermarkDelay]] (wider than the fixture span — the
    * late-filter trap documented there) keeps every key's dedup state
    * alive and no row late for the whole drain, so the emitted set is
    * exactly DISTINCT over the landing. A regressed state store
    * (duplicates re-emitted) doubles the finalized rows and fails the
    * oracle hash. */
  private def st5(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_dedup")
    val (landing, schema) = candidateLanding(s, d)
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val out = s"$root/out"
    drainToParquet(EventStream.dedupExactStream(stream.toDF(),
        watermarkDelay = FixtureWatermarkDelay),
      out, s"$root/ckpt", "exact-dedup stream")
    s.read.parquet(out)
      .select(col("chain_id"), col("block_number"), col("block_hash"),
        col("finalized"), us(col("ts")).as("ts_us"))
      .orderBy(col("chain_id"), col("block_number"), col("block_hash"))
  }

  private val st5Sql =
    """SELECT CAST(user_id % 4 AS INT) AS chain_id,
      | CAST(event_id % 499 AS BIGINT) AS block_number,
      | '0x' || md5(CAST(user_id % 4 AS VARCHAR) || ':'
      |  || CAST(event_id % 499 AS VARCHAR) || ':'
      |  || CAST(event_id AS VARCHAR)) AS block_hash,
      | event_id = min(event_id) OVER (
      |  PARTITION BY user_id % 4, event_id % 499) AS finalized,
      | epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |FROM events
      |ORDER BY chain_id, block_number, block_hash""".stripMargin

  /** The WATERMARK-ADVANCING SENTINEL — what lets APPEND-mode stateful
    * emission (closed sessions, timed-out outer-join rows) run under
    * the batch oracle at all. Append mode only emits a session / an
    * unmatched row once the watermark passes its close, and the
    * watermark computed from batch N applies in batch N+1 — so the
    * tail of any finite drain would stay unemitted in state and the
    * read-back could never equal the batch twin. Fix: land TWO
    * sentinel files per source, stamped after all data files, each
    * carrying one `user_id = -1` row far enough in the future
    * (sentinel A pushes the watermark past every real row's close;
    * sentinel B's batch then runs with that watermark and flushes the
    * emissions — relying on nothing about no-data-batch scheduling).
    * Sentinel rows are filtered from the read-back; their own state
    * (never closed by any later watermark) dies with the drain. */
  private def landSentinels(s: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row]): Unit =
    rows.zipWithIndex.foreach { case (row, i) =>
      val tmp = s"$dir-sentinel-$i"
      s.createDataFrame(java.util.Collections.singletonList(row), schema)
        .coalesce(1).write.parquet(tmp)
      landFileStamped(tmp, dir, s"sentinel-$i.parquet",
        1700009000000L + i * 1000L)
    }

  /** ST6 (session half) — [[EventStream.sessionize]] under the driver
    * gate: event-time SESSION windows in APPEND mode through a
    * checkpointed parquet sink, emission forced by the sentinel
    * technique above. Determinism: the time-ordered landing means no
    * late data, session-window merging is arrival-order independent
    * (the closed session is the union of its events whatever the
    * micro-batch split), and append mode emits each closed session
    * exactly once — so the read-back (sentinels filtered) is exactly
    * the batch session_window result, oracled by the same
    * gaps-and-islands SQL as the batch w6 query. */
  private def st6(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_session")
    val landing = s"$root/landing"
    // persisted: the frame feeds the landing write AND the max-ts agg
    val ev = Tables.events(s, d).filter(col("user_id") < 50)
      .select(col("user_id"), col("ts"))
      .persist()
    landTimeOrdered(ev, landing, 3)
    val maxTs = ev.agg(max(col("ts"))).collect()(0)
      .getTimestamp(0).getTime // ms; one-row agg, not a data collect
    val schema = ev.schema
    ev.unpersist()
    def sentinel(offsetMs: Long) = org.apache.spark.sql.Row(
      -1L, new java.sql.Timestamp(maxTs + offsetMs))
    // A: +8h (> gap 6h + delay 10m past every real session close);
    // B: +16h (> A + gap + delay, so A's flush batch genuinely runs)
    landSentinels(s, landing, schema,
      Seq(sentinel(8L * 3600 * 1000), sentinel(16L * 3600 * 1000)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val out = s"$root/out"
    drainToParquet(EventStream.sessionize(stream), out, s"$root/ckpt",
      "session stream")
    s.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("sess_start_us"), col("last_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }

  // LITERALLY the batch w6 oracle — one spelling of session semantics
  // across the batch and stream tiers (same fixture filter, same gap,
  // same output columns); if w6 evolves, the gate holds st6's Spark
  // side to the same change
  private val st6Sql =
    graft.operators.WindowOps.oracles("w6_sessionize")

  /** ST7 (straggler lane) — [[EventStream.streamIntervalJoinOuter]]
    * under the driver gate: the LEFT OUTER stream-stream interval join
    * through a checkpointed sink — matched pairs emit on arrival,
    * unmatched sources emit null-extended once the watermark passes
    * their window (the reference's matched=0 XCM rows awaiting
    * xcmCleaner's sweep, xcmCleaner.js:1018). The sentinel pair on
    * BOTH sides (the global watermark is the min across sources)
    * closes every real source row's window before the drain ends, so
    * the read-back (sentinels filtered) is exactly the batch left
    * outer interval join. */
  private def st7(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_outer")
    // persisted: the frame feeds the max-ts agg and BOTH side writes —
    // three events scans otherwise
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .persist()
    val maxTs = ev.agg(max(col("ts"))).collect()(0)
      .getTimestamp(0).getTime
    val sideSchema = ev.drop("event_type").schema
    def side(name: String, typ: String): String = {
      val dir = s"$root/$name"
      landTimeOrdered(
        ev.filter(col("event_type") === typ).drop("event_type"), dir, 3)
      // A clears every real window (interval 6h + delay 2m); B forces
      // A's flush batch. Same ts on both sides: the global watermark
      // is the min, and the sentinels' own (-1, -1) match is filtered.
      def sentinel(offsetMs: Long) = org.apache.spark.sql.Row(
        -1L, -1L, new java.sql.Timestamp(maxTs + offsetMs))
      landSentinels(s, dir, sideSchema,
        Seq(sentinel(8L * 3600 * 1000), sentinel(16L * 3600 * 1000)))
      dir
    }
    val srcDir = side("src", "view")
    val dstDir = side("dst", "click")
    ev.unpersist()
    def rs(dir: String) = s.readStream.schema(sideSchema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = s"$root/out"
    drainToParquet(EventStream.streamIntervalJoinOuter(rs(srcDir),
        rs(dstDir), intervalSeconds = FixtureIntervalSec),
      out, s"$root/ckpt", "outer interval join stream")
    s.read.parquet(out)
      .filter(col("s_user") >= 0)
      .select(col("s_user").as("user_id"), col("s_event_id"),
        col("d_event_id"), us(col("s_ts")).as("s_us"),
        us(col("d_ts")).as("d_us"))
      .orderBy(col("user_id"), col("s_event_id"), col("d_event_id"))
  }

  private val st7Sql =
    s"""SELECT s.user_id AS user_id,
       | s.event_id AS s_event_id, d.event_id AS d_event_id,
       | epoch_us(CAST(s.ts AS TIMESTAMP)) AS s_us,
       | epoch_us(CAST(d.ts AS TIMESTAMP)) AS d_us
       |FROM (SELECT * FROM events WHERE event_type = 'view') s
       |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') d
       | ON s.user_id = d.user_id
       | AND epoch_us(CAST(d.ts AS TIMESTAMP))
       |  BETWEEN epoch_us(CAST(s.ts AS TIMESTAMP))
       |  AND epoch_us(CAST(s.ts AS TIMESTAMP))
       |   + ${FixtureIntervalSec}000000
       |ORDER BY user_id, s_event_id, d_event_id""".stripMargin

  /** ST7 variant (incremental funnel) — [[EventStream.funnelStream]]
    * under the driver gate: the per-user view→click→purchase repair
    * machinery runs across micro-batches in UPDATE mode (snapshots
    * appended through foreachBatch — the parquet sink itself is
    * append-only), and the read-back keeps each user's LATEST snapshot
    * (argmax seq; seq is strictly increasing per user, so no ties).
    * Why this is oracle-able: a user's final snapshot is computed from
    * their complete event set whatever the micro-batch split
    * (StreamingSpec pins stream ≡ batch funnelSteps), the time-ordered
    * landing means no late drops, and [[FixtureWatermarkDelay]] + a
    * 100-day retention keep every user's state alive for the whole
    * drain (no mid-drain eviction). Oracle: the per-user CTE of the
    * batch w9 funnel (ta = first view, tb = first qualifying click,
    * tc = first qualifying purchase, 7-day step windows).
    *
    * Fixture churn: the synthetic events table converts almost every
    * user end-to-end, so the interesting funnel lanes (stopped at
    * view, stopped at click) would ride on 1-2 accidental users — a
    * knife edge any testdata regeneration could erase. The fixture
    * therefore deterministically DROPS clicks for `user_id % 5 = 2`
    * and purchases for `user_id % 5 = 3` (both sides of the oracle,
    * input filter only — step semantics stay w9's), guaranteeing a
    * multi-user population at every funnel stage at every SF. */
  private def st8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val root = queryDumpDir("graft_stream_funnel")
    val landing = s"$root/landing"
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .filter(!(col("event_type") === "click" && col("user_id") % 5 === 2)
        && !(col("event_type") === "purchase" && col("user_id") % 5 === 3))
      .select(col("user_id"), col("event_type"), col("ts"),
        us(col("ts")).as("tus"))
    landTimeOrdered(ev, landing, 4)
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .select(col("user_id"), col("event_type"), col("tus"))
      .as[EventStream.FunnelEvent]
    val out = s"$root/out"
    drainUpdateAppend(EventStream.funnelStream(stream,
        watermarkDelay = FixtureWatermarkDelay,
        stateRetentionMs = 100L * 24 * 3600 * 1000)(s).toDF(),
      out, s"$root/ckpt", "funnel stream")
    val latest = Window.partitionBy(col("user_id"))
      .orderBy(col("seq").desc)
    s.read.parquet(out)
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ta"), col("tb"), col("tc"))
      .orderBy(col("user_id"))
  }

  // the per-user CTE of the batch w9 oracle (WindowOps.w9Sql) — same
  // step windows, same repair semantics, stopped before w9's final
  // corpus-level rollup so each user's (ta, tb, tc) is visible
  private val st8Sql =
    """WITH stepped AS (
      | SELECT user_id, event_type, tus,
      |  min(CASE WHEN event_type = 'view' THEN tus END)
      |    OVER (PARTITION BY user_id) AS ta
      | FROM (SELECT user_id, event_type,
      |   epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |   AND NOT (event_type = 'click' AND user_id % 5 = 2)
      |   AND NOT (event_type = 'purchase' AND user_id % 5 = 3))),
      |s2 AS (
      | SELECT *, min(CASE WHEN event_type = 'click' AND tus > ta
      |   AND tus <= ta + CAST(604800000000 AS BIGINT) THEN tus END)
      |   OVER (PARTITION BY user_id) AS tb
      | FROM stepped),
      |s3 AS (
      | SELECT *, min(CASE WHEN event_type = 'purchase' AND tus > tb
      |   AND tus <= tb + CAST(604800000000 AS BIGINT) THEN tus END)
      |   OVER (PARTITION BY user_id) AS tc
      | FROM s2)
      |SELECT user_id, min(ta) AS ta, min(tb) AS tb, min(tc) AS tc
      |FROM s3 GROUP BY 1
      |ORDER BY user_id""".stripMargin

  /** S10/ST3 — [[EventStream.jsonFileSource]] under the driver gate:
    * the NDJSON landing-directory ingest (the reference's sidecar-dump
    * → object-store landing → `bq load` flow, substrateetl.js
    * :6212-6216) streamed through a checkpointed parquet sink.
    * Determinism: the pipeline is STATELESS pass-through — the emitted
    * set is exactly the landed set under any micro-batch split — and
    * the JSON roundtrip is lossless (timestamps serialize at micros,
    * doubles at shortest-roundtrip repr), so the read-back is oracled
    * directly against the source table. What this gates cross-engine
    * that st1-st8 don't: the TEXT → typed-schema coercion of the
    * landing format itself (timestamp parse, double parse, nulls). */
  private def st9(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_json")
    val landing = s"$root/landing"
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts"))
    // Spark's default JSON timestampFormat truncates to millis on
    // write — pin a micros format on BOTH sides or ts_us loses the
    // sub-milli digits and the hash diverges
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.repartition(4).write.option("timestampFormat", tsFmt)
      .json(landing)
    val stream = EventStream.jsonFileSource(s, landing, ev.schema,
      maxFilesPerTrigger = 1,
      options = Map("timestampFormat" -> tsFmt))
    val out = s"$root/out"
    drainToParquet(stream, out, s"$root/ckpt", "json ingest stream")
    s.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), us(col("ts")).as("ts_us"))
      .orderBy(col("event_id"))
  }

  private val st9Sql =
    """SELECT event_id, user_id, event_type, value,
      | epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** ST1 (ranking face) — [[EventStream.dedupCandidates]] under the
    * driver gate: the batch finalized-preferred-latest pick over a
    * bronze candidate table (the silver compaction twin of st3's
    * streaming finality; ref crawler.js:1658-1669 losing-fork delete).
    * Fixture: candidates from `events` with SPARSE finality —
    * only `block_number % 3 != 0` groups carry a finalized row — so
    * BOTH branches of the (finalized DESC, ts DESC, hash) ordering are
    * exercised: 290/870 groups at sf0.001 pick latest-unfinalized, and
    * 85 groups hold a finalized row that is NOT the latest by ts
    * (StreamQueriesSpec pins both non-vacuous). Deterministic: hashes
    * are unique per candidate, so the ordering has no ties. */
  private def st10(s: SparkSession, d: String): DataFrame =
    EventStream.dedupCandidates(
        candidateFrame(s, d, sparseFinality = true))
      .select(col("chain_id"), col("block_number"), col("block_hash"),
        col("finalized"), us(col("ts")).as("ts_us"))
      .orderBy(col("chain_id"), col("block_number"))

  private val st10Sql =
    """WITH c AS (
      | SELECT CAST(user_id % 4 AS INT) AS chain_id,
      |  CAST(event_id % 499 AS BIGINT) AS block_number,
      |  '0x' || md5(CAST(user_id % 4 AS VARCHAR) || ':'
      |   || CAST(event_id % 499 AS VARCHAR) || ':'
      |   || CAST(event_id AS VARCHAR)) AS block_hash,
      |  (event_id = min(event_id) OVER (
      |    PARTITION BY user_id % 4, event_id % 499))
      |   AND (event_id % 499) % 3 <> 0 AS finalized,
      |  CAST(ts AS TIMESTAMP) AS tsm
      | FROM events),
      |r AS (
      | SELECT *, row_number() OVER (
      |   PARTITION BY chain_id, block_number
      |   ORDER BY finalized DESC, tsm DESC, block_hash) AS rn
      | FROM c)
      |SELECT chain_id, block_number, block_hash, finalized,
      | epoch_us(tsm) AS ts_us
      |FROM r WHERE rn = 1
      |ORDER BY chain_id, block_number""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_corpus_stream_dump" -> (st1 _),
    "st2_xcm_stream_match" -> (st2 _),
    "st3_finality_stream" -> (st3 _),
    "st4_windowed_stream" -> (st4 _),
    "st5_dedup_stream" -> (st5 _),
    "st6_session_stream" -> (st6 _),
    "st7_outer_stream" -> (st7 _),
    "st8_funnel_stream" -> (st8 _),
    "st9_json_ingest" -> (st9 _),
    "st10_candidate_pick" -> (st10 _))

  val oracles: Map[String, String] = Map(
    "st1_corpus_stream_dump" -> st1Sql,
    "st2_xcm_stream_match" -> st2Sql,
    "st3_finality_stream" -> st3Sql,
    "st4_windowed_stream" -> st4Sql,
    "st5_dedup_stream" -> st5Sql,
    "st6_session_stream" -> st6Sql,
    "st7_outer_stream" -> st7Sql,
    "st8_funnel_stream" -> st8Sql,
    "st9_json_ingest" -> st9Sql,
    "st10_candidate_pick" -> st10Sql)
}
