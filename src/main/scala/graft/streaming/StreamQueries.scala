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
    * per user, so the fixture widens to 6 h to exercise matches —
    * the state/eviction machinery is identical at any width. */
  private[graft] val St2IntervalSec = 21600L

  private def st2(s: SparkSession, d: String): DataFrame = {
    val root = queryDumpDir("graft_stream_xcm")
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
    def side(name: String, typ: String): String = {
      val dir = s"$root/$name"
      landTimeOrdered(
        ev.filter(col("event_type") === typ).drop("event_type"), dir, 3)
      dir
    }
    val srcDir = side("src", "view")
    val dstDir = side("dst", "click")
    val schema = ev.drop("event_type").schema
    def rs(dir: String) = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val out = s"$root/out"
    val q = EventStream.streamIntervalJoin(rs(srcDir), rs(dstDir),
        intervalSeconds = St2IntervalSec)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(300000),
      "stream-stream interval join timed out")
    finally q.stop()
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
       |   + ${St2IntervalSec}000000
       |ORDER BY user_id, s_event_id, d_event_id""".stripMargin

  /** ST1/ST5 — [[EventStream.finalizeStream]] (the reference's tip vs
    * finalized duality, crawler.js:1572-1669) under the driver gate.
    * The fixture derives a candidate stream from `events`: key =
    * (user_id%4, event_id%499), every event a fork candidate with its
    * own hash, EXACTLY ONE finalized per key (the min-event_id row —
    * event_ids are unique, so no ties), plus a VERBATIM duplicate of
    * each finalized row (the redundant-crawler re-delivery, ST5).
    * Why this is oracle-able: emission picks the first finalized
    * candidate in arrival order, which is only order-sensitive when a
    * key carries ≥2 DISTINCT finalized rows — one winner + identical
    * duplicates emit the same row under any arrival order and any
    * micro-batch split. The duplicates land as a SEPARATE
    * last-stamped file, so every key's re-delivery arrives in a LATER
    * micro-batch than its emission and is absorbed by the TOMBSTONE
    * branch, not by same-batch find — flatMapGroupsWithState does no
    * late-input filtering, so the month-old rows reach the state fn;
    * if the tombstone ever regressed to state.remove-after-emit, the
    * re-delivery would re-emit and the oracle would catch the
    * duplicate rows. (Re-emission via tombstone EVICTION needs the
    * 100-day retention to pass inside the fixture's one-month span —
    * it can't; the eviction/timeout lanes stay ScalaTest-pinned in
    * StreamingSpec where they belong.) Output: exactly one finalized
    * row per key, oracled by DuckDB's min-event_id winner pick. */
  private def st3(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val root = queryDumpDir("graft_stream_finality")
    val base = Tables.events(s, d).select(
      (col("user_id") % 4).cast("int").as("chain_id"),
      (col("event_id") % 499).as("block_number"),
      col("event_id"), col("ts"))
    val w = Window.partitionBy(col("chain_id"), col("block_number"))
    // persisted: the fixture frame feeds two writes (the candidate
    // landing and the duplicate re-delivery file) — without the pin
    // the events scan + window min would run twice
    val cand = base
      .withColumn("finalized",
        col("event_id") === min(col("event_id")).over(w))
      .withColumn("block_hash", concat(lit("0x"),
        md5(concat_ws(":", col("chain_id"), col("block_number"),
          col("event_id")).cast("binary"))))
      .select(col("chain_id"), col("block_number"), col("block_hash"),
        col("finalized"), col("ts"))
      .persist()
    val landing = s"$root/landing"
    landTimeOrdered(cand, landing, 4)
    // the ST5 redundant re-delivery: every finalized row again, in ONE
    // file stamped strictly AFTER the candidate files — so each key's
    // duplicate arrives in a micro-batch later than its emission and
    // must be absorbed by the tombstone, not by same-batch dedup
    val dupTmp = s"$root/dup"
    cand.filter(col("finalized")).coalesce(1).write.parquet(dupTmp)
    cand.unpersist()
    new java.io.File(dupTmp).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        val tgt = new java.io.File(landing, s"dup-$i.parquet")
        require(f.renameTo(tgt), s"could not move $f into the landing")
        require(tgt.setLastModified(1700000100000L + i * 1000L),
          s"could not stamp mod-time on $tgt")
      }
    val stream = s.readStream.schema(cand.schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .as[EventStream.Candidate]
    val out = s"$root/out"
    val q = EventStream.finalizeStream(stream,
        stateRetentionMs = 100L * 24 * 3600 * 1000)(s)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try require(q.awaitTermination(300000),
      "finality stream timed out")
    finally q.stop()
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_corpus_stream_dump" -> (st1 _),
    "st2_xcm_stream_match" -> (st2 _),
    "st3_finality_stream" -> (st3 _))

  val oracles: Map[String, String] = Map(
    "st1_corpus_stream_dump" -> st1Sql,
    "st2_xcm_stream_match" -> st2Sql,
    "st3_finality_stream" -> st3Sql)
}
