package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for a training-data pipeline: deterministic
  * train/val/test splitting and deterministic global shuffling. Both are
  * pure functions of the data (md5 of a stable key), so any re-run — any
  * partitioning, any cluster — reproduces the same assignment, and the
  * DuckDB oracle can verify the exact split.
  *
  * Scale notes:
  *  - The split is a per-row expression + a tiny aggregate: no shuffle of
  *    the text, no sampling state, no RNG seeds to coordinate across
  *    executors. This is how production corpora pin membership (hash of
  *    content/id against fixed hex cut points), because `rand()`-based
  *    sampling is irreproducible under retries and repartitioning.
  *  - The shuffle-order query is top-k by hash: TakeOrderedAndProject
  *    (per-partition heaps + driver merge of k rows), never a global
  *    sort. A full training-epoch shuffle at 100 TB is the same idea as
  *    a total-order sort by the hash key: range-partition on skey then
  *    sort within partitions.
  */
object PipelineOps {

  // S1 — deterministic corpus split on md5(text): first hex byte against
  // fixed cut points — 'cc' = 204/256 ≈ 79.7 % train, 'e6' = 26/256
  // ≈ 10.2 % val, rest test. Content-hash (not id-hash) keys mean exact
  // duplicates land in the SAME split — no train/test leakage via dups.
  /** The deterministic split assignment as a reusable projection: a pure
    * function of the keyed column, so membership is invariant under
    * repartitioning, retries, and re-runs (PipelinePropertySpec pins
    * this, plus the ~80/10/10 proportions). */
  def withSplit(df: DataFrame, keyed: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("split",
      when(substring(md5(keyed), 1, 2) < "cc", "train")
        .when(substring(md5(keyed), 1, 2) < "e6", "val")
        .otherwise("test"))

  private def s1(s: SparkSession, d: String): DataFrame =
    withSplit(Tables.documents(s, d), col("text"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))

  /** Oracle twin of [[withSplit]]'s CASE — shared by s1 and s9. */
  private[operators] val sqlSplitCase =
    """CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
      |      WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
      |      ELSE 'test' END""".stripMargin

  private val s1Sql =
    s"""SELECT source,
       | $sqlSplitCase AS split,
       | count(*) AS n_docs, ${sqlLsum("n_chars")} AS sum_chars
       |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  // S7 — stratified exact-quota sampling: exactly N docs per source,
  // membership by hashed rank (md5 of the id, no RNG state) — the
  // fixed-size eval-set extraction a corpus pipeline runs per release.
  // Replay-idempotent: any re-run, any partitioning reproduces the
  // same sample. One row_number window per source stratum — a single
  // hash shuffle on source; at extreme stratum sizes the same quota is
  // computable with a two-pass rank-threshold refinement, but the
  // window form is the plan Spark executes well into the billions of
  // rows per stratum.
  private def s7(s: SparkSession, d: String): DataFrame = {
    val n = 10
    val w = Window.partitionBy(col("source"))
      .orderBy(col("skey"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        md5(concat(lit("ss:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("source"), col("rk"), col("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  private val s7Sql =
    """SELECT source, rk, doc_id FROM (
      | SELECT source, doc_id, row_number() OVER (
      |  PARTITION BY source
      |  ORDER BY md5('ss:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      | FROM documents)
      |WHERE rk <= 10 ORDER BY source, rk""".stripMargin

  // S2 — deterministic global shuffle order (epoch shuffling without
  // RNG): order by md5("shuf:" || doc_id), take the head. The limit
  // compiles to TakeOrderedAndProject; the rank is re-derived over the
  // 20 surviving rows so the ORDER itself is oracle-verified, not just
  // the membership.
  private def s2(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("skey"))
      .orderBy(col("skey"), col("doc_id"))
      .limit(20)
    keyed.withColumn("rn",
      row_number().over(Window.orderBy(col("skey"), col("doc_id"))))
      .select(col("rn"), col("doc_id"), col("skey"))
  }

  private val s2Sql =
    """SELECT row_number() OVER (ORDER BY skey, doc_id) AS rn, doc_id, skey
      |FROM (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS skey
      |  FROM documents ORDER BY skey, doc_id LIMIT 20)""".stripMargin

  // S3 — training-mix weights: per-source sampling rates that equalize
  // the token contribution of every source (the data-mixing step before
  // a training run). target = total/|sources|; weight = min(1,
  // target/source_tokens) — oversampling is disallowed, undersized
  // sources keep weight 1. One aggregate + a broadcast single-row
  // totals join; the weights then drive the deterministic s1-style
  // hash sampling.
  private def s3(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .withColumn("n_tokens",
        size(expr("split(trim(text), '\\\\s+')")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("source_tokens"))
    val totals = perSource.agg(
      sum(col("source_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("target",
        col("total_tokens").cast("double") / col("n_sources"))
      .select(col("source"), col("n_docs"), col("source_tokens"),
        round(least(lit(1.0),
          col("target") / col("source_tokens").cast("double")), 6)
          .as("weight"),
        floor(col("source_tokens").cast("double") *
          least(lit(1.0),
            col("target") / col("source_tokens").cast("double")))
          .cast("long").as("expected_tokens"))
      .orderBy(col("source"))
  }

  private val s3Sql =
    s"""WITH per_source AS (
       | SELECT source, count(*) AS n_docs,
       |  ${sqlLsum("len(string_split_regex(trim(text), '\\s+'))")} AS source_tokens
       | FROM documents GROUP BY source),
       |totals AS (SELECT CAST(sum(source_tokens) AS DOUBLE) AS total_tokens,
       |  count(*) AS n_sources FROM per_source)
       |SELECT source, n_docs, source_tokens,
       | round(least(1.0, (total_tokens / n_sources)
       |   / CAST(source_tokens AS DOUBLE)), 6) AS weight,
       | CAST(floor(CAST(source_tokens AS DOUBLE) * least(1.0,
       |   (total_tokens / n_sources) / CAST(source_tokens AS DOUBLE)))
       |  AS BIGINT) AS expected_tokens
       |FROM per_source CROSS JOIN totals
       |ORDER BY source""".stripMargin

  // S4 — temperature-scaled mixture sampling: source probability
  // ∝ tokens^τ with τ = 0.5 (√-scaling upweights small sources — the
  // standard multinomial-temperature data-mixing move for multilingual /
  // multi-source corpora). sqrt is IEEE correctly-rounded in BOTH
  // engines (unlike pow), and the normalizer sums the per-source sqrt
  // terms through DECIMAL(38,12) so the result is independent of
  // partition/summation order — same determinism contract as every
  // money sum in this repo.
  private def s4(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .withColumn("n_tokens",
        size(expr("split(trim(text), '\\\\s+')")).cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("source_tokens"))
      .withColumn("w", sqrt(col("source_tokens").cast("double")))
    val totals = perSource.agg(
      decOut(sum(dec12(col("w")))).as("sum_w"),
      sum(col("source_tokens")).as("total_tokens"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("temp_prob",
        round(col("w") / col("sum_w").cast("double"), 6))
      .select(col("source"), col("source_tokens"), col("temp_prob"),
        floor(col("total_tokens").cast("double") *
          (col("w") / col("sum_w").cast("double"))).cast("long")
          .as("effective_tokens"))
      .orderBy(col("source"))
  }

  private val s4Sql =
    s"""WITH per_source AS (
       | SELECT source,
       |  ${sqlLsum("len(string_split_regex(trim(text), '\\s+'))")} AS source_tokens
       | FROM documents GROUP BY source),
       |scaled AS (SELECT source, source_tokens,
       |  sqrt(CAST(source_tokens AS DOUBLE)) AS w FROM per_source),
       |totals AS (SELECT
       |  ${sqlDecOut("sum(CAST(w AS DECIMAL(38,12)))")} AS sum_w,
       |  sum(source_tokens) AS total_tokens FROM scaled)
       |SELECT source, source_tokens,
       | round(w / CAST(sum_w AS DOUBLE), 6) AS temp_prob,
       | CAST(floor(CAST(total_tokens AS DOUBLE)
       |   * (w / CAST(sum_w AS DOUBLE))) AS BIGINT) AS effective_tokens
       |FROM scaled CROSS JOIN totals
       |ORDER BY source""".stripMargin

  // S5 — quality-weighted deterministic resampling: acceptance rate ∝
  // lexical richness (distinct-word count, capped at 1.0 by 80 words),
  // membership decided by an id-keyed md5 uniform — the rejection-
  // sampling mix step a pipeline runs AFTER quality scoring, with
  // s1's replay-idempotence contract (re-runs and late data keep the
  // same docs; no RNG state anywhere). Both sides of the accept
  // comparison are IEEE doubles derived identically in both engines:
  // uniform = first-8-hex-digits / 2³², rate = distinct/80. Pure
  // per-row expressions + one aggregate — nothing shuffles but the
  // per-source rollup.
  private def s5(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("tk", expr("split(trim(text), '\\\\s+')"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
      .withColumn("rate", least(lit(1.0),
        size(array_distinct(col("tk"))).cast("double") / 80.0))
      .withColumn("u",
        conv(substring(md5(concat(lit("qr:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0)
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("u") < col("rate"), col("n_tokens"))
          .otherwise(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  private val s5Sql =
    s"""WITH d AS (
       | SELECT source,
       |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |  least(1.0, CAST(len(list_distinct(
       |    string_split_regex(trim(text), '\\s+'))) AS DOUBLE) / 80.0)
       |    AS rate,
       |  CAST(CAST('0x' || substr(md5('qr:' || CAST(doc_id AS VARCHAR)),
       |    1, 8) AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
       | FROM documents)
       |SELECT source, count(*) AS n_docs,
       | ${sqlLsum("CASE WHEN u < rate THEN 1 ELSE 0 END")} AS n_kept,
       | ${sqlLsum("CASE WHEN u < rate THEN n_tokens ELSE 0 END")} AS kept_tokens
       |FROM d GROUP BY source ORDER BY source""".stripMargin

  // S6 — concat-and-chunk sequence packing: the step that turns a
  // tokenized corpus into fixed-length training contexts. Documents
  // concatenate in deterministic (source, doc_id) order into one token
  // stream per source; each doc's span [start_off, start_off+n_tokens)
  // maps to the context windows (size 512 here) it lands in — the
  // doc→chunk index a packing dataloader materializes up front.
  //
  // Scale shape: ONE window (running sum of token counts) partitioned
  // by source — the same per-key cumulative pattern as w2/q9, no
  // global ordering. At 100 TB the stream is per (source, shard) and
  // shard base offsets stitch with one tiny per-shard-totals broadcast
  // (the gapIslands boundary-stitch trick); chunk ids are pure integer
  // arithmetic on the offsets, so packing never touches the text.
  private def s6(s: SparkSession, d: String): DataFrame = {
    val chunk = 512
    // ROWS frame pinned explicitly: the default RANGE frame would sum
    // over order-by peers, breaking the tiling on tied doc_ids
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      // empty/whitespace docs contribute no tokens — split("") yields
      // [""] (size 1) on BOTH engines, a phantom token that would shift
      // every later doc's offsets, so they are excluded from the index
      .filter(trim(col("text")) =!= "")
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long")
          .as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      // integer division (`div`) keeps both engines in exact int math
      .withColumn("chunk_first", expr(s"start_off div $chunk"))
      .withColumn("chunk_last", expr(s"(end_off - 1) div $chunk"))
      .withColumn("n_chunks",
        col("chunk_last") - col("chunk_first") + lit(1L))
      .select(col("source"), col("doc_id"), col("start_off"),
        col("n_tokens"), col("chunk_first"), col("chunk_last"),
        col("n_chunks"))
      .orderBy(col("source"), col("doc_id"))
  }

  private val s6Sql =
    """WITH t AS (
      | SELECT source, doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |   AS n_tokens
      | FROM documents WHERE trim(text) <> ''),
      |c AS (
      | SELECT source, doc_id, n_tokens,
      |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |   AS end_off
      | FROM t)
      |SELECT source, doc_id, end_off - n_tokens AS start_off, n_tokens,
      | (end_off - n_tokens) // 512 AS chunk_first,
      | (end_off - 1) // 512 AS chunk_last,
      | (end_off - 1) // 512 - (end_off - n_tokens) // 512 + 1
      |  AS n_chunks
      |FROM c ORDER BY source, doc_id""".stripMargin

  // S8 — weighted sampling WITHOUT replacement via priority sampling
  // (Duffield–Lund–Thorup, JACM 2007): each doc draws priority
  // q = w/u with u an id-keyed md5 uniform; the global top-k by q IS
  // the sample, and max(w, τ) — τ the (k+1)-th priority — is the
  // unbiased per-doc contribution for estimating any subset's total
  // weight from the sample alone. Chosen over Efraimidis–Espirakis
  // (key u^(1/w)) deliberately: ES needs pow/log, transcendentals
  // whose last ulp varies between libm builds, while the DLT priority
  // is a single IEEE division of exactly-representable operands
  // (w an integer; u = (v+1)/2^48 with v a 48-bit md5 prefix — a
  // power-of-two denominator, so u is exact) — both engines round it
  // identically, no output rounding needed. No RNG state: the sample
  // is replay-idempotent under re-runs/repartitioning like s1/s5/s7.
  // Plan shape: per-row projection → global top-(k+1) compiles to
  // TakeOrderedAndProject (per-partition heaps, no full sort); the
  // re-rank + τ broadcast run on k+1 rows.
  private val S8K = 20

  /** Core sampler over any (doc_id, source, n_chars) frame — exposed
    * so PipelinePropertySpec can drive it over a REPARTITIONED input
    * and a small population. When the population has ≤ k rows there
    * is no (k+1)-th priority: τ defaults to 0 (the DLT convention —
    * the sample is the whole population and est_weight = w), via the
    * always-one-row `max` aggregate instead of a vanishing filter. */
  private[graft] def prioritySample(docs: DataFrame, k: Int): DataFrame = {
    val top = docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("n_chars").cast("double") /
          ((conv(substring(md5(concat(lit("ps:"),
            col("doc_id").cast("string"))), 1, 12), 16, 10)
            .cast("long") + lit(1L)).cast("double") / 281474976710656.0))
          .as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k + 1)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("priority").desc, col("doc_id"))))
    val tau = top.filter(col("rk") === k + 1)
      .agg(coalesce(max(col("priority")), lit(0.0)).as("tau"))
    top.filter(col("rk") <= k)
      .crossJoin(broadcast(tau))
      .select(col("rk"), col("doc_id"), col("source"), col("n_chars"),
        col("priority"),
        greatest(col("n_chars").cast("double"), col("tau"))
          .as("est_weight"))
      .orderBy(col("rk"))
  }

  private def s8(s: SparkSession, d: String): DataFrame =
    prioritySample(Tables.documents(s, d), S8K)

  private val s8Sql =
    s"""WITH keyed AS (
       | SELECT doc_id, source, n_chars,
       |  CAST(n_chars AS DOUBLE) /
       |   (CAST(CAST('0x' || substr(md5('ps:' || CAST(doc_id AS VARCHAR)),
       |      1, 12) AS BIGINT) + 1 AS DOUBLE) / 281474976710656.0)
       |   AS priority
       | FROM documents),
       |top AS (
       | SELECT doc_id, source, n_chars, priority,
       |  row_number() OVER (ORDER BY priority DESC, doc_id) AS rk
       | FROM keyed ORDER BY priority DESC, doc_id LIMIT ${S8K + 1}),
       |tau AS (SELECT coalesce(max(priority), CAST(0.0 AS DOUBLE))
       |  AS tau FROM top WHERE rk = ${S8K + 1})
       |SELECT rk, doc_id, source, n_chars, priority,
       | greatest(CAST(n_chars AS DOUBLE), tau) AS est_weight
       |FROM top CROSS JOIN tau WHERE rk <= $S8K ORDER BY rk""".stripMargin

  // S9 — the END-TO-END curation pipeline as ONE composed program:
  // exact dedup (keep the min-id copy per text) → quality filter (the
  // x2 heuristic, threshold 0.5 on the rounded score) → deterministic
  // train/val/test split (the s1 content-hash rule) → per-split
  // corpus accounting. This is the query a user of the library
  // actually ships — the individual operators composed, not demoed —
  // and the whole chain stays one declarative plan: a single text-key
  // shuffle for the dedup window, codegen'd per-row quality/split
  // expressions, one final rollup. Oracle = the same chain in SQL.
  private def s9(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    val kept = Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val scored = TextOps.withTokenStats(kept)
      .withColumn("quality", TextOps.qualityCol)
      .filter(col("quality") >= 0.5)
    withSplit(scored, col("text"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        decOut(sum(dec6(col("quality")))).as("quality_mass"))
      .orderBy(col("split"))
  }

  private val s9Sql =
    s"""WITH kept AS (
       | SELECT doc_id, source, text FROM (
       |  SELECT doc_id, source, text,
       |   row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |  FROM documents) WHERE rn = 1),
       |scored AS (
       | SELECT text,
       |  CAST(n_tokens AS BIGINT) AS n_tokens_l,
       |  ${TextOps.sqlQualityExpr} AS quality
       | FROM (SELECT text,
       |  ${TextOps.sqlTokenStatsCols}
       |  FROM kept)),
       |split_assigned AS (
       | SELECT $sqlSplitCase AS split,
       |  n_tokens_l, quality
       | FROM scored WHERE quality >= 0.5)
       |SELECT split, count(*) AS n_docs,
       | ${sqlLsum("n_tokens_l")} AS sum_tokens,
       | ${sqlDecOut("sum(CAST(quality AS DECIMAL(38,6)))")}
       |  AS quality_mass
       |FROM split_assigned GROUP BY split ORDER BY split""".stripMargin

  // S10 — next-fit document packing: the don't-split-documents variant
  // of s6's concat-and-chunk. Docs fill a 512-token context until the
  // next doc would overflow, then a new bin opens; docs longer than one
  // context get chunked alone (ceil(n/C) bins, last partial closed).
  // The recurrence is sequential, so it runs bucket-locally: docs pack
  // within (source, 1024-doc bucket) — exactly what a distributed
  // packer does (each worker packs its shard; bins never straddle
  // workers) — which bounds the fold state no matter the corpus size.
  // The whole (bins, fill) state encodes into ONE long (bins*1024 +
  // fill, fill < 1024), so Spark's `aggregate` fold and DuckDB's
  // `list_reduce` replay the identical integer recurrence.
  private def s10(s: SparkSession, d: String): DataFrame = {
    val C = 512
    val packed = Tables.documents(s, d)
      .filter(trim(col("text")) =!= "")
      .select(col("source"), col("doc_id"),
        expr("doc_id div 1024").as("bkt"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .groupBy(col("source"), col("bkt"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n"))))
        .as("ds"), sum(col("n")).as("tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("st", expr(
        s"""aggregate(transform(ds, e -> e.n), 0L, (s, n) ->
           |  CASE WHEN n > $C THEN (s div 1024 + (n + ${C - 1}) div $C)
           |                        * 1024
           |       WHEN s % 1024 > 0 AND s % 1024 + n <= $C THEN s + n
           |       ELSE (s div 1024 + 1) * 1024 + n END)""".stripMargin))
      .withColumn("bins", expr("st div 1024"))
    packed.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("tokens")).as("tokens"),
        sum(col("bins")).as("bins"))
      .withColumn("utilization", round(col("tokens").cast("double") /
        (col("bins") * C), 6))
      .orderBy(col("source"))
  }

  private val s10Sql = {
    val C = 512
    s"""WITH docs AS (SELECT source, doc_id, doc_id // 1024 AS bkt,
       |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
       | FROM documents WHERE trim(text) <> ''),
       |bk AS (SELECT source, bkt,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list(n ORDER BY doc_id)),
       |    (s, n) -> CASE
       |      WHEN n > $C THEN (s // 1024 + (n + ${C - 1}) // $C) * 1024
       |      WHEN s % 1024 > 0 AND s % 1024 + n <= $C THEN s + n
       |      ELSE (s // 1024 + 1) * 1024 + n END) AS st,
       |  CAST(sum(n) AS BIGINT) AS tokens, count(*) AS n_docs
       | FROM docs GROUP BY 1, 2)
       |SELECT source, ${sqlLsum("n_docs")} AS n_docs,
       | ${sqlLsum("tokens")} AS tokens,
       | ${sqlLsum("st // 1024")} AS bins,
       | round(CAST(sum(tokens) AS DOUBLE) / (sum(st // 1024) * $C), 6)
       |   AS utilization
       |FROM bk GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s10_doc_pack" -> (s10 _),
    "s9_curation_e2e" -> (s9 _),
    "s8_priority_sample" -> (s8 _),
    "s6_concat_chunk" -> (s6 _),
    "s1_hash_split" -> (s1 _),
    "s2_shuffle_order" -> (s2 _),
    "s3_mix_weights" -> (s3 _),
    "s4_temperature_mix" -> (s4 _),
    "s5_quality_resample" -> (s5 _),
    "s7_stratified_sample" -> (s7 _),
  )

  val oracles: Map[String, String] = Map(
    "s9_curation_e2e" -> s9Sql,
    "s10_doc_pack" -> s10Sql,
    "s8_priority_sample" -> s8Sql,
    "s6_concat_chunk" -> s6Sql,
    "s1_hash_split" -> s1Sql,
    "s2_shuffle_order" -> s2Sql,
    "s3_mix_weights" -> s3Sql,
    "s4_temperature_mix" -> s4Sql,
    "s5_quality_resample" -> s5Sql,
    "s7_stratified_sample" -> s7Sql,
  )
}
