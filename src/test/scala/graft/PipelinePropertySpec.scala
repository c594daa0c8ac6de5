package graft

import graft.operators.{DedupOps, PipelineOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic ground truth for the dataset-assembly operators. The DuckDB
  * oracle proves Spark and DuckDB agree; these specs prove the operators
  * DO the thing they claim — a planted contaminated document is caught,
  * split membership survives repartitioning, proportions land near the
  * cut points (the round-2 lesson: engine agreement alone can't see a
  * semantically wrong candidate policy).
  */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("decontamination catches a planted near-copy and spares the rest") {
    val docs = Seq(
      // doc 0 = the "benchmark" doc
      (0L, "eval", "alpha beta gamma delta epsilon zeta eta theta"),
      // doc 1 copies a 6-word benchmark span inside fresh text → ≥2
      // shared 3-shingles → contaminated
      (1L, "web", "intro words alpha beta gamma delta epsilon zeta closing"),
      // doc 2 shares vocabulary but no 3-word span in benchmark ORDER
      (2L, "web", "epsilon delta gamma beta alpha zeta reversed span here"),
      // doc 3 entirely unrelated
      (3L, "web", "completely different tokens about other topics entirely")
    ).toDF("doc_id", "source", "text")
    val pairs = DedupOps.contaminatedPairs(
      DedupOps.shingles3(docs), col("doc_id") === 0L, minShared = 2)
      .select(col("tid"), col("eid"), col("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(_._1).toSet == Set(1L), s"got $pairs")
    assert(pairs.head._2 == 0L)
    assert(pairs.head._3 >= 2)
  }

  test("concat-chunk packing tiles each source stream exactly") {
    val out = PipelineOps.queries("s6_concat_chunk")(
      spark, SparkTestBase.sf)
      .select("source", "doc_id", "start_off", "n_tokens",
        "chunk_first", "chunk_last", "n_chunks")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._2)
      // spans PARTITION the stream: contiguous, gap-free, from zero
      assert(sorted.head._3 == 0L, s"$src stream must start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 + a._4 == b._3,
            s"$src: doc ${b._2} must start where doc ${a._2} ends")
        case _ =>
      }
      // chunk ids are the exact 512-token tiling of each span
      sorted.foreach { case (_, id, start, n, cf, cl, nc) =>
        assert(cf == start / 512 && cl == (start + n - 1) / 512,
          s"doc $id chunk bounds")
        assert(nc == cl - cf + 1 && nc >= 1, s"doc $id chunk count")
      }
    }
  }

  test("hash split is invariant under repartitioning and re-runs") {
    val docs = Tables.documents(spark, SparkTestBase.sf)
    val once = PipelineOps.withSplit(docs, col("text"))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val again = PipelineOps.withSplit(docs.repartition(7), col("text"))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(once == again)
    assert(once.nonEmpty)
  }

  test("split proportions land near the 80/10/10 cut points") {
    val counts = PipelineOps.withSplit(
      Tables.documents(spark, SparkTestBase.sf), col("text"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") / n > 0.70 && counts("train") / n < 0.90)
    assert(counts("val") / n > 0.03 && counts("val") / n < 0.20)
    assert(counts("test") / n > 0.03 && counts("test") / n < 0.20)
  }

  test("priority sample: replay-idempotent, weight-aware, estimator-sane") {
    val out = PipelineOps.queries("s8_priority_sample")(
      spark, SparkTestBase.sf)
      .select("rk", "doc_id", "n_chars", "priority", "est_weight")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 20)
    // rank order IS priority order (desc), and every per-doc estimator
    // contribution is >= the doc's own weight (max(w, tau) >= w)
    assert(out.sortBy(_._1).map(_._4).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true })
    out.foreach { case (_, _, w, _, est) => assert(est >= w.toDouble) }
    // the DLT subset-sum estimate over the WHOLE population
    // (sum of max(w, tau) over the sample) should land within a loose
    // band of the true total weight — one draw, k=20, so only a
    // sanity band, but it catches a broken priority formula outright
    val truth = Tables.documents(spark, SparkTestBase.sf)
      .agg(sum(col("n_chars"))).collect().head.getLong(0).toDouble
    val est = out.map(_._5).sum
    assert(est > truth / 5 && est < truth * 5,
      s"estimate $est vs truth $truth")
    // replay-idempotence: the same sampler over a REPARTITIONED input
    // yields the identical sample (no RNG state, no partition
    // sensitivity in the top-(k+1) path)
    val again = PipelineOps.prioritySample(
      Tables.documents(spark, SparkTestBase.sf).repartition(7), 20)
      .select("rk", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }

  test("priority sample of a small population is the whole population") {
    import spark.implicits._
    val tiny = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("doc_id", "source", "n_chars")
    val out = PipelineOps.prioritySample(tiny, 20)
      .select("doc_id", "n_chars", "est_weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // n <= k: tau = 0, every doc sampled, est_weight = its own weight
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    out.foreach { case (_, w, est) => assert(est == w.toDouble) }
  }

  test("curation pipeline drops duplicates and junk, keeps the rest") {
    val rich = (1 to 120).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (10L, "a", rich),            // rich unique doc — survives
      (11L, "a", rich),            // exact duplicate — deduped away
      (12L, "b", "the the the the the the the the") // junk — filtered
    ).toDF("doc_id", "source", "text")
    // run the same chain s9 composes, on a planted corpus: dedup
    // window → token stats → quality threshold → split
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text")).orderBy(col("doc_id"))
    val kept = docs.withColumn("rn",
      org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
    assert(kept.count() == 2) // dup collapsed, junk still present here
    // ...and the quality stage then drops the junk but keeps the rich
    // doc — the filter semantics, not just the dedup, on planted data
    val surviving = graft.operators.TextOps.withTokenStats(kept)
      .withColumn("quality", graft.operators.TextOps.qualityCol)
      .filter(col("quality") >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving == Set(10L), s"survivors $surviving")
    val out = PipelineOps.queries("s9_curation_e2e")(
      spark, SparkTestBase.sf).collect()
    // on the real corpus: splits partition the surviving docs and the
    // accounting is internally consistent
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      assert(r.getDouble(3) >= 0.5 * r.getLong(1),
        "every surviving doc scored >= 0.5")
    }
  }

  test("exact duplicates always land in the same split") {
    val dup = Seq(
      (1L, "a", "same text body here"),
      (2L, "b", "same text body here"),
      (3L, "c", "other text body here")
    ).toDF("doc_id", "source", "text")
    val bySplit = PipelineOps.withSplit(dup, col("text"))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(bySplit(1L) == bySplit(2L))
  }

  test("next-fit packing matches a sequential replay; bins are tight") {
    import org.apache.spark.sql.functions._
    val C = 512
    // sequential replay of the bucket-local next-fit recurrence
    val docs = Tables.documents(spark, SparkTestBase.sf)
      .filter(trim(col("text")) =!= "")
      .select(col("source"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    val want = docs.groupBy(d => (d._1, d._2 / 1024)).toSeq
      .map { case ((src, _), ds) =>
        var bins = 0L; var fill = 0L
        for ((_, _, n) <- ds.sortBy(_._2)) {
          if (n > C) { bins += (n + C - 1) / C; fill = 0 }
          else if (fill > 0 && fill + n <= C) fill += n
          else { bins += 1; fill = n }
        }
        (src, ds.size.toLong, ds.map(_._3).sum, bins)
      }
      .groupBy(_._1).map { case (src, rows) =>
        src -> ((rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum))
      }
    val got = PipelineOps.queries("s10_doc_pack")(spark, SparkTestBase.sf)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === want.keySet)
    for ((src, (nd, tk, bins)) <- want) {
      val (gnd, gtk, gbins, util) = got(src)
      assert((gnd, gtk, gbins) === ((nd, tk, bins)), s"source $src")
      // a bin never exceeds capacity -> utilization <= 1; and next-fit
      // cannot use fewer bins than the fractional lower bound
      assert(util <= 1.0 + 1e-9)
      assert(gbins >= (tk + C - 1) / C, s"source $src below LP bound")
    }
  }
}
