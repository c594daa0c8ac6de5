package graft

import graft.operators.VectorOps
import org.scalatest.funsuite.AnyFunSuite

/** IVF blocking quality against exhaustive ground truth: v4 computes
  * ALL pairs ≥ threshold among vec_id < 500 (oracle-checked), so
  * restricting v5/v6 to the same id range gives exact precision/recall
  * for the blocked variants — and pins the multi-probe gain (v6 must
  * strictly beat single-probe v5 on recall, at perfect precision). */
class VectorRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def pairs(q: String): Set[(Long, Long)] =
    VectorOps.queries(q)(spark, SparkTestBase.sf)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 500 && b < 500 }
      .toSet

  test("IVF top-k search overlaps the exact top-k") {
    def topk(q: String): Map[Long, Seq[Long]] =
      VectorOps.queries(q)(spark, SparkTestBase.sf)
        .select("qid", "rn", "nid").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
        .toMap
    val exact = topk("v1_knn_bruteforce")
    val ivf = topk("v7_ivf_topk")
    assert(exact.keySet == ivf.keySet) // every query answered
    // mean overlap@5 — the standard ANN recall metric; the synthetic
    // near-orthogonal vectors are a hard case for coarse quantization,
    // so the bar is a sanity floor, not a production SLA
    val overlap = exact.keys.toSeq.map { q =>
      exact(q).toSet.intersect(ivf(q).toSet).size / 5.0
    }
    val mean = overlap.sum / overlap.size
    assert(mean >= 0.2, s"mean overlap@5 = $mean")
    assert(ivf.values.forall(_.size == 5)) // probed cells always fill k
  }

  test("blocked search precision is 1.0 and multi-probe beats single") {
    val truth = pairs("v4_embedding_neardup")
    val single = pairs("v5_ivf_blocked_neardup")
    val multi = pairs("v6_ivf_multiprobe")
    assert(truth.nonEmpty)
    // precision: a blocked variant can only emit true pairs (exact
    // verify runs in-query) — any false positive is a bug
    assert(single.subsetOf(truth) && multi.subsetOf(truth))
    // recall: multi-probe strictly dominates single-probe
    assert(single.subsetOf(multi))
    assert(multi.size > single.size,
      s"multi-probe gained nothing: ${multi.size} vs ${single.size}")
  }

  test("exact re-rank of the ADC shortlist dominates raw ADC order") {
    def topk(q: String): Map[Long, Seq[Long]] =
      VectorOps.queries(q)(spark, SparkTestBase.sf)
        .select("qid", "rn", "nid").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
        .toMap
    // v1 answers a wider query set (qid < 10) than the PQ tier
    // (qid < 5) — compare over the PQ queries only
    val rer = topk("v19_adc_rerank")
    val exact = topk("v1_knn_bruteforce") // exact cosine top-5
      .view.filterKeys(rer.keySet).toMap
    val adc = topk("v10_pq_adc_topk").view.mapValues(_.take(5)).toMap
    assert(rer.keySet.nonEmpty && rer.keySet == exact.keySet)
    def recall(m: Map[Long, Seq[Long]]): Double = {
      val per = exact.keys.toSeq.map { q =>
        exact(q).toSet.intersect(m.getOrElse(q, Nil).toSet).size / 5.0
      }
      per.sum / per.size
    }
    val (rAdc, rRer) = (recall(adc), recall(rer))
    // re-ranking a 20-deep shortlist with the exact kernel can only
    // fix ADC ordering errors, never introduce them — recall must not
    // drop, and on this corpus it strictly improves
    assert(rRer >= rAdc, s"re-rank recall $rRer < ADC recall $rAdc")
    assert(rRer > 0.3, s"re-rank recall@5 = $rRer")
    assert(rer.values.forall(_.size == 5))
  }

  test("MIPS order equals norm-augmented cosine order (the scale path)") {
    import org.apache.spark.sql.functions._
    // the v20 doc claim: x' = [x, sqrt(M^2 - |x|^2)], q' = [q, 0] turns
    // MIPS into cosine search — cos(q', x') = q.x / (|q| M) is monotone
    // in the dot product, so ranking by either is identical
    val vecs = Tables.embeddings(spark, SparkTestBase.sf)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    val m2 = vecs.values.map(x => dot(x, x)).max
    for (q <- vecs.keys.filter(_ < 10)) {
      val qv = vecs(q)
      val others = (vecs - q).toSeq
      val byDot = others.sortBy { case (id, x) => (-dot(qv, x), id) }
        .map(_._1).take(5)
      val qn = math.sqrt(dot(qv, qv))
      val byAug = others.sortBy { case (id, x) =>
        // augmented cosine: [q,0] . [x, sqrt(M^2-|x|^2)] / (|q| M)
        (-(dot(qv, x) / (qn * math.sqrt(m2))), id)
      }.map(_._1).take(5)
      assert(byDot === byAug, s"query $q")
    }
    // and the v20 query itself serves the byDot order
    val served = VectorOps.queries("v20_mips_topk")(spark, SparkTestBase.sf)
      .select("qid", "rn", "nid").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    for ((q, ids) <- served) {
      val qv = vecs(q)
      val byDot = (vecs - q).toSeq
        .sortBy { case (id, x) =>
          (-java.math.BigDecimal.valueOf(dot(qv, x))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue(), id)
        }.map(_._1).take(5)
      assert(ids === byDot, s"query $q served order")
    }
  }
}
