package graft

import org.scalatest.funsuite.AnyFunSuite

/** v11 k-means training + v12 trained-codebook serving are pinned to a
  * sequential reference that replicates the arithmetic contracts
  * exactly: the pinned cosine kernel (float64 index-order accumulation,
  * `dot / sqrt(na*nb)`, HALF_UP round-6, NaN-first/cell-asc candidate
  * order) and the DECIMAL(38,12) centroid sums — so the distributed
  * trainer must produce bit-identical centroids, and the trained-
  * assignment query bit-identical cell populations, at any
  * parallelism. */
class VectorKmeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val xi = a(i).toDouble; val yi = b(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / math.sqrt(na * nb)
  }
  private def r6(x: Double): Double =
    // same NaN/Inf guard as the production round6 kernel — a zero-norm
    // vector's NaN cosine must reach the NaN-first ordering branch, not
    // throw in BigDecimal.valueOf
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def loadVecs(): Array[(Long, Array[Float])] =
    spark.read
      .parquet(s"${SparkTestBase.sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Best cell under the kernel's ordering: rounded sim DESC with NaN
    * first, cell ASC. Returns (cell, rounded sim). */
  private def bestCell(cents: Seq[(Long, Array[Float])],
      v: Array[Float]): (Long, Double) = {
    val best = cents.map { case (cell, cv) =>
      val s = r6(cos(v, cv))
      val neg = if (s.isNaN) Double.NegativeInfinity else -s
      (neg, cell, s)
    }.min
    (best._2, best._3)
  }

  /** Sequential Lloyd reference: seed = vec_id < k, per-round exact
    * DECIMAL(38,12) sums then double mean, empty cells keep their
    * centroid. */
  private def refCentroids(vecs: Array[(Long, Array[Float])], k: Int,
      iters: Int): Seq[(Long, Array[Float])] = {
    var cents: Seq[(Long, Array[Float])] = vecs.filter(_._1 < k).toSeq
    for (_ <- 1 to iters) {
      val assigned = vecs.map { case (_, v) => (bestCell(cents, v)._1, v) }
      cents = cents.map { case (cell, old) =>
        val mine = assigned.filter(_._1 == cell).map(_._2)
        if (mine.isEmpty) (cell, old)
        else {
          val dim = old.length
          val nv = new Array[Float](dim)
          var j = 0
          while (j < dim) {
            var acc = java.math.BigDecimal.ZERO
            mine.foreach { v =>
              acc = acc.add(java.math.BigDecimal.valueOf(v(j).toDouble)
                .setScale(12, java.math.RoundingMode.HALF_UP))
            }
            nv(j) = (acc.doubleValue() / mine.length).toFloat
            j += 1
          }
          (cell, nv)
        }
      }
    }
    cents
  }

  test("distributed Lloyd rounds equal the sequential reference") {
    val vecs = loadVecs()
    val k = 8; val iters = 4
    val cents = refCentroids(vecs, k, iters)
    val expected = cents.flatMap { case (cell, cv) =>
      cv.zipWithIndex.map { case (x, i) => (cell, i, r6(x.toDouble)) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("v11_kmeans_train")(
      spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq
    assert(got == expected)
    // training actually moved the centroids off the seed init
    val init = vecs.filter(_._1 < k).flatMap { case (cell, cv) =>
      cv.zipWithIndex.map { case (x, i) => (cell, i, r6(x.toDouble)) }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got != init)
  }

  test("kmeans size dispatch: distributed and driver loops agree") {
    // crossing the dispatch threshold must never change centroids —
    // force the distributed rounds (cap 0) and compare bit-identical
    val s = SparkTestBase.spark
    val dist = operators.VectorOps.runKmeans(s, SparkTestBase.sf, 8, 4,
      cap = 0L)
    val drv = operators.VectorOps.runKmeans(s, SparkTestBase.sf, 8, 4)
    assert(dist.map(_._1).toSeq == drv.map(_._1).toSeq)
    assert(dist.zip(drv).forall { case ((_, a), (_, b)) =>
      a.sameElements(b) })
  }

  test("v12 trained assignment equals the sequential reference") {
    val vecs = loadVecs()
    val cents = refCentroids(vecs, k = 8, iters = 4)
    // reference per-cell rollup under the same arithmetic: count,
    // min/max vec_id, DECIMAL(38,6)-summed rounded sims (NaN -> 0)
    val expected = vecs
      .map { case (id, v) =>
        val (cell, sim) = bestCell(cents, v)
        (cell, id, if (sim.isNaN) 0.0 else sim)
      }
      .groupBy(_._1).toSeq
      .map { case (cell, rows) =>
        var acc = java.math.BigDecimal.ZERO
        rows.foreach { r =>
          acc = acc.add(java.math.BigDecimal.valueOf(r._3)
            .setScale(6, java.math.RoundingMode.HALF_UP))
        }
        val mass = java.math.BigDecimal.valueOf(acc.doubleValue())
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (cell, rows.length.toLong, rows.map(_._2).min,
          rows.map(_._2).max, mass)
      }.sortBy(_._1)
    val got = SparkEntry.queries("v12_trained_assign")(
      spark, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the trained assignment is a real partition: multiple cells used
    assert(got.map(_._2).sum == vecs.length && got.size > 1)
  }
}
