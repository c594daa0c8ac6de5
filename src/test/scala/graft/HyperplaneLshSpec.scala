package graft

import graft.operators.VectorOps
import org.scalatest.funsuite.AnyFunSuite

/** Hyperplane-LSH blocking quality against exhaustive ground truth.
  *
  * The driver embeddings are near-orthogonal (max pairwise cosine
  * ≈ 0.51), which exercises the banding curve's weak tail; planted
  * near-duplicates (cosine ≥ 0.99) exercise the regime the blocker is
  * built for — there P[bit match] = 1 − θ/π ≈ 0.98 and 4 bands × 4 bits
  * collide with probability ≈ 1 − (1 − 0.98⁴)⁴ ≈ 0.999.
  */
class HyperplaneLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dim = 32
  private val rnd = new scala.util.Random(7L)

  private def unit(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  // 40 random base vectors + a jittered near-dup of each of the first
  // 10 (ids 100+i): cosine(base, dup) ≥ 0.99 by construction
  private lazy val fixture: Seq[(Long, Array[Float])] = {
    val bases = (0 until 40).map { i =>
      (i.toLong, unit(Array.fill(dim)(rnd.nextGaussian())))
    }
    val dups = bases.take(10).map { case (i, v) =>
      (100L + i, unit(v.map(x => x + 0.02 * rnd.nextGaussian())))
    }
    bases ++ dups
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = a.map(x => x.toDouble * x.toDouble).sum
    val nb = b.map(x => x.toDouble * x.toDouble).sum
    dot / math.sqrt(na * nb)
  }

  test("precision 1.0 and planted-near-dup recall >= 0.9") {
    val s = spark
    import s.implicits._
    val df = fixture.toDF("vid", "vec")
    val got = VectorOps
      .hyperplaneLshPairs(df, "vid", "vec", dim, threshold = 0.95)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = (for {
      (a, va) <- fixture; (b, vb) <- fixture
      if a < b && cos(va, vb) >= 0.95
    } yield (a, b)).toSet

    assert(truth.size >= 10, s"fixture planted ${truth.size} true pairs")
    // exact verify runs in-query: emitting a non-pair is a bug
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} planted pairs")
  }

  test("driver-table pairs are a subset of the exact v4 pairs") {
    val truth = VectorOps.queries("v4_embedding_neardup")(
      spark, SparkTestBase.sf)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = VectorOps.queries("v8_hyperplane_lsh")(spark, SparkTestBase.sf)
      .select("va", "vb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 500 && b < 500 }.toSet
    assert(got.subsetOf(truth))
    // NOT asserted: at the driver table's weak similarities (cosine
    // ~0.5) per-pair collision probability is only ~0.59, so emptiness
    // is a banding-curve coin flip, not a correctness signal — the hard
    // invariants are the subset check above and the planted-near-dup
    // recall test. Surface it as information only.
    if (got.isEmpty)
      info("LSH found none of the weak-similarity driver pairs " +
        "(legitimate at cosine ~0.5; recall is pinned by the planted test)")
  }
}
