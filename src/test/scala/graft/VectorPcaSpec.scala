package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the PCA trainer (v16/v18) and projector (v17)
  * beyond the DuckDB oracle: the oracle proves Spark ≡ DuckDB, these
  * specs prove the model is the thing it claims — the size-dispatched
  * driver path and the forced-distributed moments path agree
  * bit-for-bit (exact-decimal moments are associative, so the
  * dispatch cap can never change the model), the trained directions
  * are unit-norm approximate eigenvectors with λ₁ ≥ λ₂ and near-zero
  * mutual overlap (deflation works), λ₁ beats every coordinate axis,
  * and the centered projections sum to ~zero. */
class VectorPcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val driver = VectorOps.runPca(spark, SparkTestBase.sf)
  private lazy val dist =
    VectorOps.runPca(spark, SparkTestBase.sf, cap = 0L)

  test("driver and forced-distributed paths train the identical model") {
    val (mu1, c1) = driver
    val (mu2, c2) = dist
    assert(mu1.toSeq == mu2.toSeq)
    assert(c1.length == c2.length && c1.length == 2)
    c1.zip(c2).foreach { case ((w1, l1), (w2, l2)) =>
      assert(w1.toSeq == w2.toSeq)
      assert(l1 == l2)
    }
  }

  test("components are unit-norm, variance-ordered, near-orthogonal") {
    val (_, comps) = driver
    val Seq((w1, l1), (w2, l2)) = comps.toSeq
    comps.foreach { case (w, l) =>
      val n2 = w.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-12, s"|w|^2 = $n2")
      assert(l > 0.0)
    }
    assert(l1 >= l2, s"lambda1 $l1 < lambda2 $l2")
    val overlap = math.abs(w1.zip(w2).map { case (a, b) => a * b }.sum)
    assert(overlap < 1e-6, s"w1.w2 = $overlap")
  }

  test("first component is an approximate top eigenvector: residual " +
    "small, variance beats every coordinate axis") {
    val (mu, comps) = driver
    val (w, lambda) = comps.head
    // rebuild the covariance the trainer saw, from the same corpus
    val vecs = Tables.embeddings(spark, SparkTestBase.sf)
      .filter(col("embedding").isNotNull)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val n = vecs.length
    val d = mu.length
    val c = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      var s = 0.0
      vecs.foreach(v => s += v(i).toDouble * v(j).toDouble)
      val v = s / n - mu(i) * mu(j)
      c(i)(j) = v; c(j)(i) = v
    }
    // Rayleigh quotient of the trained direction beats every axis —
    // the power iteration must have moved well past any single
    // coordinate's variance
    val maxDiag = (0 until d).map(i => c(i)(i)).max
    assert(lambda >= maxDiag - 1e-9,
      s"lambda $lambda < max axis variance $maxDiag")
    // eigen-residual ||Cw - lambda w|| relatively small after 24 rounds
    val cw = Array.tabulate(d) { i =>
      (0 until d).map(j => c(i)(j) * w(j)).sum
    }
    val res = math.sqrt(
      (0 until d).map(i => math.pow(cw(i) - lambda * w(i), 2)).sum)
    assert(res < 0.1 * lambda, s"residual $res vs lambda $lambda")
  }

  test("centered projections sum to ~zero across the corpus") {
    VectorOps.resetPca()
    val mass = VectorOps.queries("v17_pca_project")(
      spark, SparkTestBase.sf)
      .agg(sum(col("score_mass"))).collect().head.getDouble(0)
    // sum over ALL vectors of (x - mu)·w is exactly 0 in real
    // arithmetic; here each score is rounded to 6 decimals first, so
    // the tolerance is n × 5e-7 plus float slack
    val n = Tables.embeddings(spark, SparkTestBase.sf)
      .filter(col("embedding").isNotNull).count()
    assert(math.abs(mass) <= n * 5e-7 + 1e-3,
      s"score mass $mass over $n vectors")
  }
}
