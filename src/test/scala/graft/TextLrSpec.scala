package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the logistic-regression quality classifier
  * (x19/x20) beyond the DuckDB oracle: the size-dispatched driver
  * loop and the forced-distributed gradient passes train the
  * bit-identical model (exact-decimal gradient sums are associative),
  * training actually LEARNS (final Brier beats the w = 0 baseline of
  * exactly 0.25, where every prediction is the algebraic sigmoid's
  * 0.5), and served probabilities stay inside (0, 1). */
class TextLrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("driver and forced-distributed paths train the identical model") {
    val (w1, b1, n1) = TextOps.runLr(spark, SparkTestBase.sf)
    val (w2, b2, n2) = TextOps.runLr(spark, SparkTestBase.sf, cap = 0L)
    assert(w1.toSeq == w2.toSeq)
    assert(b1 == b2)
    assert(n1 == n2 && n1 > 0)
  }

  test("training reduces Brier below the all-0.5 baseline") {
    val (w, brier, _) = TextOps.runLr(spark, SparkTestBase.sf)
    // w = 0 predicts sigma(0) = 0.5 for every doc -> Brier exactly
    // 0.25 regardless of labels; 8 GD rounds must land strictly below
    assert(brier < 0.25, s"brier $brier")
    assert(w.exists(_ != 0.0))
  }

  test("served probabilities are valid and cover the corpus") {
    TextOps.resetLr()
    val out = TextOps.queries("x20_lr_score")(spark, SparkTestBase.sf)
      .select("n_docs", "n_pos", "min_p", "max_p").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getLong(0)).sum
    val corpus = Tables.documents(spark, SparkTestBase.sf).count()
    assert(total == corpus)
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
      assert(r.getDouble(2) > 0.0 && r.getDouble(3) < 1.0)
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }
}
