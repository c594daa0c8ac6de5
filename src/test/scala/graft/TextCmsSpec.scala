package graft

import graft.operators.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the count-min sketch (x21) beyond the DuckDB
  * oracle: the one-sided CMS guarantee (estimate ≥ exact count for
  * EVERY token, never under), and that the min-of-cells is doing real
  * work — a deliberately tiny sketch must overcount somewhere on a
  * colliding vocabulary, while the production 4×256 sketch keeps the
  * heavy hitters near-exact. */
class TextCmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rows(depth: Int, width: Int, k: Int) =
    TextOps.cmsEstimate(
      TextOps.tokenizedDocs(spark, SparkTestBase.sf), depth, width, k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("CMS never underestimates, at any sketch size") {
    for ((depth, width) <- Seq((4, 256), (2, 8), (1, 4))) {
      val out = rows(depth, width, 200)
      assert(out.nonEmpty)
      out.foreach { case (tok, n, est) =>
        assert(est >= n, s"($depth x $width) $tok: est $est < exact $n")
      }
    }
  }

  test("a tiny sketch overcounts; the production sketch stays tight") {
    // 1 row x 4 cells over a multi-hundred-token vocabulary MUST
    // collide: if every estimate still equalled its exact count the
    // "sketch" would not actually be aggregating through shared cells
    val tiny = rows(1, 4, 200)
    assert(tiny.exists { case (_, n, est) => est > n },
      "no collisions in a 4-cell sketch — cells are not shared")
    // production size: the top-10 heavy hitters are near-exact
    // (within 10% — the epsilon*N bound at width 256 on this corpus)
    val prod = rows(4, 256, 10)
    prod.foreach { case (tok, n, est) =>
      assert(est <= n + math.max(1L, n / 10),
        s"$tok: est $est far above exact $n at 4x256")
    }
  }
}
