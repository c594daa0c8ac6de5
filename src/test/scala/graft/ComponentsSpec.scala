package graft

import graft.operators.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** Min-label-propagation connected components: chains (worst diameter),
  * disjoint clusters, self-contained convergence. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupOps.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint clusters + a chain resolve to min labels") {
    // cluster {1,2,3} (triangle), chain 10-11-12-13-14 (diameter 4),
    // isolated pair {100, 7}
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 10L), (11L, 12L), (13L, 12L), (13L, 14L),
      (100L, 7L))
    val out = comps(edges)
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(out(_) == 10L))
    assert(out(7L) == 7L && out(100L) == 7L)
    assert(out.size == 10)
  }

  test("small-graph union-find path equals the distributed loop") {
    // the existing cases all run the fast path (default edgeCap);
    // here both paths run on the SAME random graphs and must agree
    // exactly — the size dispatch may never change results
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val n = 5 + rnd.nextInt(40)
      val edges = Seq.fill(n)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val df = edges.toDF("a", "b")
      val fast = DedupOps.connectedComponents(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = DedupOps.connectedComponents(df, "a", "b", edgeCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"trial $trial: $edges")
    }
  }

  test("distributed loop handles the propagation-depth chain too") {
    // pin the loop itself (edgeCap = 0) on the worst-diameter shape
    val edges = (10L until 25L).map(i => (i + 1, i))
    val out = DedupOps.connectedComponents(edges.toDF("a", "b"),
      "a", "b", edgeCap = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 25L).forall(out(_) == 10L))
  }

  test("long chain with the min at the far end (propagation depth)") {
    // 50→49→…→1: the label 1 must walk the whole chain
    val edges = (1L until 50L).map(i => (i + 1, i))
    val out = comps(edges)
    assert(out.values.toSet == Set(1L))
    assert(out.size == 50)
  }

  test("duplicate and self edges are harmless") {
    val out = comps(Seq((5L, 6L), (6L, 5L), (5L, 5L), (5L, 6L)))
    assert(out == Map(5L -> 5L, 6L -> 5L))
  }
}
