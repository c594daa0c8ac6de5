package graft

import graft.operators.Aggregates
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed gap detector (bucketed LAG + boundary stitch,
  * Aggregates.gapIslands) must agree exactly with the single-partition
  * global-window form it replaces — including gaps that span one or
  * more completely EMPTY buckets, the stitch's hard case. */
class GapIslandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def globalForm(keys: Seq[Long]) = {
    val w = Window.orderBy(col("k"))
    keys.toDF("k")
      .withColumn("prev_key", lag(col("k"), 1).over(w))
      .filter(col("prev_key").isNotNull && col("k") =!= col("prev_key") + 1)
      .select(col("prev_key"), col("k"),
        (col("k") - col("prev_key") - 1).as("gap_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  private def bucketedForm(keys: Seq[Long], bucket: Long) =
    Aggregates.gapIslands(keys.toDF("k"), "k", bucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("agrees with the global window: gaps within and across buckets") {
    // bucket size 10: intra-bucket gap (3→7), boundary gap (9→21 spans
    // the empty bucket [10,19]), multi-empty-bucket gap (22→57), and a
    // contiguous run that crosses a boundary with no gap (57→…→62).
    val keys = Seq[Long](1, 2, 3, 7, 8, 9, 21, 22, 57, 58, 59, 60, 61, 62)
    assert(bucketedForm(keys, 10L) == globalForm(keys))
    assert(bucketedForm(keys, 10L).nonEmpty)
  }

  test("no gaps → empty result") {
    val keys = (100L to 140L)
    assert(bucketedForm(keys, 8L) == Set.empty)
  }

  test("single row and single bucket degenerate cases") {
    assert(bucketedForm(Seq(5L), 10L) == Set.empty)
    val keys = Seq[Long](4, 6, 9)
    assert(bucketedForm(keys, 1000L) == globalForm(keys))
  }

  test("a14 query matches its previous global-window semantics at sf") {
    val d = SparkTestBase.sf
    val w = Window.orderBy(col("o_orderkey"))
    val expected = Tables.orders(spark, d)
      .select(col("o_orderkey"))
      .withColumn("prev_key", lag(col("o_orderkey"), 1).over(w))
      .filter(col("prev_key").isNotNull &&
        col("o_orderkey") =!= col("prev_key") + 1)
      .count()
    val got = Aggregates.queries("a14_gap_islands")(spark, d).count()
    assert(got == expected)
  }

  test("adversarially large keyspace: multi-level recursion equals global") {
    // Sparse keys across a ~2^40 keyspace with tiny limits force the
    // stitch through MANY recursion levels (grain 2^37 → 2^34 → … at
    // bucketSize 8) and through the non-broadcast join path — the shape
    // a 10^12-key production run takes. Planted contiguous runs provide
    // non-gap adjacencies that must survive every level.
    val rnd = new scala.util.Random(42)
    val sparse = Seq.fill(300)(math.abs(rnd.nextLong()) % (1L << 40))
    val runs = (1000000L to 1000020L) ++ ((1L << 39) to (1L << 39) + 10L)
    val all = (sparse ++ runs).distinct
    val got = Aggregates.gapIslands(all.toDF("k"), "k", 8L,
        windowGrainLimit = 16L, broadcastGrainLimit = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == globalForm(all))
    assert(got.nonEmpty)
  }

  test("recursion path with default limits and a wide keyspace") {
    // bucketSize 4 over keys up to ~8.4M → level-0 grain ~2.1M exceeds
    // the 1M window cap exactly once: one distributed level + one
    // bounded final window.
    val keys = (0L until 2000L).map(i => i * 4219L) :+ 8400000L
    val got = Aggregates.gapIslands(keys.toDF("k"), "k", 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == globalForm(keys))
  }

  test("empty input yields no gaps") {
    val empty = Seq.empty[Long]
    assert(bucketedForm(empty, 8L) == Set.empty)
  }

  test("plan has no full-data single-partition window") {
    // the only unpartitioned window allowed is over the per-bucket
    // rollup (one row per nonempty bucket), which sits above an Aggregate
    val df = Aggregates.gapIslands(
      (1L to 10000L).toDF("k").filter(col("k") % 97 =!= 0), "k", 256L)
    val plan = df.queryExecution.executedPlan.toString
    // the intra window must be partitioned by the bucket column
    assert(plan.contains("partitionBy") || plan.contains("bkt"))
  }
}
