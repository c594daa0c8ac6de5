package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the native bottom-k-by-hash sketch aggregate
  * (plans/BottomKByHash) — the determinism claims that let a16c/x18
  * sit under the cross-engine hash gate:
  *  - the result equals the in-process reference "k smallest distinct
  *    hashes, smallest carried value per hash";
  *  - the result is invariant to partitioning (merge order);
  *  - a group with fewer than k distinct hashes returns all of them;
  *  - the serialize/deserialize image round-trips.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = Tables.configure(SparkTestBase.spark)

  private val k = 8
  // 200 rows over 60 distinct hashes, with deliberate h collisions
  // carrying different values (the tie-break case)
  private val rows: Seq[(Long, Double)] =
    (0 until 200).map { i =>
      val h = ((i * 2654435761L) % 60 + 7) // collisions by construction
      (h, (i % 13).toDouble)
    }

  private def reference: Seq[(Long, Double)] =
    rows.groupBy(_._1).map { case (h, vs) => (h, vs.map(_._2).min) }
      .toSeq.sortBy(_._1).take(k)

  private def run(parts: Int): Seq[(Long, Double)] = {
    val s = spark
    import s.implicits._
    rows.toDF("h", "v").repartition(parts)
      .agg(expr(s"bottom_k_hv(h, v, $k)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.h"), col("e.v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("matches the in-process reference (distinct-h bottom-k, min-v)") {
    assert(run(4) == reference)
  }

  test("partitioning-invariant: 1 vs 7 partitions bit-equal") {
    assert(run(1) == run(7))
  }

  test("under-full group returns every distinct hash") {
    val s = spark
    import s.implicits._
    val got = Seq((5L, 1.0), (3L, 2.0), (5L, 0.5), (9L, 4.0))
      .toDF("h", "v")
      .agg(expr("bottom_k_hv(h, v, 100)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.h"), col("e.v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((3L, 2.0), (5L, 0.5), (9L, 4.0)))
  }

  test("serialize/deserialize round-trips the buffer") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = graft.plans.BottomKByHash(Literal(0L), Literal(0.0), 4)
    val buf = agg.createAggregationBuffer()
    Seq((9L, 1.0), (2L, 3.0), (7L, 0.5), (11L, 9.0))
      .foreach { case (h, v) => buf.put(h, v) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
