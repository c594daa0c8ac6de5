package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-edge pins for the round-18 latest-wins rewrites (w7/k4/k5 moved
  * row_number windows to max_by aggregations; p6 collapsed a two-scan
  * join to one distinct-agg; x15 derives corpus stats from its tf
  * frame). Each rewrite's equivalence argument leans on an input
  * invariant the generator happens to satisfy — these tests pin BOTH
  * sides: the max_by shape stays equivalent to the window shape even
  * when the invariant breaks (null timestamps), and the generated
  * tables actually satisfy the invariants the remaining shapes assume.
  */
class LatestWinsNullSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("max_by over struct(ts, id) equals the row_number rank-1 pick " +
      "even with null and all-null timestamps") {
    // groups: g1 mixed null/non-null ts, g2 all-null ts (tie-break on
    // id alone), g3 plain latest-wins, g4 ts tie broken by id
    val rows = Seq(
      ("g1", Some(10L), 1L, "a"), ("g1", None, 9L, "b"),
      ("g1", Some(20L), 2L, "c"),
      ("g2", None, 3L, "d"), ("g2", None, 7L, "e"),
      ("g3", Some(5L), 4L, "f"), ("g3", Some(6L), 5L, "g"),
      ("g4", Some(8L), 6L, "h"), ("g4", Some(8L), 8L, "i"))
      .toDF("k", "ts", "id", "v")
    val viaMaxBy = rows.groupBy($"k")
      .agg(max_by($"v", struct($"ts", $"id")).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val w = Window.partitionBy($"k").orderBy($"ts".desc, $"id".desc)
    val viaWindow = rows.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"k", $"v")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaMaxBy == viaWindow,
      "the argmax aggregation and the rank-1 window must pick the " +
        "same row on every null shape, or the w7/k4/k5 rewrites drift")
    assert(viaMaxBy == Set(("g1", "c"), ("g2", "e"), ("g3", "g"),
      ("g4", "i")))
  }

  test("generated tables satisfy the non-null invariants the one-pass " +
      "rewrites assume (events keys, document text)") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
    val nulls = e.select(
      count(when($"event_type".isNull, 1)).as("et"),
      count(when($"ts".isNull, 1)).as("ts"),
      count(when($"event_id".isNull, 1)).as("id"),
      count(when($"user_id".isNull, 1)).as("uid"),
      count(when($"value".isNull, 1)).as("v")).collect()(0)
    assert((0 until 5).forall(nulls.getLong(_) == 0L),
      s"events carries nulls ($nulls) — p6's isnotnull pin and the " +
        "max_by tie-break arguments need re-checking")
    // x15 derives n_docs/avg_len from its tf frame on the invariant
    // that every document tokenizes to >= 1 token (split('') = [''],
    // so only a NULL text row could vanish from the explode)
    val docs = Tables.documents(spark, d)
    assert(docs.filter($"text".isNull).count() == 0L,
      "documents.text carries NULLs — x15's tf-derived corpus stats " +
        "would drop those docs and drift from the oracle's count(*)")
  }
}
