package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for the sketch-quantile scale path: x8's
  * approx_percentile answers must sit close to x7's exact rank-selection
  * answers on the same table. With accuracy 1000 and per-source groups
  * of ~25-250 docs the sketch is near-exact; the tolerance below allows
  * one rank of drift at the observed length spread.
  */
class TextPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("x8 sketch quantiles track x7 exact quantiles per source") {
    val exact = SparkEntry.queries("x7_length_quantiles")(
      spark, SparkTestBase.sf)
      .select("source", "median_chars", "p90_chars").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("x8_approx_quantiles")(
      spark, SparkTestBase.sf)
      .select("source", "median_chars", "p90_chars").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    assert(exact.nonEmpty)
    exact.foreach { case (src, (medEx, p90Ex)) =>
      val (medAp, p90Ap) = approx(src)
      // exact median may interpolate between two ranks; the sketch
      // returns an observed value — allow the neighboring-rank gap
      assert(math.abs(medAp - medEx) <= 25.0,
        s"$src median: sketch $medAp vs exact $medEx")
      assert(math.abs(p90Ap - p90Ex) <= 25L,
        s"$src p90: sketch $p90Ap vs exact $p90Ex")
    }
  }

  test("scrub redacts planted emails/URLs/blocklist terms") {
    // the synthetic corpus has no emails/URLs (x10's blocklist term is
    // what the oracle exercises), so the email/URL paths are pinned here
    // on planted strings
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "Contact bob1@example.com or see https://docs.example.org/a_b now",
      "the customer met a supplier yesterday",
      "nothing sensitive here").toDF("text")
      .select(graft.operators.TextOps.scrub(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(rows(0) == "contact <EMAIL> or see <URL> now")
    assert(rows(1) == "the <ENTITY> met a <ENTITY> yesterday")
    assert(rows(2) == "nothing sensitive here")
  }
}
