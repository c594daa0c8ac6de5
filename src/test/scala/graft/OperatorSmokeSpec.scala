package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the full query inventory: every SparkEntry query
  * runs on sf0.001 and returns a well-formed result (the value-level
  * check is the DuckDB oracle gate, mirrored locally by tools/check.py). */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every query in the inventory has an oracle or is marked rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // hash/sketch-family / stub queries are intentionally rows-only:
    assert(noOracle == Set("a16b_approx_distinct", "d3_minhash_lsh",
      "d4_simhash", "m2_media_decode_stub", "x8_approx_quantiles"))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and has stable schema") {
      val df = fn(spark, SparkTestBase.sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
