package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage for the full query inventory: every SparkEntry query
  * runs on sf0.001 and returns a well-formed result (the value-level
  * check is the DuckDB oracle gate, mirrored locally by tools/check.py). */
class OperatorSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every query in the inventory has an oracle or is marked rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == SparkEntry.rowsOnly,
      s"unregistered rows-only queries: ${(noOracle -- SparkEntry.rowsOnly).toSeq.sorted.mkString(", ")}; " +
        s"stale manifest entries: ${(SparkEntry.rowsOnly -- noOracle).toSeq.sorted.mkString(", ")}")
  }

  test("every rows-only query exists in the inventory") {
    assert((SparkEntry.rowsOnly -- SparkEntry.queries.keySet).isEmpty)
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
