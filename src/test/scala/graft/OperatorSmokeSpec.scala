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

  /** Queries allowed to surface DecimalType, if ever needed. Empty by
    * design: Spark DECIMAL and DuckDB DECIMAL hash differently at the
    * driver gate even when numerically equal (the j13/a8/v3 rule,
    * operators/package.scala `dsumOut`; re-hit by b9 in round 13).
    * Surface exact integers as STRING text, inexact sums as rounded
    * doubles — never a decimal. */
  private val decimalSurfaceAllowed: Set[String] = Set.empty

  private def hasDecimal(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case _: DecimalType => true
      case s: StructType  => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType   => hasDecimal(a.elementType)
      case m: MapType     => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _              => false
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and has stable schema") {
      val df = fn(spark, SparkTestBase.sf)
      assert(df.columns.nonEmpty)
      if (!decimalSurfaceAllowed(name)) {
        val decCols =
          df.schema.fields.collect { case f if hasDecimal(f.dataType) => f.name }
        assert(decCols.isEmpty,
          s"$name surfaces DecimalType column(s) ${decCols.mkString(", ")}: " +
            "decimals hash differently across engines at the driver gate " +
            "(j13/a8/v3 rule) — surface STRING text or a rounded double")
      }
      assert(df.count() >= 0)
    }
  }
}
