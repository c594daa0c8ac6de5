package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-installable entry point: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` has the native
  * functions and the as-of planner strategy from the first query,
  * with no library register call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject functions and the as-of strategy") {
    SparkTestBase.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the existing SparkContext. `spark.sql.extensions` is a
      // STATIC conf read off the SparkContext at creation, so on a
      // shared test context the builder's public withExtensions hook
      // exercises the same entry-point class the conf would load.
      val s2 = SparkSession.builder()
        .withExtensions(ext => new GraftExtensions().apply(ext))
        .getOrCreate()
      assert(s2.sql("SELECT compact_decode('0x04') AS v")
        .collect()(0).getDouble(0) == 1.0)
      assert(s2.sql(
        """SELECT cosine_sim(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>),
          |                  CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS c"""
          .stripMargin).collect()(0).getDouble(0) == 1.0)
      assert(s2.sql(
        """SELECT dot_product(CAST(array(2.0, 3.0) AS ARRAY<FLOAT>),
          |                   CAST(array(4.0, 5.0) AS ARRAY<FLOAT>)) AS d"""
          .stripMargin).collect()(0).getDouble(0) == 23.0)
      assert(s2.sql(
        """SELECT bottom_k_hv(h, v, 2) AS sk FROM VALUES
          | (CAST(9 AS BIGINT), 1.0), (CAST(2 AS BIGINT), 3.0),
          | (CAST(7 AS BIGINT), 0.5) AS t(h, v)""".stripMargin)
        .selectExpr("transform(sk, x -> x.h) AS hs")
        .collect()(0).getSeq[Long](0) == Seq(2L, 7L))
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.AsOfStrategy),
        "as-of strategy not injected")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
