package graft

import graft.operators.WindowOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed corners for the funnel step semantics (w9) — strict
  * ordering, the 7-day step window, and null cascade — plus the cohort
  * offset arithmetic (a18).
  */
class FunnelCohortSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val H = 3600000000L // 1 hour in micros
  private val D = 24 * H

  test("funnel steps: strict order, step window, null cascade") {
    val ev = Seq(
      // user 1: click at the SAME instant as the view must not count
      // (strictly after); the later click does; purchase lands 8 days
      // after that click -> outside the step window -> null
      (1L, "view", 10 * H), (1L, "click", 10 * H),
      (1L, "click", 11 * H), (1L, "purchase", 11 * H + 8 * D),
      // user 2: click BEFORE the first view never counts; purchase
      // without a qualifying click stays null (cascade)
      (2L, "click", 9 * H), (2L, "view", 10 * H), (2L, "purchase", 12 * H),
      // user 3: full conversion; the SECOND click is earlier-in-window
      // and must win the min
      (3L, "view", 0L), (3L, "click", 5 * H), (3L, "click", 2 * H),
      (3L, "purchase", 6 * H),
      // user 4: no view at all -> every step null
      (4L, "click", 1 * H), (4L, "purchase", 2 * H)
    ).toDF("user_id", "event_type", "tus")

    val got = WindowOps.funnelSteps(ev, Seq("view", "click", "purchase"))
      .collect().map { r =>
        r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      }.toMap

    assert(got(1L) === ((Some(10 * H), Some(11 * H), None)))
    assert(got(2L) === ((Some(10 * H), None, None)))
    assert(got(3L) === ((Some(0L), Some(2 * H), Some(6 * H))))
    assert(got(4L) === ((None, None, None)))
  }

  test("funnel steps are parallelism-independent") {
    val ev = (0 until 500).map { i =>
      ((i % 20).toLong,
        Seq("view", "click", "purchase", "error")(i % 4),
        (i * 37 % 97) * H)
    }.toDF("user_id", "event_type", "tus")
    def run(parts: Int) =
      WindowOps.funnelSteps(ev.repartition(parts),
        Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(run(1) === run(11))
  }

  test("cohort offset arithmetic: week div is floor on positives") {
    // the a18 week key is epoch-micros div 7d: two timestamps 6.9 days
    // apart can share a week, two 0.2 days apart can split one
    val wk = 604800000000L
    val rows = Seq(
      (1L, 0L), (1L, wk - 1), // same week 0
      (2L, wk - 1), (2L, wk + 1) // weeks 0 and 1 -> offset 1 retained
    ).toDF("user_id", "tus")
      .select(col("user_id"), expr(s"tus div $wk").as("week"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val got = rows.withColumn("cohort", min(col("week")).over(w))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("off"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, 0L) -> 2L, (0L, 1L) -> 1L))
  }
}
