package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query timer for optimization work: run ONLY the named
  * queries (3 reps each, min reported) under the same session/config
  * as [[Bench]], so a single line can be measured in seconds instead
  * of a full 170-line bench run. Usage:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   tools/dev.sh graft.BenchOne g2_pagerank g3_triangles
  * }}}
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <query_name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the one shared session + warmup (Bench owns both) — byte-identical
    // config with the full run, so focused numbers are comparable
    val spark = Bench.benchSession(sfDir, cpus)
    Bench.warmup(spark, sfDir)
    args.foreach { name =>
      // stage lines ("stage:dump_day") run their warm function — the
      // storm-prone long stages are exactly what needs focused
      // re-measurement; a stage memoizes, so only rep 1 is the number
      val stage = Bench.stages.find(_._1 == name)
      val run: () => Unit = stage match {
        case Some((_, f)) => () => f(spark, sfDir)
        case None =>
          val fn = SparkEntry.queries.getOrElse(name,
            sys.error(s"unknown query $name"))
          () => fn(spark, sfDir).count(): Unit
      }
      val isStage = stage.isDefined
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      // stages split two ways: MEMOIZED ones (lsh_pairs, cc labels)
      // only work on rep 1 — their min is a memo hit in milliseconds —
      // while re-running ones (dump_day) warm up across reps; print
      // first AND min for stages so neither reading misleads
      val headline =
        if (isStage) f"first ${reps.head}%.3f s  min ${reps.min}%.3f s"
        else f"min ${reps.min}%.3f s"
      println(f"$name%s: $headline  reps ${
        reps.map(r => f"$r%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
