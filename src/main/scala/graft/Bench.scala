package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: one JSON line with per-query seconds.
  *
  * Credibility measures (the machine suffers multi-minute hypervisor
  * CPU-steal storms, docs/BENCH.md):
  *  - one shared session for all queries (no per-query JVM/session cost);
  *  - shuffle partitions sized to the input (a 25 MB scale factor does
  *    not need 32 shuffle tasks of scheduling overhead — partitions =
  *    clamp(inputBytes/64MB, 8, cpus));
  *  - 3 reps per query with PER-REP steal annotation: a rep that
  *    overlaps a steal storm is discarded, and the reported time is the
  *    min over storm-free reps (falling back to min-of-all, with the
  *    query listed in `stormy`, if every rep was hit).
  */
object Bench {

  private def stealTicks(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(0L)
      finally src.close()
    } catch { case _: Exception => 0L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    // input-adaptive shuffle sizing: tiny scale factors don't pay for
    // `cpus` shuffle tasks per stage
    val inputBytes =
      Option(new java.io.File(sfDir).listFiles()).map(_.map(_.length).sum)
        .getOrElse(0L)
    val parts = math.max(8L,
      math.min(cpus.toLong, inputBytes / (64L << 20) + 1)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    // JIT/codegen warmup outside the timed loop: touch the scan + agg +
    // shuffle paths once so the first measured query isn't charged for
    // JVM warmup.
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").count().count()
    Tables.events(spark, sfDir).select("ts").limit(1).count()
    val steal0 = stealTicks()
    val reps = 3
    // a rep is "stormy" if the steal counter moved more than this many
    // ticks while it ran (idle machines show ~0; storms show hundreds)
    val stormTicks = 20L
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val stormy = scala.collection.mutable.ArrayBuffer[String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      def rep(): (Double, Long) = {
        val s0 = stealTicks()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, stealTicks() - s0)
      }
      // a failing query is reported as -1, never as a fast "pass"
      val v = try {
        val rs = Seq.fill(reps)(rep())
        val clean = rs.filter(_._2 <= stormTicks)
        if (clean.isEmpty) { stormy += name; rs.map(_._1).min }
        else clean.map(_._1).min
      } catch {
        case e: Throwable =>
          errors(name) = e.getClass.getSimpleName
          -1.0
      }
      name -> v
    }
    val stealDelta = stealTicks() - steal0
    val total = results.values.filter(_ >= 0).sum
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
        .mkString(",\"errors\":{", ",", "}")
    val stormyJson =
      if (stormy.isEmpty) ""
      else stormy.map("\"" + _ + "\"").mkString(",\"stormy\":[", ",", "]")
    // Full-precision diagnostics FIRST (may exceed the harness's output
    // tail window), then the compact contract line LAST so it survives
    // tail truncation: the harness keeps only the final ~2000 bytes of
    // output, and sbt appends its own ~74-byte "[success]" trailer.
    val detailQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bench_detail","value":$total,"unit":"sec","queries":$detailQs,"sf":"$sfDir","runs_per_query":$reps,"shuffle_partitions":$parts,"steal_ticks":$stealDelta$stormyJson$errJson}""")
    // the contract line goes LAST; under sbt the only output after it
    // is sbt's own "[success]" trailer (a shutdown-hook re-print would
    // NOT land after the trailer — the forked JVM, hooks included,
    // exits before sbt prints it — and would race Spark's shutdown
    // hooks, so the 1900-byte budget below already accounts for the
    // trailer instead)
    println(renderContract(results.toSeq, total, sfDir))
    spark.stop()
  }

  /** The one-line JSON contract, sized to survive a 2000-byte output-tail
    * capture alongside sbt's ~75-byte "[success]" trailer (hard budget
    * ≈ 1925; we target ≤ 1900). The inventory outgrew full query names
    * at any numeric precision (84 names ≈ 1730 bytes before a single
    * digit), so the ladder falls back to the UNIQUE name-prefix keys the
    * inventory is built on ("a1", "j16b", "v5", … — uniqueness pinned by
    * BenchContractSpec); the line then carries full 2-decimal resolution
    * at ~950 bytes, and a "keys" marker says how to read it. Full names
    * with full precision stay on the bench_detail line.
    */
  def renderContract(results: Seq[(String, Double)], total: Double,
                     sfDir: String): String = {
    def render(dec: Int, sf: String, prefixKeys: Boolean): String = {
      def num(v: Double) =
        String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
      def key(k: String) = if (prefixKeys) k.split('_')(0) else k
      val qs = results.map { case (k, v) => "\"" + key(k) + "\":" + num(v) }
        .mkString("{", ",", "}")
      val note = if (prefixKeys) ""","keys":"query_name_prefix"""" else ""
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sf"$note}"""
    }
    val short = sfDir.split('/').filter(_.nonEmpty).lastOption
      .getOrElse(sfDir)
    Iterator((2, sfDir, false), (2, sfDir, true), (2, short, true),
      (1, short, true))
      .map { case (dec, sf, pk) => render(dec, sf, pk) }
      .find(_.length <= 1900)
      .getOrElse(render(1, short, prefixKeys = true))
  }
}
