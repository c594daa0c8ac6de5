package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: restrict to named queries (local dev loop);
    // the driver's 2-arg form dumps the full inventory
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // rows-only manifest: every query WITHOUT an oracle, with the reason
    // it is untestable in DuckDB — so `no_oracle` reads as a deliberate
    // scope decision, not an untested query.
    // exactly the SparkEntry.rowsOnly set (OperatorSmokeSpec pins the
    // equality); d3/d4/v8 graduated to the oracle gate in round 9 when
    // their hash families moved to the md5-based cross-engine form
    val rowsOnlyWhy = Map(
      "a16b_approx_distinct" ->
        "HLL sketch: Spark and DuckDB approx algorithms differ by design; exact twin a16 and deterministic sketch twin a16c are oracle-checked",
      "x8_approx_quantiles" ->
        "approx_percentile sketch internals are engine-specific; deterministic twin x18 is oracle-checked and TextPropertySpec bounds x8 against the exact x7 answers")
    val manifest = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
      .toSeq.sorted
      .map(k => s"${q(k)}: ${q(rowsOnlyWhy.getOrElse(k, "no DuckDB twin"))}")
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/rows_only_manifest.json"), manifest)
    spark.stop()
  }
}
