package graft

import graft.decode.{AcalaParser, ChainParser, GenericParser}
import graft.etl.Writers
import org.scalatest.funsuite.AnyFunSuite

/** Writer semantics (S7 dynamic partition overwrite, S9 upsert) and the
  * per-chain parser dispatch seam (P13). */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dynamic partition overwrite replaces only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_s7").toString
    val day1 = Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"))
      .toDF("log_dt", "id", "v")
    Writers.overwritePartitions(day1, dir, Seq("log_dt"))
    // re-dump day 2 only, with different content (idempotent backfill)
    val day2 = Seq(("2024-01-02", 3L, "c"))
      .toDF("log_dt", "id", "v")
    Writers.overwritePartitions(day2, dir, Seq("log_dt"))
    // partition values come back type-inferred (DATE here) — compare as
    // strings
    val out = spark.read.parquet(dir).select("log_dt", "id")
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSet
    assert(out == Set(("2024-01-01", 1L), ("2024-01-02", 3L)))
  }

  test("upsert: updates win on key, inserts appended") {
    val base = Seq((1L, "old", 1L), (2L, "keep", 1L))
      .toDF("k", "v", "ver")
    val updates = Seq((1L, "new", 2L), (3L, "ins", 1L))
      .toDF("k", "v", "ver")
    val out = Writers.upsert(base, updates, Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("chain parser dispatch and specialization") {
    assert(ChainParser.forChain(0) == GenericParser(0))
    assert(ChainParser.forChain(2000) == AcalaParser(2000))
    assert(GenericParser(0).assetKey("DOT") == "DOT~0")
    assert(AcalaParser(2000).assetKey("ACA") == """{"Token":"ACA"}~2000""")
    assert(AcalaParser(2000).assetKey("""{"ForeignAsset":"0"}""") ==
      """{"ForeignAsset":"0"}~2000""")
    assert(GenericParser(0).transferKind("balances", "Transfer")
      .contains("native"))
    assert(GenericParser(0).transferKind("system", "Remarked").isEmpty)
    assert(GenericParser(0).suppressCall("timestamp", "set"))
  }
}
