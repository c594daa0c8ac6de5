package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only the last ~2000 bytes of bench output, and sbt
  * appends a ~74-byte "[success] Total time: …" trailer after our JSON.
  * The contract line must therefore stay under 1900 bytes for the FULL
  * query inventory, or the driver records `parsed: null` (rounds 1-2 both
  * lost their bench numbers this way).
  */
class BenchContractSpec extends AnyFunSuite {

  test("contract line fits the 2000-byte tail for the full inventory") {
    // worst-plausible widths: every query slow (3-digit seconds), negative
    // error sentinel mixed in
    val results = SparkEntry.queries.keys.toSeq.zipWithIndex.map {
      case (name, i) => name -> (if (i % 7 == 0) -1.0 else 123.456789)
    }
    val line = Bench.renderContract(results, 9876.543,
      "/root/testdata/sf0.1")
    // hard budget: 2000-byte tail − 74-byte sbt trailer − 2 newlines
    // ≈ 1925; assert against the renderer's 1920 target
    assert(line.length <= 1920,
      s"contract line is ${line.length} bytes; tail window is 2000 minus " +
        "sbt trailer")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(!line.contains("\n"))
  }

  test("contract line is valid JSON shape with per-query numbers") {
    val line = Bench.renderContract(
      Seq("q1_agg" -> 0.123456, "j16_asof_join" -> 12.5), 12.623456,
      "/root/testdata/sf0.01")
    assert(line.contains(""""q1_agg":0.12"""))
    assert(line.contains(""""j16_asof_join":12.50"""))
    assert(line.contains(""""unit":"sec""""))
    assert(line.contains(""""sf":"/root/testdata/sf0.01""""))
  }
}
