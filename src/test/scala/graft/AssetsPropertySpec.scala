package graft

import graft.etl.Assets
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the v1→v2 interior-key conversion: the Column
  * string-splice must equal a JVM reference implementation that does
  * what the reference INTENDS (paraTool.js:1345 — parse the v1 key,
  * build the network element, JSON-splice; the reference's own
  * function dead-ends on a typeof bug, so the doc examples at
  * :1342-1344 are the contract) via real JSON parse → prepend →
  * re-stringify over randomly generated interiors. Catches any
  * splice-vs-parse divergence (spacing, nesting, escaping) the golden
  * vectors are too few to hit.
  */
class AssetsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The intended conversion, via a real JSON round trip. */
  private def reference(v1: String): String = {
    val idx = v1.indexOf('~')
    if (idx < 0) return null
    val interior = v1.substring(0, idx)
    val relay = v1.substring(idx + 1)
    val arr = mapper.createArrayNode()
    val net = mapper.createObjectNode()
    if (relay == "polkadot" || relay == "kusama")
      net.put("network", relay)
    else net.put("named",
      "0x" + relay.getBytes("UTF-8").map("%02x".format(_)).mkString)
    arr.add(net)
    if (interior == "here") arr.add("here")
    else {
      val parsed = mapper.readTree(interior)
      if (parsed.isArray) parsed.forEach(n => { arr.add(n); () })
      else arr.add(parsed)
    }
    mapper.writeValueAsString(arr)
  }

  // compact-JSON junction generators (registry keys are
  // JSON.stringify output: no whitespace)
  private val genJunction: Gen[String] = Gen.oneOf(
    Gen.choose(0, 4000).map(p => s"""{"parachain":$p}"""),
    Gen.choose(0, 200).map(i => s"""{"palletInstance":$i}"""),
    Gen.choose(0L, 1L << 40).map(i => s"""{"generalIndex":$i}"""),
    Gen.listOfN(20, Gen.choose(0, 255))
      .map(bs => "0x" + bs.map("%02x".format(_)).mkString)
      .map(h => s"""{"generalKey":"$h"}"""),
    Gen.const(""""here""""))

  private val genInterior: Gen[String] = Gen.oneOf(
    Gen.const("here"),
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, genJunction).map(_.mkString("[", ",", "]"))),
    genJunction.suchThat(_ != "\"here\"")) // single-object push branch

  private val genRelay: Gen[String] = Gen.oneOf(
    "polkadot", "kusama", "enjin", "moonriver", "rococo-v2")

  test("interiorKeyV2 == JSON-parse reference over random keys") {
    val keys = for {
      i <- genInterior
      r <- genRelay
    } yield s"$i~$r"
    val prop = Prop.forAllNoShrink(Gen.listOfN(40, keys)) { ks =>
      val got = ks.toDF("k")
        .select(Assets.interiorKeyV2(col("k")).as("v2"))
        .collect().map(_.getAs[String]("v2")).toSeq
      val want = ks.map(reference)
      got == want
    }
    // fixed seed — deterministic cases, not per-run exploration
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25)
        .withInitialSeed(org.scalacheck.rng.Seed(20260815L)), prop)
    assert(res.passed, res.status.toString)
  }
}
