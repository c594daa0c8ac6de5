package graft

import graft.etl.Assets
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Assets — the assets/xcmassets dimension export. The oracle queries
  * (k15/k16) pin the write→read round trip cross-engine; this spec pins
  * the conversion golden vectors from the reference's own doc examples
  * (paraTool.js:1342-1344) and the lookup edge cases the 200-row query
  * frames average away: first-match reduction under a genuine
  * multi-match, source-containment matching, the no-match null, and the
  * relay-partition overwrite idempotence.
  */
class AssetsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("interiorKeyV2 golden vectors (paraTool.js:1342-1344)") {
    val in = Seq(
      // the function-head doc example, verbatim
      "[{\"parachain\":2000},{\"generalKey\":\"0x02f4c723e61709d90f899" +
        "39c1852f516e373d418a8\"}]~polkadot",
      "here~polkadot",          // "polkadot-here" doc example
      "here~enjin",             // named-network hex branch
      "{\"parachain\":2000}~kusama", // non-array push branch
      "malformed-no-separator", // decode, don't reject
      null
    ).toDF("k").select(Assets.interiorKeyV2(col("k")).as("v2"))
      .collect().map(_.getAs[String]("v2"))
    assert(in(0) == "[{\"network\":\"polkadot\"},{\"parachain\":2000}," +
      "{\"generalKey\":\"0x02f4c723e61709d90f89939c1852f516e373d418a8\"}]")
    assert(in(1) == "[{\"network\":\"polkadot\"},\"here\"]")
    // stringToHex("enjin") = 0x656e6a696e
    assert(in(2) == "[{\"named\":\"0x656e6a696e\"},\"here\"]")
    assert(in(3) == "[{\"network\":\"kusama\"},{\"parachain\":2000}]")
    assert(in(4) == null)
    assert(in(5) == null)
  }

  private val regCols = Seq("relay_chain", "xcm_interior_key", "para_id",
    "chain_name", "symbol", "decimals", "interior_type",
    "xcm_v1_multilocation_byte", "xcm_v1_multilocation",
    "xc_currency_id", "confidence", "source", "xc_contract_address")

  private def regRow(key: String, para: Int, symbol: String,
      source: Seq[Int], contract: Map[String, String] = Map.empty) =
    ("polkadot", key, para, s"chain$para", symbol, 10, "x1", "0x00",
      "{}", null: String, 1, source, contract)

  test("assets lookup: first-match, source containment, no-match null") {
    val reg = Seq(
      // two rows match (2000, GLMR): min v1 key must win
      regRow("[{\"parachain\":2000}]~polkadot", 2000, "GLMR", Seq(2000)),
      regRow("[{\"parachain\":1000}]~polkadot", 1000, "GLMR", Seq(2000)),
      // matches 2026 only through the source list
      regRow("here~polkadot", 999, "DOT", Seq(999, 2026)),
      // right symbol, wrong chain — must not match 2000
      regRow("[{\"parachain\":3000}]~polkadot", 3000, "USDT", Seq(3000)),
      // right chain, wrong relay — filtered out entirely
      ("kusama", "[{\"parachain\":2000}]~kusama", 2000, "chain2000",
        "KSM", 12, "x1", "0x00", "{}", null: String, 1, Seq(2000),
        Map.empty[String, String])
    ).toDF(regCols: _*)
    val ca = Seq(
      (2000, "moonbeam", "{\"Token\":\"GLMR\"}", "Glimmer", null: String,
        "GLMR", 18),
      (2026, "nodle", "{\"Token\":\"DOT\"}", "Polkadot", null: String,
        "DOT", 10),
      (2000, "moonbeam", "{\"Token\":\"KSM\"}", "Kusama", null: String,
        "KSM", 12)
    ).toDF("para_id", "chain_name", "asset", "name", "currency_id",
      "symbol", "decimals")
    val out = Assets.assets(ca, reg, "polkadot").collect()
      .map(r => r.getAs[String]("symbol") ->
        r.getAs[String]("xcm_interior_key")).toMap
    // lexicographic min of the two v1 keys is the parachain-1000 one
    assert(out("GLMR") ==
      "[{\"network\":\"polkadot\"},{\"parachain\":1000}]")
    assert(out("DOT") == "[{\"network\":\"polkadot\"},\"here\"]")
    assert(out("KSM") == null)
  }

  test("build→publish chain: GarRegistry.buildXcmAssets feeds the export") {
    // the reference runs gar build → xcmgar dump; same chain here:
    // per-chain registry rows → built dimension → export projection
    val chainRows = Seq(
      // relay origin of DOT
      (0, "polkadot", "DOT", "Polkadot", "DOT", 10, null: String,
        "here~polkadot", false),
      // moonbeam republishes DOT with a precompile-able currency id
      (2004, "moonbeam", "xcDOT", "xcDOT", "xcDOT", 10,
        "42259045809535163221576417993425387648", "here~polkadot", true)
    ).toDF("para_id", "chain_name", "asset", "name", "symbol",
      "decimals", "currency_id", "xcm_interior_key", "is_evm")
    val built = graft.etl.GarRegistry.buildXcmAssets(chainRows)
    val chainNames = Seq((0, "polkadot"), (2004, "moonbeam"))
      .toDF("para_id", "chain_name")
    val reg = Assets.registryFromBuild(built, "polkadot", chainNames)
    val out = Assets.xcmassets(reg, "polkadot").collect()
    assert(out.length == 1)
    val r = out.head
    // origin metadata wins; v2 key; gar-style here arity
    assert(r.getAs[String]("xcm_interior_key") ==
      "[{\"network\":\"polkadot\"},\"here\"]")
    assert(r.getAs[String]("interior_type") == "here")
    assert(r.getAs[Int]("para_id") == 0)
    assert(r.getAs[String]("chain_name") == "polkadot")
    assert(r.getAs[String]("source") == "[0,2004]")
    // the EVM publisher's precompile rides the contract map, EIP-55'd
    val addr = graft.etl.GarRegistry.xcContractAddress(
      "42259045809535163221576417993425387648")
    assert(r.getAs[String]("xc_contract_address") ==
      s"""{"2004":"$addr"}""")
    assert(r.getAs[String]("xc_currency_id") ==
      """{"2004":"42259045809535163221576417993425387648"}""")
    // multilocation bytes come from the gar source files — null
    // passthrough when not supplied
    assert(r.get(r.fieldIndex("xcm_v1_multilocation_byte")) == null)
  }

  test("xcmassets: contract-map guard + relay overwrite idempotence") {
    val reg = Seq(
      regRow("[{\"parachain\":2000}]~polkadot", 2000, "GLMR", Seq(2000),
        Map("1284" -> ("0xffffffff" + "0" * 32))),
      regRow("here~polkadot", 0, "DOT", Seq(0))
    ).toDF(regCols: _*)
    val ca = Seq((2000, "moonbeam", "{\"Token\":\"GLMR\"}", "Glimmer",
      null: String, "GLMR", 18))
      .toDF("para_id", "chain_name", "asset", "name", "currency_id",
        "symbol", "decimals")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_assets_spec").toString
    val out = Assets.dumpAssets(ca, reg, "polkadot", dir)("xcmassets")
      .collect().map(r => r.getAs[String]("symbol") -> r).toMap
    // non-empty map JSON-stringifies; empty map nulls out (the
    // Object.keys().length guard, substrateetl.js:3424)
    assert(out("GLMR").getAs[String]("xc_contract_address") ==
      "{\"1284\":\"0xffffffff" + "0" * 32 + "\"}")
    assert(out("DOT").get(
      out("DOT").fieldIndex("xc_contract_address")) == null)
    assert(out("GLMR").getAs[String]("source") == "[2000]")
    // re-publishing the same relay replaces, not appends
    val again = Assets.dumpAssets(ca, reg, "polkadot", dir)
    assert(again("xcmassets").count() == 2)
    assert(again("assets").count() == 1)
  }

  test("per-token issuance snapshot recs (ref bifrost.js:45-108)") {
    val issuance = Seq(
      ("\"BNC\"", BigDecimal("80000012345678901234")),   // known, 12 dec
      ("{\"vToken\":\"KSM\"}", BigDecimal(500)),         // unknown key
      // quotient fraction .99999999 — decimal division HALF_UP would
      // round ACROSS the integer boundary; truncation must not
      ("\"EDG\"", BigDecimal("99999999999999")),         // 12 dec
      ("\"CTY\"", BigDecimal(12345))                     // 2 dec (< 4)
    ).toDF("asset_key", "raw")
    val reg = Seq(
      ("\"BNC\"", "Bifrost Native Token", "BNC", 12),
      ("\"EDG\"", "Edge", "EDG", 12),
      ("\"CTY\"", "Cents", "CTY", 2))
      .toDF("asset_key", "name", "symbol", "decimals")
    val recs = Assets.issuanceSnapshots(issuance, reg,
      "tokens.totalIssuance", "Bifrost", "polkaholic",
      blockNumber = 900L, blockHash = "0xb900", tsSec = 1700002000L)
      .collect().map(r => r.getAs[String]("kv") -> r).toMap
    val known = recs("\"BNC\"")
    assert(known.getAs[String]("track") == "asset" &&
      known.getAs[String]("track_val") == "BNC")
    // floor(raw / 10^8) / 1e4 = 80000012.3456 — truncation, not round
    assert(known.getAs[String]("pv")
      .contains("\"humanAmount\":8.00000123456E7") ||
      known.getAs[String]("pv").contains("\"humanAmount\":80000012.3456"),
      known.getAs[String]("pv"))
    assert(known.getAs[String]("pv").contains("\"symbol\":\"BNC\""))
    // unknown asset: bare key as track_val, no humanAmount/name/symbol
    val unk = recs("{\"vToken\":\"KSM\"}")
    assert(unk.getAs[String]("track_val") == "{\"vToken\":\"KSM\"}")
    assert(!unk.getAs[String]("pv").contains("humanAmount") &&
      unk.getAs[String]("pv").contains("\"raw\":500"))
    // TRUNCATION at the boundary: 99.99999999999999 tokens must render
    // 99.9999, never round up to 100.0
    assert(recs("\"EDG\"").getAs[String]("pv")
      .contains("\"humanAmount\":99.9999"), recs("\"EDG\"").toString)
    // low-decimal asset keeps ALL its fraction digits (d < 4)
    assert(recs("\"CTY\"").getAs[String]("pv")
      .contains("\"humanAmount\":123.45"), recs("\"CTY\"").toString)
  }
}
