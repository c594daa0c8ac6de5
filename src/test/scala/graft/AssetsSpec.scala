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

  test("assethub asset.asset registry recs " +
      "(ref polkadot_assethub.js:44-63)") {
    val reg = Seq(
      ("1984", "USDT", BigDecimal("77000000000000"), BigDecimal(10),
        BigDecimal(1000), BigDecimal(6000), BigDecimal(5900),
        BigDecimal(3)))
      .toDF("currency_id", "symbol", "supply", "deposit", "min_balance",
        "accounts", "sufficients", "approvals")
    val r = Assets.assetRegistrySnapshots(reg, "Polkadot_AssetHub",
      "polkaholic", 7000000L, "0xb7m", 1700003000L).collect().head
    assert(r.getAs[String]("section") == "asset" &&
      r.getAs[String]("storage") == "asset")
    assert(r.getAs[String]("track") == "stablecoin" &&
      r.getAs[String]("track_val") == "USDT")
    assert(r.getAs[String]("kv") ==
      """{"currencyID":"1984","symbol":"USDT"}""")
    // pv values are STRINGS — the reference's toNumWithoutComma
    // returns strings (paraTool.js:423)
    assert(r.getAs[String]("pv") ==
      """{"supply":"77000000000000","deposit":"10",""" +
        """"minBalance":"1000","accounts":"6000",""" +
        """"sufficients":"5900","approvals":"3"}""")
    assert(r.getAs[String]("address_pubkey") == null)
  }

  test("assethub asset.account recs: named/small/share keeps, " +
      "small-holder rollup (ref polkadot_assethub.js:66-137)") {
    import graft.functions.Codec
    val para2000 = "0x70617261d007" + "00" * 26 // pubkeyAscii para:2000
    val pkB = "0x" + "22" * 32
    val pkC = "0x" + "33" * 32
    val pkD = "0x" + "44" * 32
    val pkE = "0x" + "55" * 32
    // USDT: 6000 holders (> 5000 — small-asset gate OFF), supply 1e10
    // raw = 10000 USDT; USDC: 10 holders (small-asset gate ON)
    val reg = Seq(
      ("1984", "USDT", BigDecimal("10000000000"), BigDecimal(6000)),
      ("1337", "USDC", BigDecimal("500000000"), BigDecimal(10)))
      .toDF("currency_id", "symbol", "supply", "accounts")
    val holdings = Seq(
      ("1984", "USDT", 6, para2000, BigDecimal(1000)),      // named
      ("1984", "USDT", 6, pkB, BigDecimal(100000000)),      // 1% share
      ("1984", "USDT", 6, pkC, BigDecimal(1000000)),        // rolls up
      ("1984", "USDT", 6, pkD, BigDecimal(2000000)),        // rolls up
      ("1337", "USDC", 6, pkE, BigDecimal(7)))              // small asset
      .toDF("currency_id", "symbol", "decimals", "address_pubkey",
        "balance_raw")
    val out = Assets.assetHolderSnapshots(holdings, reg,
      "Polkadot_AssetHub", "polkaholic", 7000000L, "0xb7m",
      1700003000L, ss58Prefix = 0).collect()
    assert(out.length == 4, out.mkString("\n")) // 3 kept + 1 rollup
    val byKv = out.map(r => r.getAs[String]("kv") -> r).toMap
    // named module account: ascii name in kv, own rec despite tiny share
    val named = byKv(
      """{"name":"para:2000","currencyID":"1984","symbol":"USDT"}""")
    assert(named.getAs[String]("address_pubkey") == para2000)
    assert(Codec.ss58Decode(named.getAs[String]("address_ss58"))._1 == 0)
    assert(named.getAs[String]("pv") ==
      """{"balance":0.001,"balance_raw":"1000"}""")
    // share-kept holder: kv carries the reference's literal null name
    val big = byKv("""{"name":null,"currencyID":"1984","symbol":"USDT"}""")
    assert(big.getAs[String]("address_pubkey") == pkB)
    assert(big.getAs[String]("pv") ==
      """{"balance":100.0,"balance_raw":"100000000"}""")
    // small-asset holder: kept regardless of share
    assert(byKv(
      """{"name":null,"currencyID":"1337","symbol":"USDC"}""")
      .getAs[String]("address_pubkey") == pkE)
    // the rollup: no address, exact decimal raw sum, holder count
    val rolled = byKv(
      """{"name":"holders","currencyID":"1984","symbol":"USDT"}""")
    assert(rolled.getAs[String]("address_pubkey") == null)
    assert(rolled.getAs[String]("pv") ==
      """{"balance":3.0,"balance_raw":"3000000","holders":2}""")
    assert(rolled.getAs[String]("track") == "stablecoin" &&
      rolled.getAs[String]("track_val") == "USDT")
    // a holder of a currency MISSING from assetState must not vanish
    // in three-valued logic — the null gates read false (JS undefined
    // comparisons), sending it to the rollup
    val orphan = Assets.assetHolderSnapshots(
      Seq(("9999", "MYST", 6, pkB, BigDecimal(42)))
        .toDF("currency_id", "symbol", "decimals", "address_pubkey",
          "balance_raw"),
      reg, "Polkadot_AssetHub", "polkaholic", 7000000L, "0xb7m",
      1700003000L, ss58Prefix = 0).collect()
    assert(orphan.length == 1 && orphan.head.getAs[String]("kv")
      .contains("\"name\":\"holders\""), orphan.mkString("\n"))
  }

  test("hydradx tokens.accounts / omnipool / xyk / uniques rec shapes " +
      "(ref hydradx.js:81-268)") {
    import graft.functions.Codec
    val reg = Seq((5, "DOT"), (0, "HDX")).toDF("asset_id", "symbol")
    val pk = "0x" + "ab" * 32
    // tokens.accounts at a named wallet: ticker joined where known,
    // OMITTED where not (JS undefined drops from JSON.stringify)
    val bal = Seq((5, pk, BigDecimal(100), BigDecimal(7), BigDecimal(0)),
      (9, pk, BigDecimal(50), BigDecimal(0), BigDecimal(0)))
      .toDF("asset_id", "address_pubkey", "free", "reserved", "frozen")
    val ta = Assets.tokenAccountSnapshots(bal, reg, "treasury",
      "HydraDx", "polkaholic", 4400000L, "0xh44", 1700004000L)
      .collect().map(r => r.getAs[String]("kv") -> r).toMap
    val ss = Codec.ss58Encode(
      Codec.hexToBytes(pk), 63)
    assert(ta.keys.exists(_.contains("\"ticker\":\"DOT\"")))
    val known = ta.find(_._1.contains("\"asset_id\":5")).get._2
    assert(known.getAs[String]("kv") ==
      s"""{"account":"$ss","pubKey":"$pk","asset_id":5,"ticker":"DOT"}""")
    assert(known.getAs[String]("pv") ==
      """{"free":"100","reserved":"7","frozen":"0"}""")
    assert(known.getAs[String]("track") == "balance" &&
      known.getAs[String]("track_val") == "treasury")
    val unknown = ta.find(_._1.contains("\"asset_id\":9")).get._2
    assert(!unknown.getAs[String]("kv").contains("ticker"))
    // omnipool.assets: u128 strings + tradable enum
    val oa = Assets.omnipoolAssetSnapshots(
      // u128-sized reserve rides in as a STRING — scale-18 decimal
      // inference would overflow 38 digits (the extractor casts)
      Seq((5, "123456789012345678901", BigDecimal(10),
        BigDecimal(3), BigDecimal(500000), "{\"tradable\":15}"))
        .toDF("asset_id", "hub_reserve", "shares", "protocol_shares",
          "cap", "tradable"),
      reg, "HydraDx", "polkaholic", 4400000L, "0xh44", 1700004000L)
      .collect().head
    // kv.id is a JSON NUMBER — the reference's toJSON key
    assert(oa.getAs[String]("kv") == """{"id":5,"ticker":"DOT"}""")
    assert(oa.getAs[String]("pv") ==
      """{"hubReserve":"123456789012345678901","shares":"10",""" +
        """"protocolShares":"3","cap":"500000",""" +
        """"tradable":"{\"tradable\":15}"}""")
    assert(oa.getAs[String]("track") == "omniasset" &&
      oa.getAs[String]("track_val") == "5")
    // omnipool.positions: price pair split (price_1/price_2)
    val op = Assets.omnipoolPositionSnapshots(
      Seq((777L, 5, BigDecimal(1000), BigDecimal(900),
        BigDecimal("45000000"), BigDecimal("1000000")))
        .toDF("position_id", "asset_id", "amount", "shares",
          "price_1", "price_2"),
      reg, "HydraDx", "polkaholic", 4400000L, "0xh44", 1700004000L)
      .collect().head
    // kv.id and pv.assetId stay JSON NUMBERS (toJSON leaves them);
    // only the u128 amount/shares/price fields are rewritten to
    // dechexToIntStr strings
    assert(op.getAs[String]("kv") == """{"id":777,"ticker":"DOT"}""")
    assert(op.getAs[String]("pv") ==
      """{"assetId":5,"amount":"1000","shares":"900",""" +
        """"price_1":"45000000","price_2":"1000000"}""")
    assert(op.getAs[String]("track") == "liquidity" &&
      op.getAs[String]("track_val") == "5")
    // pools.xyk: pool address + the two reserve positions in order
    val xy = Assets.xykPoolSnapshots(
      Seq((pk, 1000001L, 0, 5, BigDecimal(888),
        BigDecimal(300), BigDecimal(40)))
        .toDF("pool_pubkey", "share_token", "asset_a", "asset_b",
          "total_liquidity", "free_a", "free_b"),
      "HydraDx", "polkaholic", 4400000L, "0xh44", 1700004000L)
      .collect().head
    assert(xy.getAs[String]("kv") ==
      s"""{"account":"$ss","pubKey":"$pk","shareToken":"1000001",""" +
        """"assetA":"0","assetB":"5"}""")
    assert(xy.getAs[String]("pv") ==
      """{"totalLiquidity":"888","positions":[""" +
        """{"assetId":"0","free":"300"},{"assetId":"5","free":"40"}]}""")
    assert(xy.getAs[String]("track") == "xykpool" &&
      xy.getAs[String]("track_val") == null)
    assert(xy.getAs[String]("address_pubkey") == pk)
    // uniques.asset: NFT ownership with decoded owner pubkey
    val un = Assets.uniquesAssetSnapshots(
      Seq((1337L, 42L, pk, BigDecimal(5000), false))
        .toDF("collection_id", "nft_id", "owner_pubkey", "deposit",
          "is_frozen"),
      "HydraDx", "polkaholic", 4400000L, "0xh44", 1700004000L)
      .collect().head
    assert(un.getAs[String]("kv") == """{"id":"1337","nft":"42"}""")
    assert(un.getAs[String]("pv") ==
      s"""{"owner":"$ss","address_pubkey":"$pk",""" +
        """"deposit":"5000","isFrozen":false}""")
    assert(un.getAs[String]("track") == "nft" &&
      un.getAs[String]("track_val") == "1337")
  }

  test("bifrost vtokenMinting.tokenPool recs: registry-gated, human " +
      "amount (ref bifrost.js:110-132)") {
    val reg = Seq(("{\"Token\":\"DOT\"}", "DOT", "Polkadot", 10))
      .toDF("token_key", "symbol", "name", "decimals")
    val pools = Seq(
      ("{\"Token\":\"DOT\"}", BigDecimal("123450000000")),
      ("{\"Token\":\"UNREG\"}", BigDecimal(1))) // registry miss: drops
      .toDF("token_key", "raw")
    val out = Assets.tokenPoolSnapshots(pools, reg, "Bifrost",
      "polkaholic", 900L, "0xb900", 1700002000L).collect()
    assert(out.length == 1, "registry misses must drop (the " +
      "reference's continue)")
    val r = out.head
    assert(r.getAs[String]("kv") == "{\"Token\":\"DOT\"}")
    assert(r.getAs[String]("pv") ==
      """{"raw":"123450000000","symbol":"DOT","name":"Polkadot",""" +
        """"humanAmount":12.345}""")
    assert(r.getAs[String]("track") == "vtoken" &&
      r.getAs[String]("track_val") == "DOT")
  }
}
