package graft

import graft.etl.GarRegistry
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** GAR build: per-chain registry JSON payloads → the global xcmasset
  * dimension (ref gar/xcmgar.js:613-624 merge, schema/xcmassets.json
  * shape). Fixtures are JsonFeed-style fetched files; the assertions
  * pin origin-wins conflict resolution, confidence counting, currency
  * id / EVM precompile maps, and the precompile golden vector the
  * reference documents (gar/xcmgarTool.js:99: id
  * 42259045809535163221576417993425387648 ↔
  * 0xFfFFfFff1FcaCBd218EDc0EbA20Fc2308C778080 — Moonbeam's public
  * xcDOT contract). */
class GarRegistrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dotKey = "here~polkadot"
  private val bncKey =
    """[{"parachain":2030},{"generalKey":"0x0001"}]~polkadot"""
  private val orphanKey =
    """[{"parachain":2090},{"generalIndex":7}]~polkadot"""

  private def row(para: Int, asset: String, name: String, symbol: String,
      decimals: Int, currency: String, key: String,
      evm: Boolean = false): String = {
    val cur = Option(currency).map(c => s""""$c"""").getOrElse("null")
    s"""{"para_id":$para,"chain_name":"chain$para","asset":"$asset",
       |"name":"$name","symbol":"$symbol","decimals":$decimals,
       |"currency_id":$cur,"xcm_interior_key":"${key.replace("\"", "\\\"")}",
       |"is_evm":$evm}""".stripMargin.replace("\n", "")
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("gar").toFile
    d.deleteOnExit()
    // relay (origin of DOT), decimals 10
    Files.write(d.toPath.resolve("polkadot_0_assets.json"),
      s"""[${row(0, "DOT", "Polkadot", "DOT", 10, null, dotKey)}]"""
        .getBytes("UTF-8"))
    // acala publishes DOT with WRONG decimals (origin must win) + the
    // orphan asset
    Files.write(d.toPath.resolve("polkadot_2000_assets.json"),
      s"""[${row(2000, """{\"Token\":\"DOT\"}""", "Polkadot", "DOT", 12,
          "0", dotKey)},
         |${row(2000, """{\"ForeignAsset\":\"7\"}""", "Orphan", "ORF", 8,
          "7", orphanKey)}]""".stripMargin.replace("\n", "")
        .getBytes("UTF-8"))
    // moonbeam (EVM) publishes DOT with a precompile-able id + orphan
    Files.write(d.toPath.resolve("polkadot_2004_assets.json"),
      s"""[${row(2004, "xcDOT", "xcDOT", "xcDOT", 10,
          "42259045809535163221576417993425387648", dotKey, evm = true)},
         |${row(2004, "xcORF", "Orphan2", "ORF2", 9, "99", orphanKey,
          evm = true)}]""".stripMargin.replace("\n", "")
        .getBytes("UTF-8"))
    // bifrost publishes DOT + its own BNC-pool asset (sole source)
    Files.write(d.toPath.resolve("polkadot_2030_assets.json"),
      s"""[${row(2030, """{\"Token2\":\"0\"}""", "Polkadot", "DOT", 10,
          "Token2:0", dotKey)},
         |${row(2030, """{\"Token\":\"BNC\"}""", "Bifrost", "BNC", 12,
          null, bncKey)}]""".stripMargin.replace("\n", "")
        .getBytes("UTF-8"))
    d.getAbsolutePath
  }

  private lazy val built = GarRegistry.buildXcmAssets(
      GarRegistry.readChainAssets(spark, s"$dir/*.json"))
    .collect().map(r => r.getAs[String]("xcm_interior_key") -> r).toMap

  test("origin chain wins conflict resolution; confidence counts others") {
    val dot = built(dotKey)
    assert(dot.getAs[Int]("para_id") == 0)
    assert(dot.getAs[String]("symbol") == "DOT")
    assert(dot.getAs[Int]("decimals") == 10) // NOT acala's wrong 12
    assert(dot.getAs[Int]("confidence") == 3) // 2000, 2004, 2030
    assert(dot.getAs[scala.collection.Seq[Int]]("sources").toSeq ==
      Seq(0, 2000, 2004, 2030))
    assert(dot.getAs[Int]("interior_type") == 1)
  }

  test("currency-id and EVM precompile maps collect per para") {
    val dot = built(dotKey)
    assert(dot.getAs[Map[Int, String]]("xc_currency_ids") ==
      Map(2000 -> "0",
        2004 -> "42259045809535163221576417993425387648",
        2030 -> "Token2:0"))
    assert(dot.getAs[Map[Int, String]]("xc_contract_addresses") ==
      Map(2004 -> "0xFfFFfFff1FcaCBd218EDc0EbA20Fc2308C778080"))
  }

  test("sole-source origin asset: confidence 0, origin metadata") {
    val bnc = built(bncKey)
    assert(bnc.getAs[Int]("para_id") == 2030)
    assert(bnc.getAs[Int]("confidence") == 0)
    assert(bnc.getAs[String]("symbol") == "BNC" &&
      bnc.getAs[Int]("decimals") == 12)
    assert(bnc.getAs[Int]("interior_type") == 2)
  }

  test("orphan key (origin never published): smallest para_id wins") {
    val orf = built(orphanKey)
    assert(orf.getAs[Int]("para_id") == 2090) // origin BY KEY
    assert(orf.getAs[String]("symbol") == "ORF") // 2000 < 2004
    assert(orf.getAs[Int]("confidence") == 2)
  }

  test("ethereum-bearing keys are not the relay asset; dup rows merge") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("para_id", IntegerType), StructField("chain_name", StringType),
      StructField("asset", StringType), StructField("name", StringType),
      StructField("symbol", StringType), StructField("decimals", IntegerType),
      StructField("currency_id", StringType),
      StructField("xcm_interior_key", StringType),
      StructField("is_evm", BooleanType)))
    val ethKey =
      """[{"globalConsensus":{"ethereum":{"chainId":1}}},""" +
        """{"accountKey20":"0xc02a"}]~polkadot"""
    val rows = Seq(
      // "ethereum" contains "here" as a substring — must NOT be relay
      Row(2004, "moonbeam", "xcWETH", "Wrapped Ether", "WETH", 18,
        "5", ethKey, true),
      Row(1000, "statemint", "WETH", "Wrapped Ether (bridged)", "WETH.e",
        18, "9", ethKey, false),
      // duplicate rows for ONE para with conflicting currency ids —
      // must merge deterministically, not throw on the map key
      Row(2000, "acala", "A", "Dup", "DUP", 8, "3", bncKey, false),
      Row(2000, "acala", "A", "Dup", "DUP", 8, "1", bncKey, false),
      // garbage currency ids must not kill the precompile UDF
      Row(2004, "moonbeam", "G", "Garbage", "G", 0, "", bncKey, true),
      Row(2006, "astar", "G2", "Garbage2", "G2", 0,
        "9" * 45, bncKey, true))
    val df = GarRegistry.buildXcmAssets(
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
      .collect().map(r => r.getAs[String]("xcm_interior_key") -> r).toMap
    val eth = df(ethKey)
    // no publisher is the (nonexistent para) origin → smallest para wins
    assert(eth.getAs[Int]("interior_type") == 2) // NOT the here-shape 1
    assert(eth.getAs[String]("symbol") == "WETH.e") // para 1000 < 2004
    val dup = df(bncKey)
    assert(dup.getAs[Map[Int, String]]("xc_currency_ids")(2000) == "1")
    // garbage ids survive as null contract entries, no crash
    val contracts = dup.getAs[Map[Int, String]]("xc_contract_addresses")
    assert(contracts.get(2004).flatMap(Option(_)).isEmpty &&
      contracts.get(2006).flatMap(Option(_)).isEmpty)
  }

  test("per-para pick keeps currency_id and is_evm from ONE row") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("para_id", IntegerType), StructField("chain_name", StringType),
      StructField("asset", StringType), StructField("name", StringType),
      StructField("symbol", StringType), StructField("decimals", IntegerType),
      StructField("currency_id", StringType),
      StructField("xcm_interior_key", StringType),
      StructField("is_evm", BooleanType)))
    // para 2004 publishes an EVM row (cur 5) AND a non-EVM row (cur 3)
    // for ONE key: a per-field min/max merge would fabricate a
    // precompile for cur 3; the row pick must keep (3, false) together
    val rows = Seq(
      Row(2004, "m", "A", "Asset", "AST", 10, "5", bncKey, true),
      Row(2004, "m", "A", "Asset", "AST", 10, "3", bncKey, false))
    val out = GarRegistry.buildXcmAssets(
      spark.createDataFrame(spark.sparkContext.parallelize(rows), schema))
      .collect().head
    assert(out.getAs[Map[Int, String]]("xc_currency_ids") ==
      Map(2004 -> "3"))
    assert(out.getAs[Map[Int, String]]("xc_contract_addresses").isEmpty)
  }

  test("decorate: broadcast left join onto an interior-keyed frame") {
    import spark.implicits._
    val facts = Seq((dotKey, 100L), (bncKey, 7L), ("unknown~polkadot", 1L))
      .toDF("xcm_interior_key", "amount")
    val reg = GarRegistry.buildXcmAssets(
      GarRegistry.readChainAssets(spark, s"$dir/*.json"))
    val out = GarRegistry.decorate(facts, reg, "xcm_interior_key")
      .collect().map(r => r.getAs[String]("xcm_interior_key") ->
        ((r.getAs[String]("asset_symbol"),
          Option(r.get(r.fieldIndex("asset_decimals")))))).toMap
    assert(out(dotKey) == (("DOT", Some(10))))
    assert(out(bncKey) == (("BNC", Some(12))))
    assert(out("unknown~polkadot") == ((null, None))) // left join keeps
  }

  test("precompile golden vector (ref xcmgarTool.js:99)") {
    assert(GarRegistry.xcContractAddress(
      "42259045809535163221576417993425387648") ==
      "0xFfFFfFff1FcaCBd218EDc0EbA20Fc2308C778080")
    // digit-grouped ids clean first
    assert(GarRegistry.xcContractAddress("340,282,366,920,938,463,463," +
      "374,607,431,768,211,455") ==
      "0xFFfFfFffFFfffFFfFFfFFFFFffFFFffffFfFFFfF")
  }
}
