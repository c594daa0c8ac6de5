package graft

import graft.sources.JsonFeed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** External payload readers (S13): coingecko market-chart JSON and
  * wallet-attribution CSV into engine schemas. */
class JsonFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("market chart payload → 5-min aligned price rows") {
    val dir = Files.createTempDirectory("graft_feed")
    val f = dir.resolve("dot.json")
    Files.writeString(f,
      """{"prices": [[1700000100000, 5.25], [1700000400000, 5.30]],
        |"total_volumes": [[1700000100000, 1000.0], [1700000400000, 1100.0]]}"""
        .stripMargin)
    val out = JsonFeed.marketChart(spark, f.toString, "DOT", 0)
      .orderBy("index_ts").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("asset") == "DOT")
    assert(out(0).getAs[Double]("price_usd") == 5.25)
    assert(out(0).getAs[Double]("volume") == 1000.0)
    // 1700000100 aligns down to 1700000100 - (1700000100 % 300)
    val ts0 = out(0).getAs[java.sql.Timestamp]("index_ts").getTime / 1000
    assert(ts0 % 300 == 0 && ts0 <= 1700000100 && ts0 > 1700000100 - 300)
  }

  test("wallet label CSV → dimension rows") {
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("labels.csv")
    Files.writeString(f,
      "address,label,kind\n0xabc,Binance 1,exchange\n0xdef,Treasury,system\n")
    val out = JsonFeed.walletLabels(spark, f.toString).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out == Map("0xabc" -> ("Binance 1", "exchange"),
      "0xdef" -> ("Treasury", "system")))
  }

  test("user audience CSV → the published users shape " +
      "(ref tools/createAudience.js)") {
    import graft.functions.Codec
    val pk = Array.fill[Byte](32)(9)
    val ss58 = Codec.ss58Encode(pk, 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_users")
    val f = dir.resolve("user_export.csv")
    java.nio.file.Files.writeString(f,
      "id,evmAddress,substrateAddress,twitterHandle,username,twitterUrl\n" +
        s"u1,0xAbCd000000000000000000000000000000000001,$ss58,,alice,\n" +
        "u2,0xdead000000000000000000000000000000000002,,,bob,\n" +
        "u3,,not-an-address,,carol,\n")
    val rows = JsonFeed.userAudience(spark, f.toString).collect()
      .map(r => r.getAs[String]("id") -> r).toMap
    assert(rows.size == 3)
    // ss58 side decodes to the pubkey; evm side lowercases
    assert(rows("u1").getAs[String]("account_pubkey") ==
      Codec.bytesToHex(pk))
    assert(rows("u1").getAs[String]("evm_address")
      .startsWith("0xabcd"))
    // evm-only row keeps null substrate columns (the conditional emit)
    assert(rows("u2").getAs[String]("ss58_address") == null &&
      rows("u2").getAs[String]("account_pubkey") == null)
    // malformed ss58 → guarded-null pubkey, row survives
    assert(rows("u3").getAs[String]("account_pubkey") == null)
  }
}
