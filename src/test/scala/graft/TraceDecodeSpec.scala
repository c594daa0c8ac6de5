package graft

import graft.decode.TraceDecode
import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Trace-decode golden cases in the style of the reference's embedded
  * fixtures (ref substrate/test/testParseTrace.js:8-40 — known storage
  * key → expected pallet/storage), built from first principles with our
  * own twox128: System.Account prefix + compact-decoded values covering
  * both length branches, a null-value row, and an unknown prefix. */
class TraceDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dimEntries = Seq(
    ("System", "Account"), ("Balances", "TotalIssuance"),
    ("Staking", "ActiveEra"))

  test("prefix dim carries the well-known System.Account prefix") {
    val dim = TraceDecode.prefixDim(spark, dimEntries)
    val sysAcct = dim.filter($"section" === "System").select("prefix")
      .collect()(0).getString(0)
    assert(sysAcct ==
      "26aa394eea5630e07c48ae0c9558cef7b99d880ec681799c0cf30e8886371da9")
  }

  test("trace rows resolve section/storage and decode compact values") {
    val dim = TraceDecode.prefixDim(spark, dimEntries)
    val sysPrefix = "0x" + dim.filter($"section" === "System")
      .collect()(0).getString(0)
    val issuancePrefix = "0x" + dim.filter($"storage" === "TotalIssuance")
      .collect()(0).getString(0)
    val traces = Seq(
      // single-byte compact: 0xa8 = 42
      (0, sysPrefix + "deadbeef", "0xa8"),
      // four-byte compact: 65535 → 0xfeff0300
      (1, issuancePrefix, "0xfeff0300"),
      // big-mode compact (u128-ish): encode then hex
      (2, sysPrefix + "00", Codec.bytesToHex(
        Codec.compactEncode(BigInt("123456789012345678")))),
      // null value (zeroed balance, substrateetl.js:6612)
      (3, sysPrefix + "ff", null),
      // unknown pallet prefix
      (4, "0x" + "00" * 33, "0x04")
    ).toDF("id", "k", "v")
    val out = TraceDecode.decodeTraces(traces, dim)
      .orderBy("id")
      .select("section", "storage", "decoded_value").collect()
    assert(out(0).getString(0) == "System" &&
      out(0).getDouble(2) == 42.0)
    assert(out(1).getString(0) == "Balances" &&
      out(1).getDouble(2) == 65535.0)
    assert(out(2).getDouble(2) == 1.23456789012345678e17)
    assert(out(3).getString(0) == "System" && out(3).isNullAt(2))
    assert(out(4).isNullAt(0) && out(4).getDouble(2) == 1.0)
  }

  test("key components recover from REAL concat-hashed storage keys") {
    // genuine wire-format keys: prefix ‖ hasher(key) ‖ raw key, with
    // the hash segment computed by the real blake2b-128 / twox64 —
    // extraction must land exactly past it
    val dim = TraceDecode.keyedPrefixDim(spark, Seq(
      ("System", "Account", "blake2_128concat", 32),
      ("Session", "KeyOwner", "twox64concat", 8),
      ("Sudo", "Key", "identity", 4)))
    def pfx(sec: String, sto: String) = Codec.bytesToHex(
      Codec.twox128(sec.getBytes) ++ Codec.twox128(sto.getBytes),
      prefix = false)
    val acct = Array.tabulate(32)(i => (i + 3).toByte)
    val acctKey = "0x" + pfx("System", "Account") +
      Codec.bytesToHex(Codec.blake2b(acct, 16), prefix = false) +
      Codec.bytesToHex(acct, prefix = false)
    val idBytes = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val sessKey = "0x" + pfx("Session", "KeyOwner") +
      Codec.bytesToHex(Codec.twox64(idBytes), prefix = false) +
      Codec.bytesToHex(idBytes, prefix = false)
    val sudoKey = "0x" + pfx("Sudo", "Key") + "cafebabe"
    val unknown = "0x" + "00" * 40
    val out = TraceDecode.extractKeyComponents(
        Seq(acctKey, sessKey, sudoKey, unknown).toDF("k"), dim)
      .select("section", "storage", "raw_key")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).toSet
    assert(out == Set(
      ("System", "Account", Codec.bytesToHex(acct, prefix = false)),
      ("Session", "KeyOwner", "0102030405060708"),
      ("Sudo", "Key", "cafebabe"),
      (null, null, null)))
  }

  test("balances projection: address from key, AccountInfo from value") {
    val dim = TraceDecode.keyedPrefixDim(spark, Seq(
      ("System", "Account", "blake2_128concat", 32)))
    def pfx(sec: String, sto: String) = Codec.bytesToHex(
      Codec.twox128(sec.getBytes) ++ Codec.twox128(sto.getBytes),
      prefix = false)
    val alice = Codec.hexToBytes(
      "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d")
    val key = "0x" + pfx("System", "Account") +
      Codec.bytesToHex(Codec.blake2b(alice, 16), prefix = false) +
      Codec.bytesToHex(alice, prefix = false)
    // AccountInfo wire value: nonce=5, refcounts, free=10^10 (1.0 at
    // 10 dp), reserved=25, frozen=0 — u32/u128 little-endian
    def u32le(v: Long) = Array(v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def u128le(v: BigInt) = {
      val le = v.toByteArray.dropWhile(_ == 0).reverse
      le ++ Array.fill[Byte](16 - le.length)(0)
    }
    val value = Codec.bytesToHex(
      u32le(5) ++ u32le(1) ++ u32le(1) ++ u32le(0) ++
        u128le(BigInt(10).pow(10)) ++ u128le(BigInt(25)) ++
        u128le(BigInt(0)))
    val traces = Seq(
      (key, value),
      (key, "0xdead")) // truncated value → quarantined
      .toDF("k", "v")
    val out = TraceDecode.balances(traces, dim).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("address_ss58") ==
      "5GrwvaEF5zXb26Fz9rcQpDWS57CtERHpNehXCPcNoHGKutQY")
    assert(r.getAs[Long]("nonce") == 5L)
    assert(r.getAs[java.math.BigDecimal]("free_raw").longValueExact ==
      10000000000L)
    assert(r.getAs[Double]("free") == 1.0)
    assert(r.getAs[java.math.BigDecimal]("reserved_raw")
      .longValueExact == 25L)
    assert(r.getAs[Double]("frozen") == 0.0)
  }

  test("metadata-driven key dim: multi-key offsets, one-way, rest-of-key") {
    import graft.decode.MetadataV14.ParsedMetadata
    import graft.decode.MetaDecode._
    val parsed = ParsedMetadata(Seq.empty, Map.empty, Map.empty, Map(
      ("system", "Account") ->
        Seq(("blake2_128concat", AccountId)),
      // double map: twox64concat(u32) ‖ blake2_128concat(AccountId)
      ("staking", "ErasStakers") ->
        Seq(("twox64concat", U32), ("blake2_128concat", AccountId)),
      // one-way hasher: nothing recoverable, entry emits no rows
      ("session", "KeyOwner") ->
        Seq(("blake2_128", FixedBytes(4))),
      // variable-width identity key in last position → rest-of-key
      ("system", "EventTopics") ->
        Seq(("identity", Bytes))))
    val dim = TraceDecode.keyedPrefixDimFromMetadata(spark, parsed)

    def pfx(sec: String, sto: String) = Codec.bytesToHex(
      Codec.twox128(sec.getBytes) ++ Codec.twox128(sto.getBytes),
      prefix = false)
    val acct = Array.tabulate(32)(i => (i + 9).toByte)
    val eraLe = Array[Byte](0x2a, 0, 0, 0) // era 42, u32 LE
    val stakersKey = "0x" + pfx("staking", "ErasStakers") +
      Codec.bytesToHex(Codec.twox64(eraLe), prefix = false) +
      Codec.bytesToHex(eraLe, prefix = false) +
      Codec.bytesToHex(Codec.blake2b(acct, 16), prefix = false) +
      Codec.bytesToHex(acct, prefix = false)
    val topicsKey = "0x" + pfx("system", "EventTopics") + "deadbeef0102"
    val ownerKey = "0x" + pfx("session", "KeyOwner") + "00112233"

    val out = TraceDecode.extractKeyComponentsMeta(
        Seq(stakersKey, topicsKey, ownerKey).toDF("k"), dim)
      .select("section", "storage", "component_idx", "raw_key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getString(3))).toSet
    assert(out == Set(
      ("staking", "ErasStakers", 0, "2a000000"),
      ("staking", "ErasStakers", 1,
        Codec.bytesToHex(acct, prefix = false)),
      ("system", "EventTopics", 0, "deadbeef0102")))
    // KeyOwner's one-way hash correctly yields nothing
  }

  test("as-of spec-version selection per block") {
    val specs = Seq((0L, 100), (1000L, 101), (5000L, 102))
      .toDF("block_number", "spec_version")
    val blocks = Seq(0L, 999L, 1000L, 1001L, 4999L, 5000L, 9999L)
      .toDF("block_number")
    val out = TraceDecode.withSpecVersion(blocks, specs)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 100, 999L -> 100, 1000L -> 101,
      1001L -> 101, 4999L -> 101, 5000L -> 102, 9999L -> 102))
  }
}
