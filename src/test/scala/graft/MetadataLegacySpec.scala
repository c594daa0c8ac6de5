package graft

import graft.decode.{BlockDecode, MetadataLegacy, MetadataV14}
import graft.decode.BlockDecode.RuntimeMeta
import graft.decode.MetaDecode._
import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Historical metadata v12/v13 → PalletDef registry → raw decode, end
  * to end: the fixtures are genuine v12/v13-format blobs (magic,
  * modules with storage/constants/errors to skip, explicit module
  * index) ENCODED by the test and PARSED by the MetadataV14 front door
  * — then a raw `balances.transfer` decodes through the PARSED
  * registry, proving a 2020-era block range can onboard from its own
  * `state_getMetadata` hex just like a v14/v15 chain. */
class MetadataLegacySpec extends AnyFunSuite {

  // ---- test-side SCALE encoder ----
  private def cp(v: Long): Array[Byte] = Codec.compactEncode(BigInt(v))
  private def u8(v: Int): Array[Byte] = Array(v.toByte)
  private def u32le(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
  private def b(xs: Array[Byte]*): Array[Byte] = xs.flatten.toArray
  private def str(x: String): Array[Byte] =
    b(cp(x.length.toLong), x.getBytes("UTF-8"))
  private def vecOf(items: Array[Byte]*): Array[Byte] =
    b(cp(items.length.toLong) +: items: _*)
  private val none = u8(0)
  private def some(x: Array[Byte]) = b(u8(1), x)
  private def bytesOf(xs: Int*): Array[Byte] =
    b(cp(xs.length.toLong), xs.map(_.toByte).toArray)

  private def fn(name: String, args: (String, String)*): Array[Byte] =
    b(str(name),
      vecOf(args.map { case (a, t) => b(str(a), str(t)) }: _*),
      vecOf() /* docs */)
  private def ev(name: String, args: String*): Array[Byte] =
    b(str(name), vecOf(args.map(str): _*), vecOf())
  private def plainEntry(name: String, ty: String): Array[Byte] =
    b(str(name), u8(0) /* Default */, u8(0) /* Plain */, str(ty),
      bytesOf(0) /* default */, vecOf())
  private def mapEntry(name: String, key: String,
      value: String): Array[Byte] =
    b(str(name), u8(0), u8(1) /* Map */, u8(5) /* Twox64Concat */,
      str(key), str(value), u8(0) /* unused */, bytesOf(0), vecOf())
  private def nmapEntry(name: String, keys: Seq[String],
      value: String): Array[Byte] =
    b(str(name), u8(0), u8(3) /* NMap */, vecOf(keys.map(str): _*),
      vecOf(keys.map(_ => u8(5)): _*), str(value), bytesOf(0), vecOf())
  private def constant(name: String, ty: String): Array[Byte] =
    b(str(name), str(ty), bytesOf(1, 2, 3, 4), vecOf())
  private def err(name: String): Array[Byte] = b(str(name), vecOf())

  private def module(name: String, index: Int,
      storage: Option[(String, Seq[Array[Byte]])],
      calls: Option[Seq[Array[Byte]]],
      events: Option[Seq[Array[Byte]]],
      constants: Seq[Array[Byte]] = Seq.empty,
      errors: Seq[Array[Byte]] = Seq.empty): Array[Byte] =
    b(str(name),
      storage.map { case (p, es) => some(b(str(p), vecOf(es: _*))) }
        .getOrElse(none),
      calls.map(cs => some(vecOf(cs: _*))).getOrElse(none),
      events.map(es => some(vecOf(es: _*))).getOrElse(none),
      vecOf(constants: _*), vecOf(errors: _*), u8(index))

  private def blob(version: Int, modules: Array[Byte]*): Array[Byte] =
    b(u32le(0x6174656dL), u8(version), vecOf(modules: _*),
      u8(4) /* extrinsic version */,
      vecOf(str("CheckSpecVersion"), str("CheckNonce")) /* signed ext */)

  private val system = module("System", 0,
    storage = Some("System" -> Seq(
      plainEntry("Number", "T::BlockNumber"),
      plainEntry("Digest", "DigestOf<T>") /* unknown → dropped */)),
    calls = Some(Seq(
      fn("fill_block", "ratio" -> "Perbill"),
      fn("remark", "remark" -> "Vec<u8>"))),
    events = Some(Seq(
      ev("ExtrinsicSuccess", "DispatchInfo") /* unknown → dropped */,
      ev("NewAccount", "T::AccountId"))),
    constants = Seq(constant("BlockHashCount", "T::BlockNumber")),
    errors = Seq(err("InvalidSpecName")))

  private val balances = module("Balances", 5,
    storage = Some("Balances" -> Seq(
      plainEntry("TotalIssuance", "T::Balance"),
      mapEntry("Account", "T::AccountId", "AccountData<T::Balance>"))),
    calls = Some(Seq(
      fn("transfer",
        "dest" -> "<T::Lookup as StaticLookup>::Source",
        "value" -> "Compact<T::Balance>"),
      fn("set_balance",
        "who" -> "<T::Lookup as StaticLookup>::Source",
        "new_free" -> "Compact<T::Balance>",
        "new_reserved" -> "Compact<T::Balance>"))),
    events = Some(Seq(
      ev("Endowed", "T::AccountId", "T::Balance"),
      ev("Transfer", "T::AccountId", "T::AccountId", "T::Balance"))))

  private lazy val parsed = MetadataV14.parseAll(blob(12, system, balances))

  test("v12 modules parse to PalletDefs with explicit indices") {
    val bal = parsed.pallets.find(_.name == "balances").get
    assert(bal.index == 5)
    assert(bal.calls.map(_.name) == Seq("transfer", "setBalance"))
    assert(bal.calls.head ==
      ItemDef(0, "transfer",
        Seq("dest" -> MultiAddress, "value" -> CompactInt)))
    assert(bal.events.map(_.name) == Seq("Endowed", "Transfer"))
    assert(bal.events(1).fields ==
      Seq("_0" -> AccountId, "_1" -> AccountId, "_2" -> U128))
  }

  test("per-item leniency: exotic names drop the item, keep the rest") {
    val sys = parsed.pallets.find(_.name == "system").get
    // DispatchInfo is outside the vocabulary: ExtrinsicSuccess (index
    // 0) drops, NewAccount keeps its ORIGINAL index 1
    assert(sys.events.map(e => (e.index, e.name)) == Seq(1 -> "NewAccount"))
    assert(sys.calls.map(_.name) == Seq("fillBlock", "remark"))
    // Vec<u8> normalizes to Bytes exactly like the v14 DSequence(u8)
    // path, so args-JSON is stable across the v13→v14 upgrade
    assert(sys.calls(1).fields == Seq("remark" -> Bytes))
  }

  test("storage-key layouts: version-correct hasher tables") {
    // v12 mapEntry writes hasher byte 5 → twox64concat on the v11+
    // table
    assert(parsed.storageKeys(("balances", "Account")) ==
      Seq(("twox64concat", AccountId)))
    // the SAME byte means different hashers pre-v10: v9's table has
    // twox64concat at 4 (and no Blake2_128Concat at all)
    val v9blob = blobPre12(9, moduleNoIndex("Staking",
      storage = Some("Staking" -> Seq(
        b(str("Bonded"), u8(0), u8(1) /* Map */, u8(4) /* v9 tag 4 */,
          str("T::AccountId"), str("T::AccountId"), u8(0),
          bytesOf(0), vecOf()))),
      calls = None, events = None))
    val p9 = MetadataV14.parseAll(v9blob)
    assert(p9.storageKeys(("staking", "Bonded")) ==
      Seq(("twox64concat", AccountId)))
  }

  test("pallet constants decode from the legacy blob") {
    // BlockHashCount: T::BlockNumber (u32) with value bytes 01 02 03 04
    // = 0x04030201 LE — the api.consts face, straight off the metadata
    assert(parsed.constants(("system", "BlockHashCount")) == "67305985")
  }

  test("storage value shapes resolve leniently from type names") {
    assert(parsed.storageShapes(("system", "Number")) == U32)
    assert(parsed.storageShapes(("balances", "TotalIssuance")) == U128)
    // DigestOf<T> and AccountData<T::Balance> are outside the grammar
    assert(!parsed.storageShapes.contains(("system", "Digest")))
    assert(!parsed.storageShapes.contains(("balances", "Account")))
  }

  test("decodes a raw balances.transfer through the parsed registry") {
    val bob = Array.tabulate(32)(i => (i + 1).toByte)
    val call = b(u8(5), u8(0), u8(0) /* MultiAddress::Id */, bob,
      cp(12345678L))
    val meta = RuntimeMeta(100, 10, calls = Seq.empty,
      events = Seq.empty, pallets = parsed.pallets)
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), meta)
    assert(node.section == "balances" && node.method == "transfer")
    assert(node.args ==
      s"""{"dest":"${Codec.bytesToHex(bob)}","value":12345678}""")
  }

  test("v13 NMap storage entries parse (and the rest is unchanged)") {
    val staking = module("Staking", 7,
      storage = Some("Staking" -> Seq(
        nmapEntry("ErasStakers", Seq("EraIndex", "T::AccountId"),
          "T::Balance"),
        plainEntry("HistoryDepth", "u32"))),
      calls = None, events = None)
    val p13 = MetadataV14.parseAll(blob(13, system, staking))
    assert(p13.storageShapes(("staking", "ErasStakers")) == U128)
    assert(p13.storageShapes(("staking", "HistoryDepth")) == U32)
    assert(p13.pallets.map(_.name) == Seq("system", "staking"))
  }

  // ---- pre-v12 (v9-v11): position-implicit module indices + the old
  // indices Address codec ----

  private def moduleNoIndex(name: String,
      storage: Option[(String, Seq[Array[Byte]])],
      calls: Option[Seq[Array[Byte]]],
      events: Option[Seq[Array[Byte]]],
      constants: Seq[Array[Byte]] = Seq.empty,
      errors: Seq[Array[Byte]] = Seq.empty): Array[Byte] =
    b(str(name),
      storage.map { case (p, es) => some(b(str(p), vecOf(es: _*))) }
        .getOrElse(none),
      calls.map(cs => some(vecOf(cs: _*))).getOrElse(none),
      events.map(es => some(vecOf(es: _*))).getOrElse(none),
      vecOf(constants: _*), vecOf(errors: _*)) // NO trailing index byte

  private def blobPre12(version: Int,
      modules: Array[Byte]*): Array[Byte] =
    b(u32le(0x6174656dL), u8(version), vecOf(modules: _*),
      // v11 appends extrinsic metadata; v9/v10 end at the modules vec —
      // either way the parser stops reading after the modules
      if (version >= 11)
        b(u8(4), vecOf(str("CheckSpecVersion"))) else Array.empty[Byte])

  private val systemV11 = moduleNoIndex("System",
    storage = Some("System" -> Seq(
      plainEntry("Number", "T::BlockNumber"))),
    calls = Some(Seq(fn("remark", "remark" -> "Vec<u8>"))),
    events = Some(Seq(ev("NewAccount", "T::AccountId"))))

  private val indicesV11 = moduleNoIndex("Indices",
    storage = None, calls = None, events = None)

  private val balancesV11 = moduleNoIndex("Balances",
    storage = Some("Balances" -> Seq(
      plainEntry("TotalIssuance", "T::Balance"))),
    calls = Some(Seq(
      fn("transfer",
        "dest" -> "<T::Lookup as StaticLookup>::Source",
        "value" -> "Compact<T::Balance>"),
      fn("force_transfer",
        "source" -> "T::Address",
        "dest" -> "T::Address",
        "value" -> "Compact<T::Balance>"))),
    events = Some(Seq(
      ev("Transfer", "T::AccountId", "T::AccountId", "T::Balance"))))

  private lazy val parsedV11 =
    MetadataV14.parseAll(blobPre12(11, systemV11, indicesV11, balancesV11))

  test("v11 modules parse with POSITION-implicit indices") {
    assert(parsedV11.pallets.map(p => (p.index, p.name)) ==
      Seq(0 -> "system", 1 -> "indices", 2 -> "balances"))
    val bal = parsedV11.pallets.find(_.name == "balances").get
    // Address-family names resolve to the indices codec pre-v12
    assert(bal.calls.head ==
      ItemDef(0, "transfer",
        Seq("dest" -> LegacyAddress, "value" -> CompactInt)))
    assert(bal.calls(1).fields.map(_._2) ==
      Seq(LegacyAddress, LegacyAddress, CompactInt))
    assert(parsedV11.storageShapes(("balances", "TotalIssuance")) == U128)
  }

  test("v9/v10 parse identically (no extrinsic trailer)") {
    for (v <- Seq(9, 10)) {
      val p = MetadataV14.parseAll(blobPre12(v, systemV11, balancesV11))
      assert(p.pallets.map(x => (x.index, x.name)) ==
        Seq(0 -> "system", 1 -> "balances"), s"v$v")
      assert(p.pallets(1).calls.head.fields.head._2 == LegacyAddress)
    }
  }

  test("decodes a v11-era transfer: 0xff AccountId dest form") {
    val bob = Array.tabulate(32)(i => (i + 1).toByte)
    // pallet index 2 = position of Balances; call 0 = transfer;
    // dest = 0xff ‖ AccountId32; value compact
    val call = b(u8(2), u8(0), u8(0xff), bob, cp(987654L))
    val meta = RuntimeMeta(5, 1, calls = Seq.empty,
      events = Seq.empty, pallets = parsedV11.pallets)
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), meta)
    assert(node.section == "balances" && node.method == "transfer")
    // the 0xff form normalizes to the same 0x-hex as MultiAddress::Id
    assert(node.args ==
      s"""{"dest":"${Codec.bytesToHex(bob)}","value":987654}""")
  }

  test("decodes the legacy Address index forms") {
    val meta = RuntimeMeta(5, 1, calls = Seq.empty,
      events = Seq.empty, pallets = parsedV11.pallets)
    // 1-byte form: the discriminator byte IS the index (0x00-0xef)
    val oneByte = b(u8(2), u8(0), u8(0x2a), cp(7L))
    val n1 = BlockDecode.decodeCall(new BlockDecode.Cursor(oneByte), meta)
    assert(n1.args == """{"dest":42,"value":7}""")
    // 0xfd form: u32 LE index follows
    val u32Form = b(u8(2), u8(0), u8(0xfd), u32le(1000000L), cp(8L))
    val n2 = BlockDecode.decodeCall(new BlockDecode.Cursor(u32Form), meta)
    assert(n2.args == """{"dest":1000000,"value":8}""")
  }

  test("v12 keeps MultiAddress semantics for the same type names") {
    // the SAME type-name string means a different wire codec across the
    // v11→v12 boundary; the version byte decides
    val bal12 = parsed.pallets.find(_.name == "balances").get
    assert(bal12.calls.head.fields.head._2 == MultiAddress)
  }

  test("type-name grammar corners: tuples, arrays, nesting") {
    import MetadataLegacy.parseTypeName
    assert(parseTypeName("(T::AccountId, Balance)") ==
      Tup(Seq(AccountId, U128)))
    assert(parseTypeName("[u8; 20]") == FixedBytes(20))
    assert(parseTypeName("[u32; 3]") == Tup(Seq(U32, U32, U32)))
    assert(parseTypeName("Vec<(ParaId, Option<(T::AccountId, bool)>)>") ==
      Vec(Tup(Seq(U32, Opt(Tup(Seq(AccountId, Bool)))))))
    assert(parseTypeName("Box<T::Call>") == CallType)
    assert(parseTypeName("()") == Tup(Seq.empty))
    assert(parseTypeName("BoundedVec<u8, MaxLen>") == Bytes)
    assert(parseTypeName("Vec<u32>") == Vec(U32))
    intercept[IllegalArgumentException](parseTypeName("Weird<T>"))
  }
}
