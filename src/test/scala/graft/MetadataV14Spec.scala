package graft

import graft.decode.{BlockDecode, MetaDecode, MetadataV14}
import graft.decode.BlockDecode.RuntimeMeta
import graft.decode.MetaDecode._
import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite

/** Metadata v14 blob → PalletDef registry → raw byte decode, end to
  * end: the fixture below is a genuine v14-format blob (magic, portable
  * type registry, pallets with storage/constants to skip over) ENCODED
  * by the test and PARSED by MetadataV14 — then a raw `proxy.addProxy`
  * extrinsic decodes through the PARSED registry (no hand-written
  * PalletDef anywhere), closing the P1 "onboard a chain from its
  * metadata hex" step (ref crawler.js:1621-1628, indexer.js:6676). */
class MetadataV14Spec extends AnyFunSuite {

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

  private def field(name: Option[String], ty: Long): Array[Byte] =
    b(name.map(n => some(str(n))).getOrElse(none), cp(ty),
      none /* type_name */, vecOf() /* docs */)

  private def variant(name: String, fields: Seq[Array[Byte]],
      idx: Int): Array[Byte] =
    b(str(name), vecOf(fields: _*), u8(idx), vecOf() /* docs */)

  /** One registry entry: id ‖ Si1Type{path, params, def, docs}. */
  private def typ(id: Long, path: Seq[String],
      defBytes: Array[Byte]): Array[Byte] =
    b(cp(id), vecOf(path.map(str): _*), vecOf() /* type_params */,
      defBytes, vecOf() /* docs */)

  private def composite(fields: Array[Byte]*) = b(u8(0), vecOf(fields: _*))
  private def variants(vs: Array[Byte]*) = b(u8(1), vecOf(vs: _*))
  private def sequence(elem: Long) = b(u8(2), cp(elem))
  private def array(len: Int, elem: Long) = b(u8(3), u32le(len), cp(elem))
  private def primitive(p: Int) = b(u8(5), u8(p))
  private def compactOf(elem: Long) = b(u8(6), cp(elem))

  // ---- the fixture registry ----
  // ids: 0=u8 1=u32 2=u128 3=AccountId32 4=[u8;32] 5=MultiAddress
  // 6=ProxyType(holey) 7=Compact<u128> 8=Vec<AccountId32>
  // 9=Option<Timepoint> 10=Timepoint 11=RuntimeCall 12=u16 13=str
  // 14=proxy Call 15=multisig Call 16=proxy Event
  private val registry = vecOf(
    typ(0, Seq.empty, primitive(3)),
    typ(1, Seq.empty, primitive(5)),
    typ(2, Seq.empty, primitive(7)),
    typ(3, Seq("sp_core", "crypto", "AccountId32"),
      composite(field(None, 4))),
    typ(4, Seq.empty, array(32, 0)),
    typ(5, Seq("sp_runtime", "multiaddress", "MultiAddress"),
      variants(variant("Id", Seq(field(None, 3)), 0))),
    // deliberate HOLE at index 1 (a retired variant): Any=0, Governance=2
    typ(6, Seq("runtime", "ProxyType"),
      variants(variant("Any", Seq.empty, 0),
        variant("Governance", Seq.empty, 2),
        variant("Staking", Seq.empty, 3))),
    typ(7, Seq.empty, compactOf(2)),
    typ(8, Seq.empty, sequence(3)),
    typ(9, Seq("Option"),
      variants(variant("None", Seq.empty, 0),
        variant("Some", Seq(field(None, 10)), 1))),
    typ(10, Seq("pallet_multisig", "Timepoint"),
      composite(field(Some("height"), 1), field(Some("index"), 1))),
    // self-referential runtime call enum — resolve() must break the
    // cycle via the path, never read this def as a field type
    typ(11, Seq("runtime", "RuntimeCall"),
      variants(variant("Proxy", Seq(field(None, 14)), 29))),
    typ(12, Seq.empty, primitive(4)),
    typ(13, Seq.empty, primitive(2)),
    typ(14, Seq("pallet_proxy", "pallet", "Call"),
      variants(
        variant("add_proxy", Seq(field(Some("delegate"), 5),
          field(Some("proxy_type"), 6), field(Some("delay"), 1)), 1),
        variant("remove_proxy", Seq(field(Some("delegate"), 5),
          field(Some("proxy_type"), 6), field(Some("delay"), 1)), 2))),
    typ(15, Seq("pallet_multisig", "pallet", "Call"),
      variants(
        variant("as_multi", Seq(field(Some("threshold"), 12),
          field(Some("other_signatories"), 8),
          field(Some("maybe_timepoint"), 9),
          field(Some("call"), 11), field(Some("max_weight"), 7)), 1))),
    typ(16, Seq("pallet_proxy", "pallet", "Event"),
      variants(variant("ProxyAdded", Seq(field(Some("delegator"), 3),
        field(Some("delegatee"), 3), field(Some("proxy_type"), 6),
        field(Some("delay"), 1)), 2))),
    // 17 = BitVec<u8, Lsb0> (store type id 0 = u8; order never read)
    typ(17, Seq("bitvec", "BitVec"), b(u8(7), cp(0), cp(0))),
    typ(18, Seq.empty, primitive(11)), // i32
    typ(19, Seq.empty, primitive(13)), // i128
    // 20 = a NAMED single-field struct — must stay Struct, not unwrap
    typ(20, Seq("runtime", "Target"), composite(field(Some("who"), 3))),
    typ(21, Seq("pallet_tester", "pallet", "Call"),
      variants(variant("set_delta", Seq(field(Some("delta"), 18),
        field(Some("big"), 19), field(Some("target"), 20)), 0))))

  // storage + constants content is structurally consumed, never
  // interpreted — give Proxy both so the parser must skip them right
  private val proxyStorage = some(b(str("Proxy"), vecOf(
    b(str("Proxies"), u8(0) /* modifier */,
      u8(1) /* Map */, vecOf(u8(2) /* hasher */), cp(3), cp(8),
      b(cp(1), u8(0)) /* default bytes */, vecOf() /* docs */),
    b(str("Announcements"), u8(1), u8(0) /* Plain */, cp(1),
      b(cp(4), u8(1), u8(2), u8(3), u8(4)), vecOf()),
    b(str("Bitfields"), u8(0), u8(0) /* Plain */, cp(17),
      b(cp(1), u8(0)), vecOf()))))

  private val proxyConstants = vecOf(
    b(str("ProxyDepositBase"), cp(2), b(cp(16),
      Array.fill[Byte](16)(7)), vecOf()))

  private def palletBytes(name: String, storage: Array[Byte],
      callsTy: Option[Long], eventTy: Option[Long],
      constants: Array[Byte], errorTy: Option[Long],
      index: Int, v15Docs: Option[Seq[String]] = None): Array[Byte] =
    b(str(name), storage,
      callsTy.map(t => some(cp(t))).getOrElse(none),
      eventTy.map(t => some(cp(t))).getOrElse(none),
      constants,
      errorTy.map(t => some(cp(t))).getOrElse(none),
      u8(index),
      v15Docs.map(ds => vecOf(ds.map(str): _*)).getOrElse(Array.empty))

  private def palletsVec(v15Docs: Option[Seq[String]]) = vecOf(
    palletBytes("Proxy", proxyStorage, Some(14L), Some(16L),
      proxyConstants, Some(13L), 29, v15Docs),
    palletBytes("Multisig", none, Some(15L), None, vecOf(),
      None, 30, v15Docs),
    palletBytes("Tester", none, Some(21L), None, vecOf(),
      None, 40, v15Docs))

  private val blob = b(
    Array[Byte](0x6d, 0x65, 0x74, 0x61), // "meta"
    u8(14),
    registry,
    palletsVec(None),
    // extrinsic meta + runtime type id (unread tail)
    b(cp(11), u8(4), vecOf(), cp(11)))

  /** The SAME registry + pallets re-encoded at v15: pallets carry the
    * appended docs vec; the tail is v15's new-shape extrinsic meta +
    * runtime ty + apis + outer enums + custom — all after the point
    * the parser stops reading. */
  private val blob15 = b(
    Array[Byte](0x6d, 0x65, 0x74, 0x61),
    u8(15),
    registry,
    palletsVec(Some(Seq("pallet docs", "second line"))),
    b(u8(4), cp(5), cp(11), cp(4), cp(10), vecOf(), // extrinsic meta
      cp(11), // runtime ty
      vecOf(), // apis
      cp(11), cp(16), cp(13), // outer enums (call/event/error)
      vecOf())) // custom

  private lazy val parsed = MetadataV14.parse(blob)

  test("parses pallets, item indices, and name conventions") {
    assert(parsed.map(_.name) == Seq("proxy", "multisig", "tester"))
    val proxy = parsed.find(_.name == "proxy").get
    assert(proxy.index == 29)
    val add = proxy.calls.find(_.name == "addProxy").get
    assert(add.index == 1)
    assert(add.fields.map(_._1) == Seq("delegate", "proxyType", "delay"))
    assert(add.fields.map(_._2) == Seq(MultiAddress,
      Enum(Seq("Any" -> Seq.empty, "__unused1" -> Seq.empty,
        "Governance" -> Seq.empty, "Staking" -> Seq.empty)), U32))
    assert(proxy.events ==
      Seq(ItemDef(2, "ProxyAdded", Seq("delegator" -> AccountId,
        "delegatee" -> AccountId, "proxyType" -> add.fields(1)._2,
        "delay" -> U32))))
  }

  test("resolves nested/option/vec/compact shapes for multisig") {
    val ms = parsed.find(_.name == "multisig").get
    assert(ms.index == 30)
    assert(ms.calls == Seq(ItemDef(1, "asMulti", Seq(
      "threshold" -> U16,
      "otherSignatories" -> Vec(AccountId),
      "maybeTimepoint" -> Opt(Struct(Seq("height" -> U32,
        "index" -> U32))),
      "call" -> CallType,
      "maxWeight" -> CompactInt))))
  }

  // ---- raw bytes through the PARSED registry ----

  private val alice = Codec.hexToBytes(
    "d43593c715fdd31c61141abd04a99fd6822c8558854ccde39a5684e7a56da27d")
  private val bob = Codec.hexToBytes(
    "8eaf04151687736326c9fea17e25fc5287613693c912909cb226aa4794f26a48")

  private lazy val meta = RuntimeMeta(100, 10, calls = Seq.empty,
    events = Seq.empty, pallets = parsed)

  test("decodes a raw addProxy call through the parsed registry") {
    // pallet 29 ‖ call 1 ‖ MultiAddress::Id(bob) ‖ ProxyType tag 2 ‖
    // delay u32
    val call = b(u8(29), u8(1), u8(0), bob, u8(2), u32le(5))
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), meta)
    assert(node.section == "proxy" && node.method == "addProxy")
    assert(node.args ==
      s"""{"delegate":"${Codec.bytesToHex(bob)}",""" +
        """"proxyType":{"variant":"Governance"},"delay":5}""")
  }

  test("decodes a nested asMulti (CallType recursion) with Option") {
    val inner = b(u8(29), u8(1), u8(0), bob, u8(0), u32le(0))
    val call = b(u8(30), u8(1),
      Array.tabulate(2)(i => (i + 1).toByte).take(2), // u16 threshold LE
      cp(1), alice, // other_signatories: Vec[1]
      u8(1), u32le(77), u32le(3), // Some(Timepoint{77,3})
      inner,
      cp(42)) // max_weight
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), meta)
    assert(node.section == "multisig" && node.method == "asMulti")
    assert(node.calls.map(c => (c.section, c.method)) ==
      Seq(("proxy", "addProxy")))
    assert(node.args.contains(""""threshold":513"""))
    assert(node.args.contains(
      s""""otherSignatories":["${Codec.bytesToHex(alice)}"]"""))
    assert(node.args.contains(
      """"maybeTimepoint":{"height":77,"index":3}"""))
    assert(node.args.contains(""""maxWeight":42"""))
  }

  test("storage-key layouts surface from the blob (hashers + key types)") {
    // Proxies: Map { hashers = [2 = blake2_128concat], key = type 3
    // (AccountId32), value = type 8 }
    val parsed = MetadataV14.parseAll(blob)
    assert(parsed.storageKeys(("proxy", "Proxies")) ==
      Seq(("blake2_128concat", AccountId)))
    // Plain entries carry no key layout
    assert(!parsed.storageKeys.contains(("proxy", "Announcements")))
  }

  test("pallet constants decode to JSON (the api.consts face)") {
    // ProxyDepositBase: type 2 = u128, value = sixteen 0x07 bytes LE
    val parsed = MetadataV14.parseAll(blob)
    assert(parsed.constants(("proxy", "ProxyDepositBase")) ==
      "9341084582143408800955381380479911687")
  }

  test("storage value shapes parse and drive decodeStorageValue") {
    val shapes = MetadataV14.parseAll(blob).storageShapes
    // Proxies is a Map whose VALUE is Vec<AccountId> (type 8);
    // Announcements is Plain u32 (type 1)
    assert(shapes(("proxy", "Proxies")) == Vec(AccountId))
    assert(shapes(("proxy", "Announcements")) == U32)
    assert(!shapes.contains(("multisig", "anything")))
    // raw storage bytes decode through the PARSED shape alone
    val raw = Codec.bytesToHex(
      b(Codec.compactEncode(BigInt(2)), alice, bob))
    assert(MetaDecode.decodeStorageValue(raw,
      shapes(("proxy", "Proxies"))) ==
      s"""["${Codec.bytesToHex(alice)}","${Codec.bytesToHex(bob)}"]""")
    assert(MetaDecode.decodeStorageValue(
      Codec.bytesToHex(u32le(4100)), shapes(("proxy", "Announcements")))
      == "4100")
  }

  test("v15 envelope parses to the SAME PalletDefs and storage shapes") {
    assert(MetadataV14.parse(blob15) == parsed)
    assert(MetadataV14.parseAll(blob15).storageShapes ==
      MetadataV14.parseAll(blob).storageShapes)
  }

  test("BitSequence storage value resolves to its raw byte payload") {
    val shapes = MetadataV14.parseAll(blob).storageShapes
    assert(shapes(("proxy", "Bitfields")) == BitSeq(1))
    // 10 bits ‖ 2 store bytes (LSB-first payload stays opaque)
    val raw = Codec.bytesToHex(b(cp(10), u8(0x0f), u8(0x03)))
    assert(MetaDecode.decodeStorageValue(raw, BitSeq(1)) ==
      """{"bits":10,"value":"0x0f03"}""")
  }

  test("signed ints decode and a NAMED one-field struct stays a Struct") {
    val tester = parsed.find(_.name == "tester").get
    assert(tester.calls == Seq(ItemDef(0, "setDelta", Seq(
      "delta" -> I32, "big" -> I128,
      "target" -> Struct(Seq("who" -> AccountId))))))
    // pallet 40 ‖ call 0 ‖ i32 -5 ‖ i128 -1 ‖ Target{who: alice}
    val call = b(u8(40), u8(0), u32le(0xfffffffbL),
      Array.fill[Byte](16)(-1), alice)
    val node = BlockDecode.decodeCall(new BlockDecode.Cursor(call), meta)
    assert(node.section == "tester" && node.method == "setDelta")
    assert(node.args == s"""{"delta":-5,"big":-1,""" +
      s""""target":{"who":"${Codec.bytesToHex(alice)}"}}""")
  }

  test("rejects bad magic, unsupported versions, malformed bodies") {
    val badMagic = blob.clone(); badMagic(0) = 0x00
    assertThrows[IllegalArgumentException](MetadataV14.parse(badMagic))
    // v11 predates the supported v12-v15 window
    val badVer = blob.clone(); badVer(4) = 11
    assertThrows[IllegalArgumentException](MetadataV14.parse(badVer))
    // a v14-shaped body misdeclared as v13 routes to the legacy parser
    // and must fail as malformed, not decode to nonsense
    val misdeclared = blob.clone(); misdeclared(4) = 13
    assertThrows[Exception](MetadataV14.parse(misdeclared))
  }

  test("name conventions: lowerCamel pallet, snake_case items") {
    assert(MetadataV14.lowerCamel("DappsStaking") == "dappsStaking")
    assert(MetadataV14.snakeToCamel("bond_and_stake") == "bondAndStake")
    assert(MetadataV14.snakeToCamel("nominate") == "nominate")
  }
}
