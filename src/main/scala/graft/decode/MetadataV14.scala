package graft.decode

import graft.decode.BlockDecode.Cursor
import graft.decode.MetaDecode._
import graft.functions.Codec

/** Parser for substrate's self-describing metadata v14 blob → the
  * [[MetaDecode.PalletDef]] registry the generic decoder interprets —
  * the last step of the P1 ceiling: onboarding a chain becomes "point
  * at its metadata hex" instead of writing Scala pallet definitions
  * (ref crawler.js:1621-1628 refreshes the registry from on-chain
  * metadata on every runtime upgrade; indexer.js:6676 decodeRawBlock
  * resolves all pallets through it).
  *
  * Format (public: the frame-metadata / scale-info crates):
  * `"meta"` magic (u32 LE) ‖ version u8 (14 or 15) ‖
  * `types` portable registry (Vec of {id: Compact, Si1Type}) ‖
  * `pallets` (Vec of {name, storage?, calls?, event?, constants,
  * error?, index: u8}) ‖ extrinsic meta ‖ runtime type id.
  * A pallet's `calls`/`event` entry points at a Variant type in the
  * registry whose variants are the items: variant index = call/event
  * index, variant fields = the args.
  *
  * Naming follows the polkadot-js convention the rest of the repo
  * consumes: pallet → section lowerCamel (`DappsStaking` →
  * `dappsStaking`), snake_case item/field names → lowerCamel
  * (`add_proxy` → `addProxy`, `proxy_type` → `proxyType`); enum
  * VARIANT names pass through unchanged (`NonTransfer`).
  *
  * Scale shape: runs once per (chain, spec version) on the DRIVER — a
  * few hundred KB of bytes → a few KB of PalletDefs that ride the task
  * closure exactly like hand tables. Nothing here touches a DataFrame.
  */
object MetadataV14 {

  // ---- raw registry model (scale-info Si1) ----

  private final case class RawField(name: Option[String], ty: Long)
  private final case class RawVariant(name: String, fields: Seq[RawField],
      index: Int)
  private sealed trait RawDef
  private final case class DComposite(fields: Seq[RawField]) extends RawDef
  private final case class DVariant(variants: Seq[RawVariant]) extends RawDef
  private final case class DSequence(elem: Long) extends RawDef
  private final case class DArray(len: Int, elem: Long) extends RawDef
  private final case class DTuple(elems: Seq[Long]) extends RawDef
  private final case class DPrimitive(p: Int) extends RawDef
  private final case class DCompact(elem: Long) extends RawDef
  private final case class DBitSeq(store: Long, order: Long) extends RawDef
  private final case class RawType(path: Seq[String], d: RawDef)

  private final case class RawStorage(name: String, valueTy: Long,
      hashers: Seq[Int] = Seq.empty, keyTy: Option[Long] = None)
  private final case class RawConst(name: String, ty: Long,
      value: Array[Byte])
  private final case class RawPallet(name: String, callsTy: Option[Long],
      eventTy: Option[Long], storage: Seq[RawStorage],
      consts: Seq[RawConst], index: Int)

  /** Parsed registry plus the storage VALUE shapes (entry → SType),
    * the input of [[MetaDecode.decodeStorageValue]] — so storage
    * decode, like call/event decode, needs only the metadata hex —
    * plus the pallet CONSTANTS decoded to JSON ((pallet, name) →
    * value): existentialDeposit, ss58Prefix, expectedBlockTime etc.
    * are chain parameters the reference reads off `api.consts`; here
    * they come out of the same metadata blob, no RPC. Lenient like
    * storage shapes: a constant with an unsupported type drops ITS
    * entry only. */
  final case class ParsedMetadata(pallets: Seq[PalletDef],
      storageShapes: Map[(String, String), SType],
      constants: Map[(String, String), String] = Map.empty,
      /** Map-entry KEY layouts ((pallet, entry) → per-component
        * (hasher name, key SType)) — the input of
        * [[TraceDecode.keyedPrefixDimFromMetadata]], so storage-key
        * component extraction auto-onboards from the metadata blob
        * like calls/events/values/constants do. Multi-key maps (v14
        * folds NMap in) zip hashers with tuple elements; a single
        * hasher spans the whole key. */
      storageKeys: Map[(String, String), Seq[(String, SType)]] = Map.empty)

  /** The shared v11+/v14 StorageHasher enum (pre-v11 blobs use shorter
    * tables — see MetadataLegacy). */
  private[decode] val HasherNames: Map[Int, String] = Map(
    0 -> "blake2_128", 1 -> "blake2_256", 2 -> "blake2_128concat",
    3 -> "twox128", 4 -> "twox256", 5 -> "twox64concat",
    6 -> "identity")

  // ---- SCALE readers over the shared Cursor (shared with the
  // legacy v12/v13 parser — one primitive layer, not two copies) ----

  private[decode] def str(c: Cursor): String =
    new String(c.take(c.compact().toInt), "UTF-8")

  private[decode] def vec[A](c: Cursor)(read: => A): Seq[A] =
    Seq.fill(c.compact().toInt)(read)

  private[decode] def opt[A](c: Cursor)(read: => A): Option[A] =
    c.u8() match {
      case 0 => None
      case 1 => Some(read)
      case v => throw new IllegalArgumentException(s"bad Option tag $v")
    }

  private def field(c: Cursor): RawField = {
    val name = opt(c)(str(c))
    val ty = c.compact().toLong
    opt(c)(str(c)) // type_name — display only
    vec(c)(str(c)) // docs
    RawField(name, ty)
  }

  private def typeDef(c: Cursor): RawDef = c.u8() match {
    case 0 => DComposite(vec(c)(field(c)))
    case 1 => DVariant(vec(c) {
      val name = str(c)
      val fields = vec(c)(field(c))
      val index = c.u8()
      vec(c)(str(c)) // docs
      RawVariant(name, fields, index)
    })
    case 2 => DSequence(c.compact().toLong)
    case 3 => DArray(c.u32().toInt, c.compact().toLong)
    case 4 => DTuple(vec(c)(c.compact().toLong))
    case 5 => DPrimitive(c.u8())
    case 6 => DCompact(c.compact().toLong)
    case 7 => DBitSeq(c.compact().toLong, c.compact().toLong)
    case v => throw new IllegalArgumentException(s"bad TypeDef tag $v")
  }

  private def si1Type(c: Cursor): RawType = {
    val path = vec(c)(str(c))
    vec(c) { // type_params
      str(c); opt(c)(c.compact())
    }
    val d = typeDef(c)
    vec(c)(str(c)) // docs
    RawType(path, d)
  }

  /** One storage entry: keep (name, value-type id) — the VALUE shape is
    * what [[MetaDecode.decodeStorageValue]] interprets; hashers/keys
    * are consumed structurally (key decode is the storage-KEY surface,
    * out of scope here like in TraceDecode). */
  private def storageEntry(c: Cursor): RawStorage = {
    val name = str(c)
    c.u8() // modifier
    val entry = c.u8() match { // ty
      case 0 => RawStorage(name, c.compact().toLong) // Plain(type)
      case 1 => // Map { hashers, key, value }
        val hashers = vec(c)(c.u8())
        val keyTy = c.compact().toLong
        RawStorage(name, c.compact().toLong, hashers, Some(keyTy))
      case v => throw new IllegalArgumentException(s"bad storage ty $v")
    }
    val defLen = c.compact().toInt // default bytes
    c.take(defLen)
    vec(c)(str(c)) // docs
    entry
  }

  private def pallet(c: Cursor, v15: Boolean): RawPallet = {
    val name = str(c)
    val storage = opt(c) { // storage
      str(c) // prefix
      vec(c)(storageEntry(c))
    }.getOrElse(Seq.empty)
    val callsTy = opt(c)(c.compact().toLong)
    val eventTy = opt(c)(c.compact().toLong)
    val consts = vec(c) { // constants: name ‖ type id ‖ value bytes
      val cn = str(c); val ty = c.compact().toLong
      val value = c.take(c.compact().toInt)
      vec(c)(str(c)) // docs
      RawConst(cn, ty, value)
    }
    opt(c)(c.compact()) // error
    val index = c.u8()
    if (v15) vec(c)(str(c)) // v15 appends pallet docs
    RawPallet(name, callsTy, eventTy, storage, consts, index)
  }

  // ---- name conventions ----

  private[graft] def lowerCamel(s: String): String =
    if (s.isEmpty) s else s"${s.head.toLower}${s.tail}"

  private[graft] def snakeToCamel(s: String): String = {
    val parts = s.split("_").filter(_.nonEmpty)
    if (parts.isEmpty) s
    else (parts.head +: parts.tail.map(p =>
      s"${p.head.toUpper}${p.tail}")).mkString
  }

  // ---- typeId → SType resolution ----

  /** scale-info Si1TypeDefPrimitive, full vocabulary: 0 bool, 1 char,
    * 2 str, 3-8 u8..u256, 9-14 i8..i256. */
  private val Primitives: Map[Int, SType] = Map(
    0 -> Bool, 1 -> CharT, 2 -> Str, 3 -> U8, 4 -> U16, 5 -> U32,
    6 -> U64, 7 -> U128, 8 -> U256, 9 -> I8, 10 -> I16, 11 -> I32,
    12 -> I64, 13 -> I128, 14 -> I256)

  private final class Resolver(types: Map[Long, RawType]) {
    private val memo = scala.collection.mutable.Map.empty[Long, SType]
    private val inFlight = scala.collection.mutable.Set.empty[Long]

    private def raw(id: Long): RawType = types.getOrElse(id,
      throw new IllegalArgumentException(s"unknown type id $id"))

    def resolve(id: Long): SType = memo.getOrElseUpdate(id, {
      val t = raw(id)
      val last = t.path.lastOption.getOrElse("")
      // cycle-breakers BEFORE recursing: the runtime call enum is
      // self-referential by construction (batch wraps calls)
      if (last == "RuntimeCall" || last == "Call") CallType
      else if (last == "AccountId32") AccountId
      else if (last == "MultiAddress") MultiAddress
      else {
        require(inFlight.add(id),
          s"unsupported recursive type $id (${t.path.mkString("::")})")
        try resolveDef(t)
        finally inFlight.remove(id)
      }
    })

    private def named(fields: Seq[RawField]): Seq[(String, SType)] =
      fields.zipWithIndex.map { case (f, i) =>
        f.name.map(snakeToCamel).getOrElse(s"_$i") -> resolve(f.ty)
      }

    private def resolveDef(t: RawType): SType = t.d match {
      case DPrimitive(p) => Primitives.getOrElse(p,
        throw new IllegalArgumentException(s"unsupported primitive $p"))
      case DCompact(_) => CompactInt
      case DSequence(e) => resolve(e) match {
        case U8 => Bytes
        case other => Vec(other)
      }
      case DArray(n, e) => resolve(e) match {
        case U8 => FixedBytes(n)
        case other => Tup(Seq.fill(n)(other))
      }
      case DTuple(es) => Tup(es.map(resolve))
      // newtype unwrap is conventional ONLY for the unnamed single
      // field (struct X(T)); a named one-field struct {who: T} keeps
      // its Struct shape, matching the polkadot-js JSON rendering
      case DComposite(Seq(one)) if one.name.isEmpty => resolve(one.ty)
      case DComposite(fs) if fs.forall(_.name.isDefined) =>
        Struct(named(fs))
      case DComposite(fs) => Tup(fs.map(f => resolve(f.ty)))
      case DVariant(vs)
          if t.path.lastOption.contains("Option") &&
            vs.map(_.name).sorted == Seq("None", "Some") =>
        Opt(resolve(vs.find(_.name == "Some").get.fields.head.ty))
      case DVariant(vs) => denseEnum(vs)
      // availability bitfields / vote bitmaps: keep the raw payload,
      // sized by the store word (order only affects bit reading, not
      // the byte layout)
      case DBitSeq(store, _) => resolve(store) match {
        case U8 => BitSeq(1)
        case U16 => BitSeq(2)
        case U32 => BitSeq(4)
        case U64 => BitSeq(8)
        case other => throw new IllegalArgumentException(
          s"BitSequence store must be u8/u16/u32/u64, got $other " +
            s"(${t.path.mkString("::")})")
      }
    }

    /** [[MetaDecode.Enum]] decodes the tag POSITIONALLY, while metadata
      * variant indices may have holes (runtime upgrades retire
      * variants) — place each variant at its declared index and plug
      * holes with unit placeholders. */
    private def denseEnum(vs: Seq[RawVariant]): Enum = {
      val maxIdx = vs.map(_.index).max
      require(maxIdx < 256, s"enum index $maxIdx out of u8 range")
      val byIdx = vs.map(v => v.index -> v).toMap
      Enum((0 to maxIdx).map { i =>
        byIdx.get(i) match {
          case Some(v) => v.name -> named(v.fields)
          case None => s"__unused$i" -> Seq.empty
        }
      })
    }

    /** A pallet's calls/event type must be a Variant; each variant is
      * one item with its declared (possibly holey) index. */
    def items(id: Long): Seq[ItemDef] = raw(id).d match {
      case DVariant(vs) => vs.map(v =>
        ItemDef(v.index, snakeToCamel(v.name), named(v.fields)))
      case other => throw new IllegalArgumentException(
        s"pallet item type $id is ${other.getClass.getSimpleName}, " +
          "expected Variant")
    }
  }

  // ---- entry points ----

  /** Parse a full metadata v14 blob: PalletDef registry + storage
    * value shapes. */
  def parseAll(bytes: Array[Byte]): ParsedMetadata = {
    val c = new Cursor(bytes)
    val magic = c.u32()
    require(magic == 0x6174656dL,
      f"bad metadata magic 0x$magic%08x (want 0x6174656d 'meta')")
    val version = c.u8()
    // v15 (what current Polkadot runtimes serve — ref crawler.js
    // follows whatever the runtime returns across upgrades) keeps the
    // same type-registry and pallet layout as v14 except pallets gain
    // a trailing docs vec; its extra sections (new-shape extrinsic
    // meta, runtime APIs, outer enums, custom values) all sit AFTER
    // the pallets, where this parser stops reading anyway.
    // historical v9-v13 blobs (pre-scale-info: type NAMES, no
    // registry) route to the legacy grammar parser — same output model.
    // v9-v11 (Polkadot's first ~5M blocks) differ from v12/v13 by
    // position-implicit module indices and the pre-MultiAddress
    // indices Address codec; MetadataLegacy handles all of it.
    if (version >= 9 && version <= 13)
      return MetadataLegacy.parseFrom(c, version)
    require(version == 14 || version == 15,
      s"unsupported metadata version $version (v9-v15 supported)")
    val types = vec(c) {
      val id = c.compact().toLong
      id -> si1Type(c)
    }.toMap
    val pallets = vec(c)(pallet(c, version == 15))
    // extrinsic meta + runtime type id (+ v15's apis/outer-enums/
    // custom sections) follow; nothing below needs them
    val r = new Resolver(types)
    val defs = pallets.map { p =>
      PalletDef(p.index, lowerCamel(p.name),
        calls = p.callsTy.map(r.items).getOrElse(Seq.empty),
        events = p.eventTy.map(r.items).getOrElse(Seq.empty))
    }
    // lenient: a storage value outside the supported shape set (e.g.
    // BitSequence) drops ITS entry, not the whole chain's registry —
    // calls/events stay strict because items() is the decode contract
    val shapes = pallets.flatMap { p =>
      p.storage.flatMap(s =>
        scala.util.Try(r.resolve(s.valueTy)).toOption
          .map(t => (lowerCamel(p.name), s.name) -> t))
    }.toMap
    val consts = pallets.flatMap { p =>
      p.consts.flatMap(k =>
        scala.util.Try {
          val json = MetaDecode.decodeStorageValue(
            Codec.bytesToHex(k.value), r.resolve(k.ty))
          (lowerCamel(p.name), k.name) -> json
        }.toOption)
    }.toMap
    val keys = pallets.flatMap { p =>
      p.storage.flatMap(s => s.keyTy.flatMap(kt =>
        scala.util.Try {
          val names = s.hashers.map(HasherNames)
          val comps = r.resolve(kt) match {
            // one hasher per tuple element when counts line up;
            // otherwise a single hasher spans the whole (tuple) key
            case Tup(elems) if elems.size == names.size =>
              names.zip(elems)
            case whole => Seq((names.head, whole))
          }
          (lowerCamel(p.name), s.name) -> comps
        }.toOption))
    }.toMap
    ParsedMetadata(defs, shapes, consts, keys)
  }

  /** Parse a metadata v14 blob into the PalletDef registry. */
  def parse(bytes: Array[Byte]): Seq[PalletDef] = parseAll(bytes).pallets

  /** Parse from the 0x-hex form chain RPCs return
    * (`state_getMetadata`). */
  def parseHex(hex: String): Seq[PalletDef] =
    parse(Codec.hexToBytes(hex))
}
