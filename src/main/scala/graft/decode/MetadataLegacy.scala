package graft.decode

import graft.decode.BlockDecode.Cursor
import graft.decode.MetaDecode._

/** Historical metadata v9-v13 blob parser — the pre-scale-info formats
  * early-era blocks were authored under (ref crawler.js:1621-1628
  * follows whatever version `state_getMetadata` returns; a backfill of
  * 2019-2021 block ranges gets v9-v13 answers — Polkadot's first ~5M
  * blocks serve v11-and-earlier). Unlike v14+ there is
  * no type registry: every call argument, event field and storage
  * value carries a Rust TYPE NAME string ("Compact<T::Balance>",
  * "Vec<(AccountId, Balance)>"), so the resolver here is a small
  * type-name grammar over the public substrate alias vocabulary
  * instead of an id graph walk.
  *
  * Wire differences across the family, all handled here:
  *   - v9/v10/v11: NO explicit module index byte — a module's dispatch
  *     index is its POSITION in the modules vec (v12 made it explicit);
  *   - v9/v10/v11: `Address`-family type names mean the old indices
  *     `Address<AccountId, AccountIndex>` codec
  *     ([[MetaDecode.LegacyAddress]]: 0xff ‖ AccountId32, or a
  *     compact-family index form), not the MultiAddress enum;
  *   - v13 added NMap storage entries;
  *   - hasher enums grew across v9→v11 (Twox64Concat, Identity) but
  *     stay one byte on the wire, so no shape change.
  *
  * Resolution is per-ITEM lenient: one exotic type name drops that
  * call/event (its index simply stays undecodable, as it would be for
  * a truly unknown pallet), never the chain. Storage entries are
  * lenient the same way, mirroring the v14 path.
  */
object MetadataLegacy {

  // SCALE primitive readers are shared with MetadataV14 (one layer)
  import MetadataV14.{str, vec, opt}

  private def skipBytes(c: Cursor): Unit = { c.take(c.compact().toInt); () }
  private def docs(c: Cursor): Unit = { vec(c)(str(c)); () }

  private final case class RawFn(name: String, args: Seq[(String, String)])
  private final case class RawEv(name: String, args: Seq[String])
  private final case class RawStore(name: String, valueTy: String,
      keys: Seq[(Int, String)] = Seq.empty) // (hasher enum, key type name)
  private final case class RawConst(name: String, ty: String,
      value: Array[Byte])
  private final case class RawModule(name: String, storage: Seq[RawStore],
      calls: Option[Seq[RawFn]], events: Option[Seq[RawEv]],
      consts: Seq[RawConst], index: Int)

  private def storageEntry(c: Cursor, v13: Boolean): RawStore = {
    val name = str(c)
    c.u8() // modifier (Optional/Default)
    val entry = c.u8() match {
      case 0 => RawStore(name, str(c)) // Plain(value)
      case 1 => // Map { hasher, key, value, unused }
        val h = c.u8(); val k = str(c); val v = str(c); c.u8()
        RawStore(name, v, Seq(h -> k))
      case 2 => // DoubleMap { hasher, key1, key2, value, key2_hasher }
        val h1 = c.u8(); val k1 = str(c); val k2 = str(c)
        val v = str(c); val h2 = c.u8()
        RawStore(name, v, Seq(h1 -> k1, h2 -> k2))
      case 3 if v13 => // NMap { keys, hashers, value }
        val ks = vec(c)(str(c)); val hs = vec(c)(c.u8())
        RawStore(name, str(c), hs.zip(ks))
      case x => throw new IllegalArgumentException(
        s"storage entry type tag $x (v13=$v13)")
    }
    skipBytes(c) // default value bytes
    docs(c)
    entry
  }

  /** Version-correct StorageHasher enums: the table GREW across
    * upgrades (v10 inserted Blake2_128Concat at 2, v11 appended
    * Identity), so the same byte means different hashers per version. */
  private def hasherName(version: Int, tag: Int): String =
    if (version <= 9) tag match {
      case 0 => "blake2_128"; case 1 => "blake2_256"
      case 2 => "twox128"; case 3 => "twox256"
      case 4 => "twox64concat"
      case t => throw new IllegalArgumentException(s"v9 hasher $t")
    }
    else if (version == 10) tag match {
      case 0 => "blake2_128"; case 1 => "blake2_256"
      case 2 => "blake2_128concat"; case 3 => "twox128"
      case 4 => "twox256"; case 5 => "twox64concat"
      case t => throw new IllegalArgumentException(s"v10 hasher $t")
    }
    else MetadataV14.HasherNames.getOrElse(tag,
      throw new IllegalArgumentException(s"v$version hasher $tag"))

  private def module(c: Cursor, v13: Boolean,
      explicitIndex: Boolean): RawModule = {
    val name = str(c)
    val storage = opt(c) {
      str(c) // prefix
      vec(c)(storageEntry(c, v13))
    }.getOrElse(Seq.empty)
    val calls = opt(c)(vec(c) {
      val n = str(c)
      val args = vec(c) { val an = str(c); val ty = str(c); (an, ty) }
      docs(c)
      RawFn(n, args)
    })
    val events = opt(c)(vec(c) {
      val n = str(c)
      val args = vec(c)(str(c))
      docs(c)
      RawEv(n, args)
    })
    val consts = vec(c) { // constants: name ‖ type name ‖ value bytes
      val cn = str(c); val ty = str(c)
      val value = c.take(c.compact().toInt)
      docs(c)
      RawConst(cn, ty, value)
    }
    vec(c) { str(c); docs(c) } // errors
    // v12+ carries the dispatch index explicitly (runtimes had begun
    // retiring pallets, leaving holes); pre-v12 the POSITION is the
    // index — parseFrom assigns it after the vec read
    val index = if (explicitIndex) c.u8() else -1
    RawModule(name, storage, calls, events, consts, index)
  }

  // ---- the type-name grammar ----

  /** Split `s` on commas at nesting depth 0 of any of `<( [`. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' | '(' | '[' => depth += 1
        case '>' | ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = s.substring(start)
    if (last.trim.nonEmpty || out.nonEmpty) out += last
    out.toSeq.map(_.trim)
  }

  /** The public-substrate alias vocabulary for plain (non-generic)
    * names; the last `::`-path segment is what arrives here, so
    * "T::AccountId" and "<T::Lookup as StaticLookup>::Source" resolve
    * by their tails. */
  private val aliases: Map[String, SType] = Map(
    "u8" -> U8, "u16" -> U16, "u32" -> U32, "u64" -> U64,
    "u128" -> U128, "u256" -> U256,
    "i8" -> I8, "i16" -> I16, "i32" -> I32, "i64" -> I64,
    "i128" -> I128, "i256" -> I256,
    "bool" -> Bool, "char" -> CharT,
    "Text" -> Str, "String" -> Str, "str" -> Str,
    "AccountId" -> AccountId, "AccountId32" -> AccountId,
    "Address" -> MultiAddress, "LookupSource" -> MultiAddress,
    "Source" -> MultiAddress, "MultiAddress" -> MultiAddress,
    // overridden to LegacyAddress for v9-v11 blobs (see parseTypeName)
    "Balance" -> U128, "BalanceOf" -> U128, "Amount" -> U128,
    "AssetBalance" -> U128,
    "BlockNumber" -> U32, "AccountIndex" -> U32, "Index" -> U32,
    "Nonce" -> U32, "EraIndex" -> U32, "SessionIndex" -> U32,
    "ParaId" -> U32, "MemberCount" -> U32, "ProposalIndex" -> U32,
    "PropIndex" -> U32, "ReferendumIndex" -> U32,
    "RegistrarIndex" -> U32, "AuctionIndex" -> U32, "LeasePeriod" -> U32,
    "Perbill" -> U32, "Permill" -> U32,
    "Percent" -> U8, "Perquintill" -> U64,
    "Moment" -> U64, "Weight" -> U64, "Timestamp" -> U64,
    "Hash" -> FixedBytes(32), "H256" -> FixedBytes(32),
    "H160" -> FixedBytes(20), "H512" -> FixedBytes(64),
    "Bytes" -> Bytes, "Key" -> Bytes,
    "KeyValue" -> Tup(Seq(Bytes, Bytes)),
    "Call" -> CallType, "Proposal" -> CallType,
    "()" -> Tup(Seq.empty))

  /** The alias names that meant the old indices Address codec before
    * the MultiAddress runtime upgrade (pre-v12 metadata era). */
  private val addressNames = Set("Address", "LookupSource", "Source")

  /** Parse one legacy type-name string into the SType vocabulary.
    * Throws on names outside it (callers are per-item lenient).
    * `legacyAddr` (v9-v11 blobs) routes the Address-family names to the
    * indices [[LegacyAddress]] wire codec instead of MultiAddress —
    * polkadot-js does the same via spec-version-gated registry
    * overrides (ref crawler.js:1621-1628 just delegates there). */
  private[graft] def parseTypeName(t0: String,
      legacyAddr: Boolean = false): SType = {
    val t = t0.trim
    if (t.isEmpty) throw new IllegalArgumentException("empty type name")
    if (t.startsWith("(")) {
      require(t.endsWith(")"), s"unbalanced tuple '$t0'")
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) Tup(Seq.empty)
      else Tup(splitTop(inner).map(parseTypeName(_, legacyAddr)))
    } else if (t.startsWith("[")) {
      require(t.endsWith("]"), s"unbalanced array '$t0'")
      val inner = t.substring(1, t.length - 1)
      val cut = inner.lastIndexOf(';')
      require(cut > 0, s"fixed array without length '$t0'")
      val elem = inner.substring(0, cut).trim
      val n = inner.substring(cut + 1).trim.toInt
      if (elem == "u8") FixedBytes(n)
      else Tup(Seq.fill(n)(parseTypeName(elem, legacyAddr)))
    } else if (t.contains('<') && t.endsWith(">")) {
      val lt = t.indexOf('<')
      val name = tail(t.substring(0, lt))
      val args = splitTop(t.substring(lt + 1, t.length - 1))
      name match {
        case "Vec" | "BoundedVec" | "WeakBoundedVec" =>
          // same normalization as the v14 path's DSequence(u8) → Bytes:
          // byte blobs decode as one hex string, not a per-byte array,
          // so args-JSON is identical across the v13/v14 upgrade
          parseTypeName(args.head, legacyAddr) match {
            case U8 => Bytes
            case e => Vec(e)
          }
        case "Option" => Opt(parseTypeName(args.head, legacyAddr))
        // every Compact<integer-ish> wire shape is one compact int
        case "Compact" => CompactInt
        case "Box" => parseTypeName(args.head, legacyAddr)
        case "PhantomData" => Tup(Seq.empty)
        case "BalanceOf" => U128
        case _ => throw new IllegalArgumentException(
          s"unknown legacy generic '$t0'")
      }
    } else {
      val name = tail(t)
      if (legacyAddr && addressNames(name)) LegacyAddress
      else aliases.getOrElse(name, throw new IllegalArgumentException(
        s"unknown legacy type name '$t0'"))
    }
  }

  /** Last `::`-path segment ("T::AccountId" → "AccountId",
    * "<T::Lookup as StaticLookup>::Source" → "Source"). */
  private def tail(s: String): String = {
    val x = s.trim
    val i = x.lastIndexOf("::")
    (if (i >= 0) x.substring(i + 2) else x).trim
  }

  /** Parse a v9-v13 body (cursor positioned AFTER magic+version; the
    * [[MetadataV14.parseAll]] front door dispatches here). */
  private[decode] def parseFrom(c: Cursor,
      version: Int): MetadataV14.ParsedMetadata = {
    require(version >= 9 && version <= 13,
      s"legacy parser handles v9-v13, got v$version")
    val v13 = version == 13
    val explicitIndex = version >= 12
    val legacyAddr = version <= 11
    val modules0 = vec(c)(module(c, v13, explicitIndex))
    val modules =
      if (explicitIndex) modules0
      else modules0.zipWithIndex.map { case (m, i) => m.copy(index = i) }
    // v11+ extrinsic metadata (version u8 + signed extension names)
    // follows; nothing below needs it
    val defs = modules.map { m =>
      val calls = m.calls.getOrElse(Seq.empty).zipWithIndex.flatMap {
        case (f, i) =>
          scala.util.Try(ItemDef(i, MetadataV14.snakeToCamel(f.name),
            f.args.map { case (an, ty) =>
              MetadataV14.snakeToCamel(an) -> parseTypeName(ty, legacyAddr)
            })).toOption
      }
      val events = m.events.getOrElse(Seq.empty).zipWithIndex.flatMap {
        case (e, i) =>
          scala.util.Try(ItemDef(i, e.name,
            e.args.zipWithIndex.map { case (ty, j) =>
              s"_$j" -> parseTypeName(ty, legacyAddr)
            })).toOption
      }
      PalletDef(m.index, MetadataV14.lowerCamel(m.name), calls, events)
    }
    val shapes = modules.flatMap { m =>
      m.storage.flatMap(s =>
        scala.util.Try(parseTypeName(s.valueTy, legacyAddr)).toOption
          .map(t => (MetadataV14.lowerCamel(m.name), s.name) -> t))
    }.toMap
    val consts = modules.flatMap { m =>
      m.consts.flatMap(k =>
        scala.util.Try {
          val json = MetaDecode.decodeStorageValue(
            graft.functions.Codec.bytesToHex(k.value),
            parseTypeName(k.ty, legacyAddr))
          (MetadataV14.lowerCamel(m.name), k.name) -> json
        }.toOption)
    }.toMap
    val keys = modules.flatMap { m =>
      m.storage.filter(_.keys.nonEmpty).flatMap(s =>
        scala.util.Try {
          (MetadataV14.lowerCamel(m.name), s.name) ->
            s.keys.map { case (h, kt) =>
              (hasherName(version, h), parseTypeName(kt, legacyAddr))
            }
        }.toOption)
    }.toMap
    MetadataV14.ParsedMetadata(defs, shapes, consts, keys)
  }
}
