package graft.decode

import graft.decode.BlockDecode.Cursor
import graft.functions.{CallFlatten, Codec}

/** Metadata-driven SCALE decode — the P1 ceiling raise (ref
  * indexer.js:6676-6807 decodeRawBlock, which resolves ANY pallet
  * through the @polkadot/api type registry built from on-chain
  * metadata). This is the Spark-side equivalent for the common type
  * shapes substrate metadata v14 expresses: primitives, compact,
  * AccountId/MultiAddress, length-prefixed bytes/strings, Vec, Option,
  * tuples, named structs, tagged enums, and nested calls.
  *
  * A pallet described here needs NO hand-written dispatch table: the
  * decoder interprets the field layout directly, so onboarding a new
  * chain's pallet is a metadata definition, not Scala code
  * (BlockDecodeSpec proves a table-free pallet decodes end-to-end).
  * Hand tables keep priority where both exist — the fixture corpus
  * stays golden.
  *
  * Scale shape: the metadata rides inside [[BlockDecode.RuntimeMeta]]
  * through the task closure exactly like the hand tables — a few KB per
  * spec version, decoded per-row map-side, no shuffle impact.
  */
object MetaDecode {

  /** The SCALE type shapes the generic decoder interprets. */
  sealed trait SType
  case object U8 extends SType
  case object U16 extends SType
  case object U32 extends SType
  case object U64 extends SType
  case object U128 extends SType // fixed 16-byte LE
  case object U256 extends SType // fixed 32-byte LE
  // signed fixed-width LE two's complement (scale-info primitives 9-14;
  // one signed arg anywhere in a chain's call/event graph used to make
  // the whole registry throw — chains DO use them, e.g. pooled staking
  // deltas and EVM chain-id fields)
  case object I8 extends SType
  case object I16 extends SType
  case object I32 extends SType
  case object I64 extends SType
  case object I128 extends SType
  case object I256 extends SType
  case object CharT extends SType // u32 Unicode scalar
  case object Bool extends SType
  case object CompactInt extends SType // compact-encoded integer
  case object AccountId extends SType // 32 raw bytes → 0x-hex
  case object MultiAddress extends SType // variant 0x00 = Id(AccountId)
  /** Pre-MultiAddress indices `Address<AccountId, AccountIndex>` wire
    * form (the dest type every v9-v11-era extrinsic carries): leading
    * byte 0x00-0xef IS a 1-byte account index; 0xfc/0xfd/0xfe prefix a
    * u16/u32/u64 index; 0xff prefixes a raw 32-byte AccountId. */
  case object LegacyAddress extends SType
  case object Bytes extends SType // compact len ‖ raw bytes → 0x-hex
  /** Fixed-width byte array ([u8; n] — hashes, keys) → 0x-hex. */
  final case class FixedBytes(n: Int) extends SType
  case object Str extends SType // compact len ‖ utf8 → JSON string
  case object CallType extends SType // one nested call
  final case class Vec(elem: SType) extends SType
  final case class Opt(elem: SType) extends SType
  final case class Tup(elems: Seq[SType]) extends SType
  final case class Struct(fields: Seq[(String, SType)]) extends SType
  /** Tagged union: variant index = position; fields may be empty
    * (unit variant). */
  final case class Enum(variants: Seq[(String, Seq[(String, SType)])])
      extends SType
  /** BitSequence (`BitVec<Store, Order>`): compact bit-length ‖ store
    * words, decoded to the raw byte payload (availability bitfields
    * and vote bitmaps are consumed as opaque bytes downstream —
    * bit-order interpretation is the reader's concern, like in
    * polkadot-js's Raw-to-hex rendering). `wordBytes` sizes the padded
    * tail: ceil(bits / (8·wordBytes)) store words. */
  final case class BitSeq(wordBytes: Int) extends SType

  /** One callable item; `index` is the variant index within the
    * pallet's call (or event) enum — explicit, because runtime
    * upgrades leave holes. */
  final case class ItemDef(index: Int, name: String,
      fields: Seq[(String, SType)])

  /** One pallet as metadata describes it. */
  final case class PalletDef(index: Int, name: String,
      calls: Seq[ItemDef] = Seq.empty, events: Seq[ItemDef] = Seq.empty)

  /** Fixed wire width in BYTES of a shape, when it has one — the input
    * of storage-key offset derivation (variable-width shapes return
    * None). */
  def fixedWidth(t: SType): Option[Int] = t match {
    case U8 | I8 | Bool => Some(1)
    case U16 | I16 => Some(2)
    case U32 | I32 | CharT => Some(4)
    case U64 | I64 => Some(8)
    case U128 | I128 => Some(16)
    case U256 | I256 => Some(32)
    case AccountId => Some(32)
    case FixedBytes(n) => Some(n)
    case Tup(elems) =>
      val ws = elems.map(fixedWidth)
      if (ws.forall(_.isDefined)) Some(ws.flatten.sum) else None
    case Struct(fields) =>
      val ws = fields.map(f => fixedWidth(f._2))
      if (ws.forall(_.isDefined)) Some(ws.flatten.sum) else None
    case _ => None // compact/bytes/str/vec/opt/enum/call: variable
  }

  def findCall(pallets: Seq[PalletDef], pallet: Int,
      call: Int): Option[(PalletDef, ItemDef)] =
    for {
      pd <- pallets.find(_.index == pallet)
      cd <- pd.calls.find(_.index == call)
    } yield (pd, cd)

  def findEvent(pallets: Seq[PalletDef], pallet: Int,
      event: Int): Option[(PalletDef, ItemDef)] =
    for {
      pd <- pallets.find(_.index == pallet)
      ed <- pd.events.find(_.index == event)
    } yield (pd, ed)

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def hx(b: Array[Byte]): String = Codec.bytesToHex(b)

  /** Decode one value of shape `t` from the cursor into a JSON
    * fragment. Nested calls are decoded through `decodeCall` (supplied
    * by BlockDecode so hand tables and metadata pallets compose) and
    * accumulated into `kids` — the call TREE stays structural for the
    * P4 flattener while the JSON carries a reference. */
  def decodeValue(c: Cursor, t: SType,
      decodeCall: Cursor => CallFlatten.CallNode,
      kids: scala.collection.mutable.Buffer[CallFlatten.CallNode]): String =
    t match {
      case U8 => c.u8().toString
      case U16 => (c.u8() | (c.u8() << 8)).toString
      case U32 => c.u32().toString
      case U64 =>
        // two u32 LE halves — BigInt keeps the unsigned top bit honest
        val lo = c.u32(); val hi = c.u32()
        ((BigInt(hi) << 32) | BigInt(lo)).toString
      case U128 => c.u128().toString
      case U256 => BigInt(1, c.take(32).reverse).toString
      case I8 => c.u8().toByte.toString
      case I16 => (c.u8() | (c.u8() << 8)).toShort.toString
      case I32 => c.u32().toInt.toString
      case I64 =>
        val lo = c.u32(); val hi = c.u32()
        ((hi.toInt.toLong << 32) | lo).toString
      case I128 => BigInt(c.take(16).reverse).toString // BE 2's-compl ctor
      case I256 => BigInt(c.take(32).reverse).toString
      case CharT =>
        val cp = c.u32().toInt
        s""""${jsonEscape(new String(Character.toChars(cp)))}""""
      case Bool => c.u8() match {
        case 0 => "false"
        case 1 => "true"
        case v => throw new IllegalArgumentException(s"bad bool $v")
      }
      case CompactInt => c.compact().toString
      case AccountId => s""""${hx(c.take(32))}""""
      case MultiAddress =>
        val at = c.u8()
        require(at == 0, s"unsupported MultiAddress variant $at")
        s""""${hx(c.take(32))}""""
      case LegacyAddress => c.u8() match {
        // account-id form normalizes to the same 0x-hex string as
        // MultiAddress::Id, so args-JSON is stable across the
        // indices-Address → MultiAddress runtime upgrade
        case 0xff => s""""${hx(c.take(32))}""""
        case 0xfc => (c.u8() | (c.u8() << 8)).toString
        case 0xfd => c.u32().toString
        case 0xfe =>
          val lo = c.u32(); val hi = c.u32()
          ((BigInt(hi) << 32) | BigInt(lo)).toString
        case i if i <= 0xef => i.toString // the byte IS the index
        case v => throw new IllegalArgumentException(
          f"bad legacy Address discriminator 0x$v%02x")
      }
      case Bytes =>
        val len = c.compact().toInt
        s""""${hx(c.take(len))}""""
      case FixedBytes(n) => s""""${hx(c.take(n))}""""
      case Str =>
        val len = c.compact().toInt
        s""""${jsonEscape(new String(c.take(len), "UTF-8"))}""""
      case CallType =>
        val node = decodeCall(c)
        kids += node
        s""""<call:${node.section}.${node.method}>""""
      case Vec(elem) =>
        val n = c.compact().toInt
        (0 until n).map(_ => decodeValue(c, elem, decodeCall, kids))
          .mkString("[", ",", "]")
      case Opt(elem) => c.u8() match {
        case 0 => "null"
        case 1 => decodeValue(c, elem, decodeCall, kids)
        case v => throw new IllegalArgumentException(s"bad Option tag $v")
      }
      case Tup(elems) =>
        elems.map(e => decodeValue(c, e, decodeCall, kids))
          .mkString("[", ",", "]")
      case Struct(fields) =>
        fields.map { case (name, ft) =>
          s""""$name":${decodeValue(c, ft, decodeCall, kids)}"""
        }.mkString("{", ",", "}")
      case BitSeq(wordBytes) =>
        val bits = c.compact().toInt
        val words = (bits + 8 * wordBytes - 1) / (8 * wordBytes)
        s"""{"bits":$bits,"value":"${hx(c.take(words * wordBytes))}"}"""
      case Enum(variants) =>
        val tag = c.u8()
        require(tag < variants.length,
          s"enum tag $tag out of range (${variants.length} variants)")
        val (vname, vfields) = variants(tag)
        if (vfields.isEmpty) s"""{"variant":"${jsonEscape(vname)}"}"""
        else {
          val body = vfields.map { case (name, ft) =>
            s""""$name":${decodeValue(c, ft, decodeCall, kids)}"""
          }.mkString(",")
          s"""{"variant":"${jsonEscape(vname)}",$body}"""
        }
    }

  /** Decode a full field list (call args or event fields) → (JSON
    * object, nested call children). */
  def decodeFields(c: Cursor, fields: Seq[(String, SType)],
      decodeCall: Cursor => CallFlatten.CallNode)
      : (String, Seq[CallFlatten.CallNode]) = {
    val kids = scala.collection.mutable.Buffer.empty[CallFlatten.CallNode]
    val json = fields.map { case (name, ft) =>
      s""""$name":${decodeValue(c, ft, decodeCall, kids)}"""
    }.mkString("{", ",", "}")
    (json, kids.toSeq)
  }

  /** Decode a STORAGE value of shape `t` from raw hex — the third byte
    * surface next to calls and events (ref indexer.js storage decode via
    * the same registry). Trailing bytes are an error: a storage value is
    * exactly one SCALE value, and silent truncation would fabricate
    * plausible numbers from corrupt input. Nested-call shapes are not
    * valid storage. */
  def decodeStorageValue(hexStr: String, t: SType): String = {
    val c = new Cursor(Codec.hexToBytes(hexStr))
    val json = decodeValue(c, t,
      _ => throw new IllegalArgumentException(
        "storage values cannot contain calls"),
      scala.collection.mutable.Buffer.empty)
    require(c.remaining == 0,
      s"${c.remaining} trailing bytes after storage value")
    json
  }

  /** System.Account's AccountInfo shape as metadata (the storage twin of
    * BlockDecode.decodeAccountInfo). */
  val AccountInfoShape: SType = Struct(Seq(
    "nonce" -> U32, "consumers" -> U32, "providers" -> U32,
    "sufficients" -> U32,
    "data" -> Struct(Seq("free" -> U128, "reserved" -> U128,
      "frozen" -> U128, "flags" -> U128))))

  /** Ready-made definitions for the common relation/identity pallets —
    * a chain onboards them by supplying its pallet INDEX (indices shift
    * per runtime; item indices below are the mainstream polkadot
    * runtime's). These are the canonical shapes AccountRelations /
    * Identity consume, so the decode→relation pipeline works with zero
    * per-chain Scala. */
  object StandardPallets {

    val ProxyType: SType = Enum(Seq("Any" -> Seq.empty,
      "NonTransfer" -> Seq.empty, "Governance" -> Seq.empty,
      "Staking" -> Seq.empty, "IdentityJudgement" -> Seq.empty,
      "CancelProxy" -> Seq.empty, "Auction" -> Seq.empty))

    def proxy(index: Int): PalletDef = PalletDef(index, "proxy",
      calls = Seq(
        ItemDef(1, "addProxy", Seq("delegate" -> MultiAddress,
          "proxyType" -> ProxyType, "delay" -> U32)),
        ItemDef(2, "removeProxy", Seq("delegate" -> MultiAddress,
          "proxyType" -> ProxyType, "delay" -> U32))),
      events = Seq(
        ItemDef(2, "ProxyAdded", Seq("delegator" -> AccountId,
          "delegatee" -> AccountId, "proxyType" -> ProxyType,
          "delay" -> U32)),
        ItemDef(4, "ProxyRemoved", Seq("delegator" -> AccountId,
          "delegatee" -> AccountId, "proxyType" -> ProxyType,
          "delay" -> U32))))

    val Timepoint: SType = Struct(Seq("height" -> U32, "index" -> U32))

    def multisig(index: Int): PalletDef = PalletDef(index, "multisig",
      calls = Seq(
        ItemDef(1, "asMulti", Seq(
          "threshold" -> U16,
          "otherSignatories" -> Vec(AccountId),
          "maybeTimepoint" -> Opt(Timepoint),
          "call" -> CallType,
          "maxWeight" -> CompactInt)),
        ItemDef(2, "approveAsMulti", Seq(
          "threshold" -> U16,
          "otherSignatories" -> Vec(AccountId),
          "maybeTimepoint" -> Opt(Timepoint),
          "callHash" -> FixedBytes(32),
          "maxWeight" -> CompactInt))))

    val Judgement: SType = Enum(Seq(
      "Unknown" -> Seq.empty, "FeePaid" -> Seq("fee" -> U128),
      "Reasonable" -> Seq.empty, "KnownGood" -> Seq.empty,
      "OutOfDate" -> Seq.empty, "LowQuality" -> Seq.empty,
      "Erroneous" -> Seq.empty))

    /** Simplified IdentityInfo: the pallet's `Data` enum (None/Raw0-32/
      * hash forms) is flattened to plain strings here — the shape the
      * Identity dimension consumes. */
    def identity(index: Int): PalletDef = PalletDef(index, "identity",
      calls = Seq(
        ItemDef(1, "setIdentity", Seq("display" -> Str,
          "legal" -> Opt(Str), "web" -> Opt(Str))),
        ItemDef(3, "clearIdentity", Seq.empty),
        ItemDef(12, "addSub", Seq("sub" -> MultiAddress,
          "name" -> Str)),
        ItemDef(14, "removeSub", Seq("sub" -> MultiAddress))),
      events = Seq(
        ItemDef(0, "IdentitySet", Seq("who" -> AccountId)),
        ItemDef(1, "IdentityCleared", Seq("who" -> AccountId,
          "deposit" -> U128)),
        ItemDef(2, "JudgementGiven", Seq("target" -> AccountId,
          "registrarIndex" -> U32, "judgement" -> Judgement))))

    /** Contracts (ink!/WASM) pallet, pre-weights-v2 shape — the event
      * + call surface the contracts dataset composes (ref
      * substrateetl.js:2529-2607; `etl/Contracts`). `gas_limit` is the
      * legacy Compact<u64>; for runtimes past the weights-v2 upgrade
      * use [[contractsV2]] — decoding a v2 call with THIS definition
      * would misalign the SCALE cursor (one compact consumed where two
      * sit), corrupting every later arg. Dispatch per spec version,
      * like every other pallet-shape change. */
    def contracts(index: Int): PalletDef = PalletDef(index, "contracts",
      calls = Seq(
        ItemDef(6, "call", Seq(
          "dest" -> MultiAddress,
          "value" -> CompactInt,
          "gas_limit" -> CompactInt,
          "storage_deposit_limit" -> Opt(CompactInt),
          "data" -> Bytes))),
      events = Seq(
        ItemDef(0, "Instantiated", Seq(
          "deployer" -> AccountId, "contract" -> AccountId)),
        ItemDef(1, "Terminated", Seq(
          "contract" -> AccountId, "beneficiary" -> AccountId)),
        ItemDef(2, "CodeStored", Seq("code_hash" -> FixedBytes(32)))))

    /** Weights-v2 era contracts pallet (Astar/Shiden since 2023):
      * `gas_limit` is sp_weights::Weight — a struct of two compacts —
      * which renders as a JSON OBJECT, exactly what the export's
      * isNumeric gate zeroes (the reference's behavior for v2 calls,
      * substrateetl.js:2584); CodeStored grew deposit_held +
      * uploader. */
    def contractsV2(index: Int): PalletDef = PalletDef(index,
      "contracts",
      calls = Seq(
        ItemDef(6, "call", Seq(
          "dest" -> MultiAddress,
          "value" -> CompactInt,
          "gas_limit" -> Struct(Seq(
            "ref_time" -> CompactInt, "proof_size" -> CompactInt)),
          "storage_deposit_limit" -> Opt(CompactInt),
          "data" -> Bytes))),
      events = Seq(
        ItemDef(0, "Instantiated", Seq(
          "deployer" -> AccountId, "contract" -> AccountId)),
        ItemDef(1, "Terminated", Seq(
          "contract" -> AccountId, "beneficiary" -> AccountId)),
        ItemDef(2, "CodeStored", Seq(
          "code_hash" -> FixedBytes(32),
          "deposit_held" -> U128,
          "uploader" -> AccountId))))

    /** Astar-style dApp-staking pallet (ref chains/astar.js:889):
      * the Reward event names its smart contract as an Evm(H160) /
      * Wasm(AccountId32) enum. */
    def dappsStaking(index: Int): PalletDef = PalletDef(index,
      "dappsStaking",
      calls = Seq(
        ItemDef(3, "bondAndStake", Seq(
          "contract" -> Enum(Seq(
            "Evm" -> Seq("address" -> FixedBytes(20)),
            "Wasm" -> Seq("account" -> AccountId))),
          "value" -> CompactInt))),
      events = Seq(
        ItemDef(5, "Reward", Seq(
          "account" -> AccountId,
          "contract" -> Enum(Seq(
            "Evm" -> Seq("address" -> FixedBytes(20)),
            "Wasm" -> Seq("account" -> AccountId))),
          "era" -> U32,
          "amount" -> U128))))

    /** Staking pallet subset — `nominate` is the input of the
      * nominator→validator edge build (ref docs/StakingAnalytics.md:
      * stakings rows with `targets` arrays, exploded in SQL). The
      * `bond` call stays in the hand tables (BlockDecode). */
    def staking(index: Int): PalletDef = PalletDef(index, "staking",
      calls = Seq(
        ItemDef(5, "nominate", Seq("targets" -> Vec(MultiAddress))),
        ItemDef(6, "chill", Seq.empty),
        ItemDef(2, "unbond", Seq("value" -> CompactInt))),
      events = Seq(
        ItemDef(3, "Unbonded", Seq("stash" -> AccountId,
          "amount" -> U128)),
        // era marker for the P7 reward extraction (ref
        // indexer.js:3946 — the era variable source); field name
        // matches pallet_staking's PayoutStarted(era_index, stash)
        ItemDef(8, "PayoutStarted", Seq("eraIndex" -> U32,
          "validatorStash" -> AccountId))))

    /** Crowdloan pallet — the P7 reward/crowdloan extraction input
      * (ref substrateetl crowdloan export). */
    def crowdloan(index: Int): PalletDef = PalletDef(index, "crowdloan",
      calls = Seq(
        ItemDef(1, "contribute", Seq("index" -> CompactInt,
          "value" -> CompactInt, "signature" -> Opt(Bytes))),
        ItemDef(5, "withdraw", Seq("who" -> MultiAddress,
          "index" -> CompactInt))),
      events = Seq(
        ItemDef(2, "Contributed", Seq("who" -> AccountId,
          "fundIndex" -> U32, "amount" -> U128)),
        ItemDef(3, "Withdrew", Seq("who" -> AccountId,
          "fundIndex" -> U32, "amount" -> U128)),
        // memo pairing for the P7 crowdloan extraction (ref
        // indexer.js:4035 MemoUpdated branch)
        ItemDef(7, "MemoUpdated", Seq("who" -> AccountId,
          "paraId" -> U32, "memo" -> Bytes))))

    def vesting(index: Int): PalletDef = PalletDef(index, "vesting",
      calls = Seq(
        ItemDef(0, "vest", Seq.empty),
        ItemDef(1, "vestOther", Seq("target" -> MultiAddress)),
        ItemDef(2, "vestedTransfer", Seq("target" -> MultiAddress,
          "schedule" -> Struct(Seq("locked" -> U128,
            "perBlock" -> U128, "startingBlock" -> U32))))),
      events = Seq(
        ItemDef(0, "VestingUpdated", Seq("account" -> AccountId,
          "unvested" -> U128)),
        ItemDef(1, "VestingCompleted", Seq("account" -> AccountId))))
  }
}
