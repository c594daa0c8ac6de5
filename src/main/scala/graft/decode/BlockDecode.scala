package graft.decode

import graft.functions.{CallFlatten, Codec}
import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed input row for the raw decoder (top-level for Spark encoders). */
case class RawHexBlock(
    chain_id: Int,
    number: Long,
    hash: String,
    parent_hash: String,
    block_time: java.sql.Timestamp,
    finalized: Boolean,
    author_pub: String,
    extrinsics_hex: Seq[String],
    events_hex: String)

/** Fixture-scoped raw SCALE block decode — the P1 subset (ref
  * indexer.js:6676 decodeRawBlock; spec-version resolution
  * substrateetl.js:6290 getSpecVersionForBlockNumber).
  *
  * Decodes genuinely raw bytes with the Codec primitives — compact
  * integers, pallet/call indices, MultiAddress, AccountId32, u128 LE —
  * for the scoped surface:
  *
  *  - calls: `timestamp.set`, `balances.transfer`/`transferKeepAlive`,
  *    `system.remark`, `utility.batch`/`batchAll` (recursive);
  *  - events: `balances.Transfer`/`Deposit`,
  *    `system.ExtrinsicSuccess`/`ExtrinsicFailed`;
  *  - storage: `System.Account` AccountInfo values.
  *
  * Dispatch tables are per-spec-version ([[RuntimeMeta]]): pallet/call
  * indices SHIFT across runtime upgrades, which is exactly why decode
  * resolves each block's spec_version through the as-of dimension
  * (TraceDecode.withSpecVersion) before touching the bytes. The full
  * metadata-driven decoder (arbitrary pallets from chain metadata) stays
  * out of scope per SURVEY §7.4; everything here is real SCALE layout.
  */
object BlockDecode {

  // ---- per-spec-version dispatch tables ----

  case class CallMeta(pallet: Int, call: Int, section: String, method: String)
  case class EventMeta(pallet: Int, event: Int, section: String, method: String)

  /** Per-spec-version dispatch. `pallets` is the metadata-driven tier:
    * any (pallet, call/event) index NOT in the hand tables falls back to
    * [[MetaDecode]]'s generic type-shape interpreter, so new pallets
    * decode from a metadata definition alone (P1 ceiling raise — ref
    * indexer.js:6676 registry-driven decodeRawBlock). Hand tables win
    * where both exist, keeping the fixture corpus golden. */
  case class RuntimeMeta(specVersion: Int, tokenDecimals: Int,
      calls: Seq[CallMeta], events: Seq[EventMeta],
      pallets: Seq[MetaDecode.PalletDef] = Seq.empty) {
    @transient lazy val callIdx: Map[(Int, Int), CallMeta] =
      calls.map(c => (c.pallet, c.call) -> c).toMap
    @transient lazy val eventIdx: Map[(Int, Int), EventMeta] =
      events.map(e => (e.pallet, e.event) -> e).toMap
  }

  // ---- byte cursor ----

  final class Cursor(val bytes: Array[Byte]) {
    var off: Int = 0
    def u8(): Int = { val v = bytes(off) & 0xff; off += 1; v }
    def take(n: Int): Array[Byte] = {
      // copyOfRange would silently ZERO-PAD past end-of-buffer —
      // truncated input must be an error, not fabricated zero balances
      require(off + n <= bytes.length,
        s"read of $n bytes at $off past end (${bytes.length})")
      val a = java.util.Arrays.copyOfRange(bytes, off, off + n); off += n; a
    }
    def u32(): Long = {
      var v = 0L; var i = 0
      while (i < 4) { v |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
      off += 4; v
    }
    /** Plain (non-compact) u128, little-endian — event/storage balance
      * fields use fixed 16-byte encoding, unlike compact call args. */
    def u128(): BigInt = BigInt(1, take(16).reverse)
    def compact(): BigInt = {
      val (v, n) = Codec.compactDecode(bytes, off); off += n; v
    }
    def remaining: Int = bytes.length - off
  }

  private def hx(b: Array[Byte]): String = Codec.bytesToHex(b)

  // ---- calls ----

  /** Recursive call decode → CallFlatten.CallNode (args as JSON).
    * Hand-table entries decode through the scoped cases below; anything
    * else resolves through the metadata tier ([[MetaDecode]]) before
    * being rejected as unknown. */
  def decodeCall(c: Cursor, meta: RuntimeMeta): CallFlatten.CallNode = {
    val pallet = c.u8(); val call = c.u8()
    val cm = meta.callIdx.get((pallet, call)) match {
      case Some(m) => m
      case None =>
        MetaDecode.findCall(meta.pallets, pallet, call) match {
          case Some((pd, cd)) =>
            val (json, kids) = MetaDecode.decodeFields(c, cd.fields,
              cc => decodeCall(cc, meta))
            return CallFlatten.CallNode(pd.name, cd.name, json, kids)
          case None => throw new IllegalArgumentException(
            s"unknown call index ($pallet,$call) at spec ${meta.specVersion}")
        }
    }
    (cm.section, cm.method) match {
      case ("timestamp", "set") =>
        CallFlatten.CallNode("timestamp", "set",
          s"""{"now":${c.compact()}}""", Seq.empty)
      case ("balances", "transfer") | ("balances", "transferKeepAlive") =>
        val at = c.u8()
        require(at == 0, s"unsupported MultiAddress variant $at")
        val dest = c.take(32)
        val amount = c.compact()
        CallFlatten.CallNode(cm.section, cm.method,
          s"""{"dest":"${hx(dest)}","value":$amount}""", Seq.empty)
      case ("system", "remark") =>
        val len = c.compact().toInt
        CallFlatten.CallNode("system", "remark",
          s"""{"remark":"${hx(c.take(len))}"}""", Seq.empty)
      case ("utility", "batch") | ("utility", "batchAll") =>
        val n = c.compact().toInt
        val kids = (0 until n).map(_ => decodeCall(c, meta))
        CallFlatten.CallNode(cm.section, cm.method, "{}", kids)
      case ("proxy", "proxy") =>
        // proxy(real: MultiAddress, force_proxy_type: Option<u8>, call)
        // — the second recursive wrapper the flattener must see through
        // (ref indexer.js call-tree handling of proxy.proxy)
        val at = c.u8()
        require(at == 0, s"unsupported MultiAddress variant $at")
        val real = c.take(32)
        val fpt = c.u8() match {
          case 0 => "null"
          case 1 => c.u8().toString
          case v => throw new IllegalArgumentException(s"bad Option tag $v")
        }
        val inner = decodeCall(c, meta)
        CallFlatten.CallNode(cm.section, cm.method,
          s"""{"real":"${hx(real)}","forceProxyType":$fpt}""", Seq(inner))
      case ("staking", "bond") =>
        // bond(value: compact, payee: RewardDestination u8 (+ account
        // for Account variant))
        val value = c.compact()
        val payeeTag = c.u8()
        // RewardDestination variants: Staked/Stash/Controller/
        // Account(id)/None — anything else is corrupt, reject like
        // every other unscoped shape (never a plausible wrong answer)
        require(payeeTag <= 4, s"bad RewardDestination tag $payeeTag")
        val payee =
          if (payeeTag == 3) s""""account":"${hx(c.take(32))}""""
          else s""""variant":$payeeTag"""
        CallFlatten.CallNode(cm.section, cm.method,
          s"""{"value":$value,"payee":{$payee}}""", Seq.empty)
      case other =>
        throw new IllegalArgumentException(s"unscoped call $other")
    }
  }

  case class DecodedExtrinsic(signed: Boolean, signerPub: String,
      tip: BigInt, call: CallFlatten.CallNode)

  /** v4 extrinsic envelope: compact payload length ‖ version byte
    * (0x84 signed / 0x04 unsigned) ‖ [MultiAddress::Id signer ‖ 64-byte
    * signature ‖ era ‖ compact nonce ‖ compact tip] ‖ call bytes. The
    * signature is structurally consumed, not verified (decode ≠
    * validate, same stance as the reference sidecar). */
  def decodeExtrinsic(hexStr: String, meta: RuntimeMeta): DecodedExtrinsic = {
    val c = new Cursor(Codec.hexToBytes(hexStr))
    val len = c.compact().toInt
    require(c.remaining == len,
      s"extrinsic length prefix $len != ${c.remaining} remaining bytes")
    val version = c.u8()
    require((version & 0x7f) == 4, s"unsupported extrinsic version $version")
    val signed = (version & 0x80) != 0
    var signer = ""
    var tip = BigInt(0)
    if (signed) {
      val at = c.u8()
      require(at == 0, s"unsupported MultiAddress variant $at")
      signer = hx(c.take(32))
      c.take(64) // sr25519/ed25519 signature
      val era0 = c.u8()
      if (era0 != 0) c.u8() // mortal era second byte (Codec.decodeMortalEra)
      c.compact() // nonce
      tip = c.compact()
    }
    val call = decodeCall(c, meta)
    require(c.remaining == 0, s"${c.remaining} trailing bytes after call")
    DecodedExtrinsic(signed, signer, tip, call)
  }

  /** The extrinsic hash is blake2_256 of the full raw extrinsic bytes —
    * the substrate definition, computable only because the input is
    * genuinely raw. */
  def extrinsicHash(hexStr: String): String =
    hx(Codec.blake2b256(Codec.hexToBytes(hexStr)))

  // ---- events ----

  case class DecodedEvent(extrinsicIdx: Int, section: String,
      method: String, data: String,
      transfer: Option[(String, String, BigInt)])

  /** System.Events storage value: compact record count ‖ per record:
    * phase (0x00 ApplyExtrinsic ++ u32-LE index / 0x01 Finalization /
    * 0x02 Initialization) ‖ pallet ‖ event variant ‖ fields ‖ compact
    * topic count (0 in scope). */
  def decodeEvents(hexStr: String, meta: RuntimeMeta): Seq[DecodedEvent] = {
    val c = new Cursor(Codec.hexToBytes(hexStr))
    val n = c.compact().toInt
    val out = (0 until n).map { _ =>
      val phase = c.u8()
      val exIdx = phase match {
        case 0 => c.u32().toInt
        case 1 | 2 => -1
        case p => throw new IllegalArgumentException(s"bad phase $p")
      }
      val pallet = c.u8(); val ev = c.u8()
      // hand table first (keeps transfer extraction + golden fixtures);
      // metadata tier decodes any other (pallet, event) by field shape
      val metaTier = meta.eventIdx.get((pallet, ev)) match {
        case Some(_) => None
        case None =>
          val (pd, ed) = MetaDecode.findEvent(meta.pallets, pallet, ev)
            .getOrElse(throw new IllegalArgumentException(
              s"unknown event index ($pallet,$ev) at spec ${meta.specVersion}"))
          val (json, _) = MetaDecode.decodeFields(c, ed.fields,
            cc => decodeCall(cc, meta))
          Some(DecodedEvent(exIdx, pd.name, ed.name, json, None))
      }
      if (metaTier.isDefined) {
        val topics = c.compact().toInt
        require(topics == 0, "topics are out of scope")
        metaTier.get
      } else {
      val em = meta.eventIdx((pallet, ev))
      val (data, transfer) = (em.section, em.method) match {
        case ("balances", "Transfer") =>
          val from = c.take(32); val to = c.take(32); val amt = c.u128()
          (s"""{"from":"${hx(from)}","to":"${hx(to)}","amount":$amt}""",
            Some((hx(from), hx(to), amt)))
        case ("balances", "Deposit") =>
          val who = c.take(32); val amt = c.u128()
          (s"""{"who":"${hx(who)}","amount":$amt}""", None)
        case ("system", "ExtrinsicSuccess") =>
          // DispatchInfo: Weight{compact ref_time, compact proof_size},
          // class u8, pays u8
          val refTime = c.compact(); c.compact(); c.u8(); c.u8()
          (s"""{"weight":$refTime}""", None)
        case ("system", "ExtrinsicFailed") =>
          // DispatchError ‖ DispatchInfo; Module errors carry (pallet,
          // 4-byte error code)
          val variant = c.u8()
          val err = if (variant == 3) { // DispatchError::Module
            val p = c.u8(); val code = c.u32()
            s""""module":{"pallet":$p,"error":$code}"""
          } else s""""variant":$variant"""
          c.compact(); c.compact(); c.u8(); c.u8() // DispatchInfo
          (s"{$err}", None)
        case ("staking", "Rewarded") =>
          // classic (stash, amount) form — the reward-extraction P7
          // input (ref substrateetl rewards export)
          val stash = c.take(32); val amt = c.u128()
          (s"""{"stash":"${hx(stash)}","amount":$amt}""", None)
        case ("staking", "Bonded") =>
          val stash = c.take(32); val amt = c.u128()
          (s"""{"stash":"${hx(stash)}","amount":$amt}""", None)
        case ("proxy", "ProxyExecuted") =>
          // DispatchResult: 0x00 Ok | 0x01 ++ DispatchError (Module
          // errors carry pallet + 4-byte code, same as ExtrinsicFailed)
          val ok = c.u8()
          // DispatchResult is exactly 0x00 Ok | 0x01 Err — any other
          // tag is corrupt input, reject (don't fabricate an "err" row)
          require(ok <= 1, s"bad DispatchResult tag $ok")
          val body =
            if (ok == 0) """"result":"ok""""
            else {
              val variant = c.u8()
              if (variant == 3) {
                val p = c.u8(); val code = c.u32()
                s""""result":"err","module":{"pallet":$p,"error":$code}"""
              } else s""""result":"err","variant":$variant"""
            }
          (s"{$body}", None)
        case other =>
          throw new IllegalArgumentException(s"unscoped event $other")
      }
      val topics = c.compact().toInt
      require(topics == 0, "topics are out of scope")
      DecodedEvent(exIdx, em.section, em.method, data, transfer)
      }
    }
    require(c.remaining == 0, s"${c.remaining} trailing bytes after events")
    out
  }

  // ---- storage values ----

  case class AccountInfo(nonce: Long, consumers: Long, providers: Long,
      sufficients: Long, free: BigInt, reserved: BigInt, frozen: BigInt)

  /** System.Account value: AccountInfo<u32 nonce, u32×3 refcounts,
    * AccountData{free, reserved, frozen, flags: u128 LE}> (the value the
    * P10 trace projection reads; ref substrateetl.js:6700 balance
    * decode). */
  def decodeAccountInfo(hexStr: String): AccountInfo = {
    val c = new Cursor(Codec.hexToBytes(hexStr))
    val nonce = c.u32(); val cons = c.u32()
    val prov = c.u32(); val suff = c.u32()
    val free = c.u128(); val reserved = c.u128(); val frozen = c.u128()
    AccountInfo(nonce, cons, prov, suff, free, reserved, frozen)
  }

  // ---- call tree → params JSON (CallFlatten input) ----

  def callNodeJson(n: CallFlatten.CallNode): String = {
    val kids =
      if (n.calls.isEmpty) ""
      else s""","calls":[${n.calls.map(callNodeJson).mkString(",")}]"""
    s"""{"section":"${n.section}","method":"${n.method}","args":${n.args}$kids}"""
  }

  // ---- the Dump feed ----

  /** Decode raw hex block rows into the nested [[RawBlock]] model that
    * `Dump.dumpDay` consumes — so the §3.2 pipeline runs from genuinely
    * raw bytes. Input columns: chain_id, number, hash, parent_hash,
    * block_time, finalized, author_pub, extrinsics_hex array<string>,
    * events_hex string; `specVersions(block_number, spec_version)` is
    * the upgrade dimension resolved as-of each block.
    *
    * Scale shape: the spec dimension is tiny (one row per runtime
    * upgrade), so it is collected once and shipped through the closure;
    * each block resolves its spec by binary search inside the
    * distributed map — no global window over the (enormous) raw table,
    * and `raw` is scanned exactly once. A block older than the first
    * spec entry is an explicit error, not a null. */
  def decodeBlocks(raw: DataFrame, specVersions: DataFrame,
      metas: Seq[RuntimeMeta]): Dataset[RawBlock] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val metaMap = metas.map(m => m.specVersion -> m).toMap
    val specBounds = specVersions
      .select(col("block_number").cast("long"),
        col("spec_version").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    require(specBounds.nonEmpty, "specVersions dimension is empty")
    def specFor(n: Long): Int = {
      var lo = 0; var hi = specBounds.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (specBounds(mid)._1 <= n) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      if (ans < 0) throw new IllegalArgumentException(
        s"block $n precedes the first spec-version entry " +
          s"(${specBounds.head._1})")
      specBounds(ans)._2
    }
    raw.select(col("chain_id"), col("number"), col("hash"),
        col("parent_hash"), col("block_time"), col("finalized"),
        col("author_pub"), col("extrinsics_hex"), col("events_hex"))
      .as[RawHexBlock]
      .map { b =>
        val spec = specFor(b.number)
        val meta = metaMap.getOrElse(spec,
          throw new IllegalArgumentException(
            s"no runtime metadata for spec $spec"))
        val events = decodeEvents(b.events_hex, meta)
        val extrinsics = b.extrinsics_hex.zipWithIndex.map {
          case (exHex, i) =>
            val d = decodeExtrinsic(exHex, meta)
            val evs = events.zipWithIndex.filter(_._1.extrinsicIdx == i)
              .map { case (e, gi) => RawEvent(gi, e.section, e.method, e.data) }
            val transfers = events.filter(_.extrinsicIdx == i)
              .flatMap(_.transfer).map { case (from, to, amt) =>
                RawTransfer(from, to, "native",
                  hx(amt.toByteArray.dropWhile(_ == 0) match {
                    case a if a.isEmpty => Array(0.toByte)
                    case a => a
                  }), meta.tokenDecimals)
              }
            RawExtrinsic(i, extrinsicHash(exHex), d.call.section,
              d.call.method, callNodeJson(d.call), d.signed, d.signerPub,
              Codec.toBaseUnit(d.tip, meta.tokenDecimals), evs, transfers)
        }
        RawBlock(b.chain_id, b.number, b.hash, b.parent_hash,
          b.block_time, spec, b.author_pub, b.finalized,
          extrinsics, Seq.empty[RawLog])
      }
  }
}
