package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** XCM v1 MultiLocation encoding + interior-key parsing (ref
  * paraTool.js:1237 `convert_xcmInteriorKey_to_xcmV1MultiLocation`,
  * xcmmanager.js:937-1003 `make_multilocation` /
  * `calculateMultilocationDerivative`, testmultilocation.js shapes).
  *
  * The reference leans on polkadot-js `createType('XcmV1MultiLocation')`
  * for the SCALE bytes; here the junction subset the fixtures exercise
  * is encoded directly from the public type definitions:
  * MultiLocation = { parents: u8, interior: Junctions } with
  * Junctions ∈ Here(0) | X1(1)..X8(8), junction enum indices
  * Parachain=0 (compact u32), AccountId32=1 (network ++ [u8;32]),
  * AccountKey20=3 (network ++ [u8;20]), PalletInstance=4 (u8),
  * GeneralIndex=5 (compact u128), GeneralKey=6 (compact-length bytes),
  * NetworkId ∈ Any(0) | Named(1, bytes) | Polkadot(2) | Kusama(3).
  *
  * The encoding is pinned end-to-end by the reference's own public
  * golden vector: the (paraID 1000, Alice AccountKey20) descend-origin
  * derivative blake2_256(compact(8) ++ "multiloc" ++ SCALE(loc)) —
  * XcmLocationSpec asserts the exact 20/32-byte addresses quoted in
  * xcmmanager.js:985.
  */
object XcmLocation {

  sealed trait Junction
  final case class Parachain(id: Long) extends Junction
  final case class AccountId32(network: Option[String], id: Array[Byte])
      extends Junction
  final case class AccountKey20(network: Option[String], key: Array[Byte])
      extends Junction
  final case class PalletInstance(index: Int) extends Junction
  final case class GeneralIndex(value: BigInt) extends Junction
  final case class GeneralKey(bytes: Array[Byte]) extends Junction

  /** NetworkId: None = Any; Some("polkadot"/"kusama") = dedicated
    * variants; any other name = Named(bytes). */
  private def encodeNetwork(network: Option[String]): Array[Byte] =
    network match {
      case None => Array(0.toByte)
      case Some("polkadot") => Array(2.toByte)
      case Some("kusama") => Array(3.toByte)
      case Some(named) =>
        val b = named.getBytes("US-ASCII")
        Array(1.toByte) ++ Codec.compactEncode(BigInt(b.length)) ++ b
    }

  private def encodeJunction(j: Junction): Array[Byte] = j match {
    case Parachain(id) =>
      Array(0.toByte) ++ Codec.compactEncode(BigInt(id))
    case AccountId32(net, id) =>
      require(id.length == 32, "AccountId32 needs 32 bytes")
      Array(1.toByte) ++ encodeNetwork(net) ++ id
    case AccountKey20(net, key) =>
      require(key.length == 20, "AccountKey20 needs 20 bytes")
      Array(3.toByte) ++ encodeNetwork(net) ++ key
    case PalletInstance(i) => Array(4.toByte, i.toByte)
    case GeneralIndex(v) =>
      Array(5.toByte) ++ Codec.compactEncode(v)
    case GeneralKey(b) =>
      Array(6.toByte) ++ Codec.compactEncode(BigInt(b.length)) ++ b
  }

  /** SCALE bytes of a v1 MultiLocation. Empty interior = Here. */
  def encode(parents: Int, interior: Seq[Junction]): Array[Byte] = {
    require(parents >= 0 && parents <= 255 && interior.size <= 8,
      "bad multilocation shape")
    Array(parents.toByte, interior.size.toByte) ++
      interior.flatMap(encodeJunction)
  }

  /** The descend-origin derivative account (ref xcmmanager.js:986):
    * blake2_256(compact(8) ++ "multiloc" ++ SCALE({parents:1, X1/X2})).
    * `address`: 0x-40-hex → AccountKey20, 0x-64-hex or ss58 →
    * AccountId32; either side optional (paraID-only → X1(Parachain),
    * neither → Here). Returns (first 20 bytes, full 32 bytes). */
  def multilocationDerivative(paraId: Option[Long], address: Option[String],
      network: Option[String] = None): (Array[Byte], Array[Byte]) = {
    val account: Option[Junction] = address.map { a =>
      if (a.startsWith("0x") && a.length == 42)
        AccountKey20(network, Codec.hexToBytes(a))
      else if (a.startsWith("0x") && a.length == 66)
        AccountId32(network, Codec.hexToBytes(a))
      else AccountId32(network, Codec.ss58Decode(a)._2)
    }
    val interior = (paraId.map(Parachain), account) match {
      case (Some(p), Some(acct)) => Seq(p, acct)
      case (Some(p), None) => Seq(p)
      case (None, Some(acct)) => Seq(acct)
      case (None, None) => Seq.empty
    }
    val toHash = Codec.compactEncode(BigInt(8)) ++
      "multiloc".getBytes("US-ASCII") ++ encode(1, interior)
    val h = Codec.blake2b256(toHash)
    (h.take(20), h)
  }

  private val mapper = new ObjectMapper() // thread-safe for readTree

  private def parseJunction(n: JsonNode): Junction = {
    val field = n.fieldNames().next()
    val v = n.get(field)
    field match {
      case "parachain" => Parachain(v.asLong())
      case "palletInstance" => PalletInstance(v.asInt())
      case "generalIndex" =>
        if (v.isTextual) GeneralIndex(BigInt(1, Codec.hexToBytes(v.asText())))
        else GeneralIndex(BigInt(v.asLong()))
      case "generalKey" => GeneralKey(Codec.hexToBytes(v.asText()))
      case "accountId32" =>
        AccountId32(None, Codec.hexToBytes(v.get("id").asText()))
      case "accountKey20" =>
        AccountKey20(None, Codec.hexToBytes(v.get("key").asText()))
      case other => throw new IllegalArgumentException(
        s"unsupported junction: $other")
    }
  }

  /** Parse the reference's xcmInteriorKey format — `here`, a single
    * junction object, or a JSON array of junctions, optionally suffixed
    * `~relayChain` — into the junction list (paraTool.js:1237 semantics:
    * parents is always 1, single junction → X1). */
  def parseInteriorKey(key: String): Seq[Junction] = {
    val body = key.trim.split('~')(0).trim
    if (body == "here") Seq.empty
    else {
      val node = mapper.readTree(body)
      if (node.isArray)
        (0 until node.size()).map(i => parseJunction(node.get(i)))
      else Seq(parseJunction(node))
    }
  }

  /** xcmInteriorKey → SCALE bytes of the v1 MultiLocation (hex), the
    * join key the XCM analytics use for destination resolution. Null-in
    * null-out, null on malformed (guarded-null UDF policy). */
  def interiorKeyToBytesHex(key: String): String =
    if (key == null) null
    else
      try Codec.bytesToHex(encode(1, parseInteriorKey(key)))
      catch { case _: Exception => null }

  /** The beneficiary account a MultiLocation names, as 0x-hex: the
    * AccountId32 id (a substrate pubkey) or the AccountKey20 key (an
    * H160, matched raw on EVM chains). Null when the location has no
    * account junction or is malformed. */
  def destAccountHex(key: String): String =
    if (key == null) null
    else
      try parseInteriorKey(key).collectFirst {
        case AccountId32(_, id) => Codec.bytesToHex(id)
        case AccountKey20(_, k) => Codec.bytesToHex(k)
      }.orNull
      catch { case _: Exception => null }

  /** The destination chain a MultiLocation names: the Parachain
    * junction's id, or -1 for the relay (`here` / no parachain). */
  def destParaId(key: String): java.lang.Long =
    if (key == null) null
    else
      try parseInteriorKey(key)
        .collectFirst { case Parachain(id) => Long.box(id) }
        .getOrElse(Long.box(-1L))
      catch { case _: Exception => null }
}
