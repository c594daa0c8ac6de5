package graft.functions

import java.nio.charset.StandardCharsets

/** Pure-Scala scalar codec library — the Spark port of the reference's
  * `paraTool.js` function surface (SURVEY §2.7):
  *
  *  - hex utilities              (ref paraTool.js:23-31 hexToU8a/u8aToHex)
  *  - xxhash64 / twox128/twox64  (ref paraTool.js:1785,1852 twox_128)
  *  - blake2b-256/512            (ref paraTool.js:1883 blake2_256_from_hex)
  *  - ss58 encode/decode         (ref paraTool.js:1666 getPubKey, getAddress)
  *  - SCALE compact integers     (ref substrateetl.js:6699-6754 compact-length
  *                                decode branches in parse_trace)
  *  - composite keys             (ref paraTool.js:1945 makeAssetChain /
  *                                parseAssetChain)
  *  - inverted timestamp key     (ref paraTool.js:588 inverted_ts_key)
  *
  * All algorithms implemented from their public specifications (XXH64 spec,
  * RFC 7693, SS58 registry docs, SCALE spec). Everything is pure and
  * deterministic — safe inside codegen'd UDF calls.
  */
object Codec {

  // ---------- hex ----------

  def hexToBytes(h0: String): Array[Byte] = {
    val h = if (h0.startsWith("0x") || h0.startsWith("0X")) h0.substring(2) else h0
    val s = if (h.length % 2 == 1) "0" + h else h
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def bytesToHex(b: Array[Byte], prefix: Boolean = true): String = {
    val sb = new StringBuilder(if (prefix) "0x" else "")
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  // ---------- xxhash64 (XXH64, public spec) ----------

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def readLE64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }

  private def readLE32(b: Array[Byte], i: Int): Long = {
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  }

  private def xxhRound(acc: Long, lane: Long): Long =
    rotl(acc + lane * P2, 31) * P1

  private def mergeRound(h0: Long, v: Long): Long =
    (h0 ^ xxhRound(0L, v)) * P1 + P4

  def xxh64(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = xxhRound(v1, readLE64(input, i))
          v2 = xxhRound(v2, readLE64(input, i + 8))
          v3 = xxhRound(v3, readLE64(input, i + 16))
          v4 = xxhRound(v4, readLE64(input, i + 24))
          i += 32
        }
        var hh = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        hh = mergeRound(hh, v1); hh = mergeRound(hh, v2)
        hh = mergeRound(hh, v3); hh = mergeRound(hh, v4)
        hh
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ xxhRound(0L, readLE64(input, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readLE32(input, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((input(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Substrate twox128: concat of xxh64(data, seed=0) and xxh64(data, 1),
    * each little-endian (ref paraTool.js:1785 twox_128; the well-known
    * pallet-prefix hash, e.g. twox128("System") =
    * 0x26aa394eea5630e07c48ae0c9558cef7). */
  def twox128(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    writeLE64(out, 0, xxh64(data, 0))
    writeLE64(out, 8, xxh64(data, 1))
    out
  }

  def twox64(data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8)
    writeLE64(out, 0, xxh64(data, 0))
    out
  }

  private def writeLE64(out: Array[Byte], off: Int, v0: Long): Unit = {
    var v = v0
    var j = 0
    while (j < 8) { out(off + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
  }

  // ---------- blake2b (RFC 7693) ----------

  private val Blake2bIV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  private def rotr(x: Long, r: Int): Long = (x >>> r) | (x << (64 - r))

  def blake2b(input: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen > 0 && outLen <= 64)
    val h = Blake2bIV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong // no key
    var t = 0L
    val block = new Array[Byte](128)

    def compress(chunk: Array[Byte], off: Int, last: Boolean): Unit = {
      val m = new Array[Long](16)
      var i = 0
      while (i < 16) { m(i) = readLE64Padded(chunk, off + 8 * i); i += 1 }
      val v = new Array[Long](16)
      System.arraycopy(h, 0, v, 0, 8)
      System.arraycopy(Blake2bIV, 0, v, 8, 8)
      v(12) ^= t // low word of offset counter (inputs < 2^64 bytes)
      if (last) v(14) = ~v(14)
      def g(a: Int, b: Int, c: Int, dd: Int, x: Long, y: Long): Unit = {
        v(a) = v(a) + v(b) + x
        v(dd) = rotr(v(dd) ^ v(a), 32)
        v(c) = v(c) + v(dd)
        v(b) = rotr(v(b) ^ v(c), 24)
        v(a) = v(a) + v(b) + y
        v(dd) = rotr(v(dd) ^ v(a), 16)
        v(c) = v(c) + v(dd)
        v(b) = rotr(v(b) ^ v(c), 63)
      }
      var r = 0
      while (r < 12) {
        val s = Sigma(r % 10)
        g(0, 4, 8, 12, m(s(0)), m(s(1)))
        g(1, 5, 9, 13, m(s(2)), m(s(3)))
        g(2, 6, 10, 14, m(s(4)), m(s(5)))
        g(3, 7, 11, 15, m(s(6)), m(s(7)))
        g(0, 5, 10, 15, m(s(8)), m(s(9)))
        g(1, 6, 11, 12, m(s(10)), m(s(11)))
        g(2, 7, 8, 13, m(s(12)), m(s(13)))
        g(3, 4, 9, 14, m(s(14)), m(s(15)))
        r += 1
      }
      i = 0
      while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
    }

    def readLE64Padded(b: Array[Byte], i: Int): Long = {
      var v = 0L
      var j = 7
      while (j >= 0) {
        val idx = i + j
        val byte = if (idx < b.length) b(idx) & 0xffL else 0L
        v = (v << 8) | byte
        j -= 1
      }
      v
    }

    val len = input.length
    if (len == 0) {
      t = 0
      compress(block, 0, last = true)
    } else {
      var off = 0
      while (len - off > 128) {
        t += 128
        compress(input, off, last = false)
        off += 128
      }
      java.util.Arrays.fill(block, 0.toByte)
      System.arraycopy(input, off, block, 0, len - off)
      t += (len - off)
      compress(block, 0, last = true)
    }
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  def blake2b256(input: Array[Byte]): Array[Byte] = blake2b(input, 32)
  def blake2b512(input: Array[Byte]): Array[Byte] = blake2b(input, 64)

  // ---------- base58 / ss58 ----------

  private val B58Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Index: Map[Char, Int] =
    B58Alphabet.zipWithIndex.toMap

  def base58Encode(input: Array[Byte]): String = {
    var bi = BigInt(1, input)
    val sb = new StringBuilder
    while (bi > 0) {
      val (q, r) = bi /% 58
      sb.append(B58Alphabet(r.toInt))
      bi = q
    }
    input.takeWhile(_ == 0).foreach(_ => sb.append('1'))
    sb.reverse.toString
  }

  def base58Decode(s: String): Array[Byte] = {
    var bi = BigInt(0)
    s.foreach { c =>
      bi = bi * 58 + B58Index.getOrElse(c,
        throw new IllegalArgumentException(s"bad base58 char '$c'"))
    }
    val raw = bi.toByteArray.dropWhile(_ == 0)
    val zeros = s.takeWhile(_ == '1').length
    Array.fill[Byte](zeros)(0) ++ raw
  }

  private val Ss58Prefix = "SS58PRE".getBytes(StandardCharsets.UTF_8)

  /** ss58 address from a 32-byte public key (ref paraTool.js getAddress);
    * network 0 = Polkadot, 2 = Kusama, 42 = generic substrate. */
  def ss58Encode(pubkey: Array[Byte], network: Int): String = {
    require(pubkey.length == 32, "pubkey must be 32 bytes")
    val prefix: Array[Byte] =
      if (network < 64) Array(network.toByte)
      else {
        // 14-bit two-byte form per the SS58 registry spec
        val ident = network & 0x3fff
        Array((((ident & 0xfc) >> 2) | 0x40).toByte,
          ((ident >> 8) | ((ident & 0x03) << 6)).toByte)
      }
    val body = prefix ++ pubkey
    val checksum = blake2b512(Ss58Prefix ++ body)
    base58Encode(body ++ checksum.take(2))
  }

  /** (network, pubkey) from an ss58 address (ref paraTool.js:1666
    * getPubKey). Throws on bad checksum. */
  def ss58Decode(address: String): (Int, Array[Byte]) = {
    val raw = base58Decode(address)
    val (network, bodyLen) =
      if ((raw(0) & 0xff) < 64) (raw(0) & 0xff, 1)
      else // two-byte (14-bit) form per the SS58 registry spec
        ((((raw(0) & 0x3f) << 2) | ((raw(1) & 0xff) >> 6) |
          ((raw(1) & 0x3f) << 8), 2))
    val body = raw.slice(0, bodyLen + 32)
    val check = raw.slice(bodyLen + 32, bodyLen + 34)
    val expect = blake2b512(Ss58Prefix ++ body).take(2)
    require(java.util.Arrays.equals(check, expect),
      s"ss58 checksum mismatch for $address")
    (network, raw.slice(bodyLen, bodyLen + 32))
  }

  // ---------- SCALE compact integers ----------

  /** Decode a SCALE compact integer at offset `off`; returns (value,
    * bytesConsumed) (ref substrateetl.js:6699-6754 — both compact-length
    * branches). */
  def compactDecode(b: Array[Byte], off: Int = 0): (BigInt, Int) = {
    val mode = b(off) & 0x03
    mode match {
      case 0 => (BigInt((b(off) & 0xff) >> 2), 1)
      case 1 =>
        val v = ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)) >> 2
        (BigInt(v), 2)
      case 2 =>
        val v = ((b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)) >> 2
        (BigInt(v), 4)
      case _ =>
        val n = ((b(off) & 0xff) >> 2) + 4
        val le = b.slice(off + 1, off + 1 + n)
        (BigInt(1, le.reverse), 1 + n)
    }
  }

  def compactEncode(v0: BigInt): Array[Byte] = {
    require(v0 >= 0)
    if (v0 < 64) Array((v0.toInt << 2).toByte)
    else if (v0 < (1 << 14)) {
      val v = (v0.toInt << 2) | 1
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    } else if (v0 < (1L << 30)) {
      val v = (v0.toLong << 2) | 2
      (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    } else {
      var bytes = v0.toByteArray.dropWhile(_ == 0).reverse // little-endian
      if (bytes.isEmpty) bytes = Array(0.toByte)
      require(bytes.length <= 67, "compact too large")
      Array((((bytes.length - 4) << 2) | 3).toByte) ++ bytes
    }
  }

  // ---------- mortal era (extrinsic lifetime) ----------

  /** Decode a two-byte SCALE MortalEra into (period, phase) — the
    * extrinsic lifetime (ref paraTool.js:2067 getLifetime; public SCALE
    * spec: low 4 bits of the LE u16 encode log2(period)−1, the rest the
    * quantized phase). Returns None for the immortal era (0x00). */
  def decodeMortalEra(b0: Int, b1: Int): Option[(Long, Long)] = {
    if (b0 == 0 && b1 == 0) None // immortal
    else {
      val encoded = (b0 & 0xff) | ((b1 & 0xff) << 8)
      val period = 2L << (encoded & 0x0f)
      val quantizeFactor = math.max(period >> 12, 1L)
      val phase = (encoded >> 4) * quantizeFactor
      // substrate's Era decode rejects period < 4 and phase ≥ period
      // (sp-runtime generic::Era::decode) — a malformed era must not
      // yield a bogus lifetime window downstream
      if (period >= 4 && phase < period) Some((period, phase)) else None
    }
  }

  /** Lifetime window [birth, death] for an era at `currentBlock`
    * (ref paraTool.js getLifetime: birth = largest b ≤ current with
    * b % period == phase; death = birth + period). */
  def eraLifetime(period: Long, phase: Long, currentBlock: Long): (Long, Long) = {
    val birth = currentBlock - ((currentBlock - phase) % period + period) % period
    (birth, birth + period)
  }

  /** Extract the pubkey from a System.Account storage key:
    * twox128("System") ++ twox128("Account") ++ blake2_128(pk) ++ pk —
    * the trailing 32 bytes are the raw pubkey, and the 16-byte
    * blake2_128 prefix must match (blake2_128_concat hasher;
    * ref paraTool.js:2025 parseStorageKey). Returns None if the key is
    * malformed or fails the hash check. */
  def systemAccountKeyPubkey(keyHex: String): Option[Array[Byte]] =
    try {
      val bytes = hexToBytes(keyHex)
      if (bytes.length != 16 + 16 + 16 + 32) None
      else {
        val pk = bytes.slice(48, 80)
        val h = blake2b(pk, 16)
        if (java.util.Arrays.equals(bytes.slice(32, 48), h)) Some(pk)
        else None
      }
    } catch {
      // non-hex garbage in a corrupt dump row is malformed input, not a
      // stage-killing error
      case _: NumberFormatException => None
    }

  // ---------- composite keys & time keys ----------

  /** `asset~chainID` composite (ref paraTool.js:1945 makeAssetChain). */
  def makeAssetChain(asset: String, chainId: Int): String = s"$asset~$chainId"

  def parseAssetChain(key: String): (String, Int) = {
    val i = key.lastIndexOf('~')
    (key.substring(0, i), key.substring(i + 1).toInt)
  }

  /** Reversed-timestamp sort key (ref paraTool.js:588 inverted_ts_key):
    * zero-padded so lexicographic order == reverse time order. */
  def invertedTsKey(ts: Long): String = f"${99999999999L - ts}%011d"

  /** Decimal scaling (ref paraTool.js:214 toBaseUnit / floatToInt). */
  def toBaseUnit(raw: BigInt, decimals: Int): Double =
    (BigDecimal(raw) / BigDecimal(10).pow(decimals)).toDouble

  /** Module-account name decode (ref paraTool.js:378
    * pubKey_hex2ascii): substrate runtime accounts are ASCII-tagged
    * pubkeys — `para`/`sibl` sovereign accounts and `modl` pallet
    * accounts — padded with zero bytes. Recognized prefixes decode to
    * the readable tag (letters and '/' kept in order), with any
    * leftover non-ASCII bytes (≤ 2, e.g. the LE-encoded para id)
    * appended as ":<int>"; anything else → null. Mirrors the
    * reference byte-for-byte: "0x70617261d007…00" → "para:2000". */
  def pubkeyAscii(pubkey: String): String = {
    if (pubkey == null) return null
    val inp = if (pubkey.startsWith("0x")) pubkey.substring(2) else pubkey
    // decode, don't reject — but never THROW either: this runs as the
    // keep gate over the full holder scan, so one malformed
    // address_pubkey row must not kill the snapshot job (odd-length
    // hex would index past the end; non-hex pairs would fail parseInt)
    if (inp.length < 8 || inp.length % 2 != 0) return null
    def byteAt(pos: Int): Int =
      try Integer.parseInt(inp.substring(pos, pos + 2), 16)
      catch { case _: NumberFormatException => -1 }
    val prefix = inp.substring(0, 8).toLowerCase
    if (prefix != "70617261" && prefix != "7369626c" &&
      prefix != "6d6f646c") return null
    // trim trailing zero BYTES (the fixed-width pubkey padding)
    var j = inp.length
    while (j > 2 && byteAt(j - 2) == 0) j -= 2
    val out = new StringBuilder
    var remaining = ""
    var i = 0
    while (i < j) {
      val c = byteAt(i)
      if (c == '/' || (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))
        out.append(c.toChar)
      else remaining = inp.substring(i, i + 2) + remaining
      i += 2
    }
    if (remaining.nonEmpty && remaining.length <= 4)
      // a non-hex remainder (malformed input) just drops the suffix —
      // parse BEFORE appending ':' so a failure leaves no dangling mark
      try {
        val n = Integer.parseInt(remaining, 16)
        out.append(":").append(n)
      } catch { case _: NumberFormatException => }
    out.toString
  }

  // ---------- derived account ids ----------

  /** Multisig account id (ref paraTool.js:311 computeMultisig, tested by
    * substrate/test/testMultisig.js; the pallet-utility/multisig
    * `multi_account_id` derivation from the public Substrate spec):
    * blake2_256("modlpy/utilisuba" ++ compact(n) ++ sorted 32-byte
    * pubkeys ++ u16-LE threshold). Input pubkeys in any order; they are
    * sorted bytewise here, as the runtime does. */
  def multisigAccount(pubkeys: Seq[Array[Byte]], threshold: Int): Array[Byte] = {
    require(pubkeys.nonEmpty && pubkeys.forall(_.length == 32),
      "multisig signatories must be 32-byte pubkeys")
    require(threshold >= 1 && threshold <= 0xffff, "bad threshold")
    val sorted = pubkeys.sortWith { (a, b) =>
      java.util.Arrays.compareUnsigned(a, b) < 0
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("modlpy/utilisuba".getBytes("US-ASCII"))
    out.write(compactEncode(BigInt(sorted.size)))
    sorted.foreach(out.write)
    out.write(threshold & 0xff)
    out.write((threshold >> 8) & 0xff)
    blake2b256(out.toByteArray)
  }

  /** Substrate pubkey → EVM H160 (ref paraTool.js:517 pubkey_to_h160;
    * the polkadot-js `addressToEvm` mapping: the first 20 bytes of the
    * 32-byte account id — how AccountId20 chains like Moonbeam embed
    * substrate accounts). */
  def pubkeyToH160(pubkey: Array[Byte]): Array[Byte] = {
    require(pubkey.length == 32, "pubkey must be 32 bytes")
    java.util.Arrays.copyOfRange(pubkey, 0, 20)
  }

  /** EVM H160 → substrate pubkey (ref paraTool.js:522 h160_to_pubkey;
    * polkadot-js `evmToAddress`): blake2_256("evm:" ++ h160). */
  def h160ToPubkey(h160: Array[Byte]): Array[Byte] = {
    require(h160.length == 20, "h160 must be 20 bytes")
    blake2b256("evm:".getBytes("US-ASCII") ++ h160)
  }

  /** Parachain sovereign account (ref paraTool.js:889
    * compute_sovereign_account; xcmmanager.js:933): the well-known
    * TrailingZeroInput encoding — "para" (on the relay chain) or "sibl"
    * (on sibling parachains) ++ u32-LE paraID, zero-padded to 32 bytes.
    * No hashing despite the reference's comment. */
  def sovereignAccount(paraId: Long, sibling: Boolean = false): Array[Byte] = {
    require(paraId >= 0 && paraId <= 0xffffffffL, "bad paraId")
    val out = new Array[Byte](32)
    val prefix = (if (sibling) "sibl" else "para").getBytes("US-ASCII")
    System.arraycopy(prefix, 0, out, 0, 4)
    var i = 0
    var v = paraId
    while (i < 4) { out(4 + i) = (v & 0xff).toByte; v >>= 8; i += 1 }
    out
  }
}
