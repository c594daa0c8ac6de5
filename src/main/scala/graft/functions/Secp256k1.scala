package graft.functions

/** secp256k1 public-key recovery (the `ecrecover` a chain indexer needs
  * to derive an EVM transaction's sender from its signature — ref
  * ethTool.js / testEthSigning.js / testElliptic.js, which wrap npm
  * `elliptic`). Implemented from the public curve parameters (SEC 2:
  * y² = x³ + 7 over F_p, p = 2²⁵⁶ − 2³² − 977) with affine BigInt
  * arithmetic — plenty for per-row recovery in a guarded UDF, and
  * anchored by the public vectors: G itself, 2G's published x, and the
  * well-known private-key-1 address 0x7e5f4552…5bdf.
  *
  * Scale note: recovery is a pure per-row map (no state, no shuffle);
  * on a 100 TB transaction scan it rides inside the projection like
  * the keccak/ss58 codecs.
  */
object Secp256k1 {

  val P: BigInt = BigInt(2).pow(256) - BigInt(2).pow(32) - 977
  val N: BigInt = BigInt(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  val Gx: BigInt = BigInt(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  val Gy: BigInt = BigInt(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)

  /** Affine point; None = point at infinity. */
  type Point = Option[(BigInt, BigInt)]
  val G: Point = Some((Gx, Gy))

  def onCurve(p: Point): Boolean = p.forall { case (x, y) =>
    (y * y - x * x * x - 7).mod(P) == 0
  }

  def add(a: Point, b: Point): Point = (a, b) match {
    case (None, _) => b
    case (_, None) => a
    case (Some((x1, y1)), Some((x2, y2))) =>
      if (x1 == x2 && (y1 + y2).mod(P) == 0) None // inverse points
      else {
        val lam =
          if (x1 == x2 && y1 == y2) // doubling
            (3 * x1 * x1).mod(P) * (2 * y1).modInverse(P)
          else (y2 - y1).mod(P) * (x2 - x1).mod(P).modInverse(P)
        val l = lam.mod(P)
        val x3 = (l * l - x1 - x2).mod(P)
        Some((x3, (l * (x1 - x3) - y1).mod(P)))
      }
  }

  def mul(k0: BigInt, p0: Point): Point = {
    var k = k0.mod(N)
    var acc: Point = None
    var p = p0
    while (k > 0) {
      if (k.testBit(0)) acc = add(acc, p)
      p = add(p, p)
      k >>= 1
    }
    acc
  }

  /** Uncompressed 64-byte public key (x ++ y, each 32-byte BE). */
  def encode(p: Point): Array[Byte] = {
    val (x, y) = p.getOrElse(
      throw new IllegalArgumentException("infinity has no encoding"))
    def be32(v: BigInt): Array[Byte] = {
      val raw = v.toByteArray.dropWhile(_ == 0)
      require(raw.length <= 32, "coordinate out of range")
      new Array[Byte](32 - raw.length) ++ raw
    }
    be32(x) ++ be32(y)
  }

  /** EVM address of a public-key point: keccak256(x ++ y) last 20
    * bytes. priv-key 1 → address of G → 0x7e5f4552…5bdf (the public
    * golden vector). */
  def ethAddress(p: Point): Array[Byte] =
    Keccak.keccak256(encode(p)).drop(12)

  /** Recover the signing public key from (msgHash, v, r, s).
    * `recId` accepts 0/1 (typed-tx yParity), the Ethereum legacy 27/28
    * form, and EIP-155 replay-protected values (35 + chainId·2 + parity
    * — what every post-2016 legacy mainnet tx carries). None when the
    * inputs name no valid point (the guarded-null contract). */
  def recover(msgHash: Array[Byte], recId0: Long, r: BigInt,
      s: BigInt): Point = {
    // Long, not Int: v = 35 + 2·chainId exceeds Int range for real
    // chainIds (Aurora 1313161554, Palm 11297108109) and a truncated v
    // could alias into a valid recId and recover the wrong address.
    val recId: Long =
      if (recId0 >= 35) (recId0 - 35) % 2 // EIP-155: v = 35 + 2·chainId + p
      else if (recId0 >= 27) recId0 - 27
      else recId0
    if (recId < 0 || recId > 1 || r <= 0 || r >= N || s <= 0 || s >= N)
      return None
    val x = r // recId 2/3 (r + N overflow) not produced by EVM chains
    // y² = x³ + 7; p ≡ 3 (mod 4) → sqrt = pow((p+1)/4)
    val ySq = (x * x * x + 7).mod(P)
    val y0 = ySq.modPow((P + 1) / 4, P)
    if ((y0 * y0).mod(P) != ySq) return None // x not on curve
    val y = if (y0.testBit(0) == (recId == 1L)) y0 else P - y0
    val e = BigInt(1, msgHash)
    val rInv = r.modInverse(N)
    // Q = r⁻¹(s·R − e·G)
    mul(rInv, add(mul(s, Some((x, y))), mul((N - e).mod(N), G)))
  }

  /** Hex-string convenience for the UDF surface: 0x-address or null. */
  def recoverAddressHex(msgHashHex: String, v: Long, rHex: String,
      sHex: String): String =
    try {
      val p = recover(Codec.hexToBytes(msgHashHex), v,
        BigInt(1, Codec.hexToBytes(rHex)), BigInt(1, Codec.hexToBytes(sHex)))
      if (p.isEmpty) null else Codec.bytesToHex(ethAddress(p))
    } catch { case _: Exception => null }

  /** Test/fixture helper: sign with explicit nonce (NOT for production
    * key handling — the library's job is recovery; this exists so specs
    * can build valid signatures deterministically). Returns (recId, r, s). */
  def signWithNonce(msgHash: Array[Byte], priv: BigInt,
      k: BigInt): (Int, BigInt, BigInt) = {
    val Some((kx, ky)) = mul(k, G): @unchecked
    val r = kx.mod(N)
    require(r != 0, "bad nonce")
    val e = BigInt(1, msgHash)
    val s = (k.modInverse(N) * (e + r * priv)).mod(N)
    require(s != 0, "bad nonce")
    // recId parity of R.y (x < N always here)
    (if (ky.testBit(0)) 1 else 0, r, s)
  }
}
