package graft.functions

/** Keccak-256 (the pre-NIST padding variant Ethereum uses), implemented
  * from the public Keccak specification. Round constants and rotation
  * offsets are *generated* from the spec's LFSR / rho definitions rather
  * than transcribed, and validated by golden vectors in KeccakSpec
  * (empty-input digest, the canonical ERC-20 `Transfer(...)` topic).
  * Needed for the EVM face (SURVEY P11): event-topic signatures and
  * address hashing (ref ethTool.js usage of keccak over ABI signatures).
  */
object Keccak {

  // round constants from the spec's LFSR: rc(t) over GF(2),
  // x^8 + x^6 + x^5 + x^4 + 1
  private val RC: Array[Long] = {
    var lfsr = 1
    def rcBit(): Int = {
      val b = lfsr & 1
      lfsr <<= 1
      if ((lfsr & 0x100) != 0) lfsr ^= 0x171
      b
    }
    Array.fill(24) {
      var c = 0L
      for (j <- 0 to 6) {
        val bitPos = (1 << j) - 1 // bit positions 0,1,3,7,15,31,63
        if (rcBit() == 1) c |= 1L << bitPos
      }
      c
    }
  }

  // rotation offsets from the rho step definition: starting at (1,0),
  // (x,y) -> (y, 2x+3y), offset(t) = (t+1)(t+2)/2 mod 64
  private val Rho: Array[Array[Int]] = {
    val r = Array.ofDim[Int](5, 5)
    var x = 1
    var y = 0
    for (t <- 0 until 24) {
      r(x)(y) = ((t + 1) * (t + 2) / 2) % 64
      val nx = y
      val ny = (2 * x + 3 * y) % 5
      x = nx
      y = ny
    }
    r
  }

  private def rotl(v: Long, n: Int): Long =
    if (n == 0) v else (v << n) | (v >>> (64 - n))

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(x + 5 * y), Rho(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^
            (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  /** keccak-256 digest (32 bytes); rate = 136 bytes. */
  def keccak256(input: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    // absorb full blocks
    var off = 0
    while (input.length - off >= rate) {
      absorb(state, input, off, rate)
      keccakF(state)
      off += rate
    }
    // final block with 0x01 … 0x80 padding (Keccak, not SHA-3's 0x06)
    val last = new Array[Byte](rate)
    System.arraycopy(input, off, last, 0, input.length - off)
    last(input.length - off) = 0x01
    last(rate - 1) = (last(rate - 1) | 0x80).toByte
    absorb(state, last, 0, rate)
    keccakF(state)
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = ((state(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def absorb(state: Array[Long], data: Array[Byte], off: Int,
      rate: Int): Unit = {
    var i = 0
    while (i < rate / 8) {
      var lane = 0L
      var j = 7
      while (j >= 0) {
        lane = (lane << 8) | (data(off + 8 * i + j) & 0xffL)
        j -= 1
      }
      state(i) ^= lane
      i += 1
    }
  }

  /** Event-signature topic hash, e.g.
    * `topic("Transfer(address,address,uint256)")`. */
  def topic(signature: String): String =
    Codec.bytesToHex(keccak256(signature.getBytes("UTF-8")))
}
