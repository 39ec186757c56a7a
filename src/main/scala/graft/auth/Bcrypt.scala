package graft.auth

import java.math.BigInteger
import java.nio.charset.StandardCharsets

/** bcrypt (OpenBSD Blowfish password hashing), pure Scala — closes the
  * documented divergence where the reference hashes with bcrypt at
  * DefaultCost=10 (ref: server/core/auth.go:215-237, users.go:63,
  * edit_dashboard.go:242-276 via golang.org/x/crypto/bcrypt) while this
  * repo previously only had PBKDF2. Stored `$2a$`/`$2b$`/`$2y$` hashes
  * from a reference deployment now verify unchanged.
  *
  * The algorithm is public (Provos & Mazières, "A Future-Adaptable
  * Password Scheme", USENIX 1999): EksBlowfish key setup with
  * cost-controlled rounds, then 64 ECB encryptions of the magic string
  * "OrpheanBeholderScryDoubt".
  *
  * The initial P-array and S-boxes are, by definition, the first 1042
  * 32-bit words of the hexadecimal expansion of pi. Every C/Go/Java
  * implementation embeds them as a 4 KB literal table; here they are
  * computed once per JVM with an integer Bailey–Borwein–Plouffe series
  * (pi's hex digits fall straight out of it), which keeps the source
  * compact and makes the table self-verifying: the spec asserts
  * P(0) == 0x243F6A88 and the public crypt_blowfish test vectors pin
  * every downstream byte.
  */
object Bcrypt {

  val DefaultCost = 10 // golang.org/x/crypto/bcrypt DefaultCost
  val MinCost = 4
  val MaxCost = 31

  /** First `n` fractional hex digits of pi as packed 32-bit words.
    * floor(16^N * pi) is accumulated with the BBP series
    * pi = sum_k 16^-k (4/(8k+1) - 2/(8k+4) - 1/(8k+5) - 1/(8k+6))
    * in pure integer arithmetic: the power term is a right-shift per
    * iteration and each partial is one small-divisor BigInteger
    * division. Truncation error is < 4 ulp per term, so 10 guard
    * digits cover the ~8.4k terms with orders of magnitude to spare.
    */
  private def piHexWords(nWords: Int): Array[Int] = {
    val hexDigits = nWords * 8
    val n = hexDigits + 10
    var pow = BigInteger.ONE.shiftLeft(4 * n) // 16^(n-k)
    var sum = BigInteger.ZERO
    var k = 0L
    while (pow.signum != 0) {
      val k8 = 8 * k
      sum = sum
        .add(pow.shiftLeft(2).divide(BigInteger.valueOf(k8 + 1)))
        .subtract(pow.shiftLeft(1).divide(BigInteger.valueOf(k8 + 4)))
        .subtract(pow.divide(BigInteger.valueOf(k8 + 5)))
        .subtract(pow.divide(BigInteger.valueOf(k8 + 6)))
      pow = pow.shiftRight(4)
      k += 1
    }
    // 3 < pi < 4, so the value has n+1 hex digits and leads with '3';
    // everything after it is the fractional expansion.
    val hex = sum.toString(16)
    val frac = hex.substring(1, 1 + hexDigits)
    Array.tabulate(nWords) { i =>
      java.lang.Long.parseLong(frac.substring(i * 8, i * 8 + 8), 16).toInt
    }
  }

  private lazy val PiWords = piHexWords(18 + 4 * 256)

  /** Exposed for the spec's sanity check (0x243F6A88...). */
  private[graft] def initialPWord0: Int = PiWords(0)

  /** Mutable Blowfish state; one instance per hash computation. */
  private final class State {
    val P: Array[Int] = java.util.Arrays.copyOfRange(PiWords, 0, 18)
    val S: Array[Array[Int]] =
      Array.tabulate(4)(i => java.util.Arrays.copyOfRange(PiWords, 18 + i * 256, 18 + (i + 1) * 256))

    private def f(x: Int): Int =
      ((S(0)(x >>> 24) + S(1)((x >>> 16) & 0xff)) ^ S(2)((x >>> 8) & 0xff)) + S(3)(x & 0xff)

    /** One 64-bit Blowfish encryption of (lr(0), lr(1)) in place. */
    def encipher(lr: Array[Int]): Unit = {
      var l = lr(0); var r = lr(1)
      var i = 0
      while (i < 16) {
        l ^= P(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t // undo the 16th swap
      r ^= P(16)
      l ^= P(17)
      lr(0) = l; lr(1) = r
    }

    /** Next big-endian 32-bit word from `data`, cycling; returns the
      * advanced cursor in the low bits of a packed long. */
    private def word(data: Array[Byte], j0: Int): Long = {
      var w = 0; var j = j0
      var i = 0
      while (i < 4) {
        w = (w << 8) | (data(j) & 0xff)
        j += 1; if (j >= data.length) j = 0
        i += 1
      }
      (w.toLong << 32) | (j.toLong & 0xffffffffL)
    }

    /** EksBlowfish ExpandKey (salted when `data` is the 16-byte salt,
      * unsalted when null). */
    def expandKey(data: Array[Byte], key: Array[Byte]): Unit = {
      var j = 0
      var i = 0
      while (i < 18) {
        val wj = word(key, j)
        P(i) ^= (wj >>> 32).toInt
        j = wj.toInt
        i += 1
      }
      var dj = 0
      val lr = new Array[Int](2)
      i = 0
      while (i < 18) {
        if (data != null) {
          var b = 0
          while (b < 2) {
            val wj = word(data, dj)
            lr(b) ^= (wj >>> 32).toInt
            dj = wj.toInt
            b += 1
          }
        }
        encipher(lr)
        P(i) = lr(0); P(i + 1) = lr(1)
        i += 2
      }
      var s = 0
      while (s < 4) {
        i = 0
        while (i < 256) {
          if (data != null) {
            var b = 0
            while (b < 2) {
              val wj = word(data, dj)
              lr(b) ^= (wj >>> 32).toInt
              dj = wj.toInt
              b += 1
            }
          }
          encipher(lr)
          S(s)(i) = lr(0); S(s)(i + 1) = lr(1)
          i += 2
        }
        s += 1
      }
    }
  }

  /** bcrypt's base64 (alphabet `./A-Za-z0-9`, no padding). */
  private val Alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val Decode: Array[Byte] = {
    val d = Array.fill[Byte](128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i.toByte }
    d
  }

  private def b64Encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      var c1 = bytes(i) & 0xff
      i += 1
      sb.append(Alphabet(c1 >> 2))
      c1 = (c1 & 0x03) << 4
      if (i >= bytes.length) { sb.append(Alphabet(c1)) }
      else {
        var c2 = bytes(i) & 0xff
        i += 1
        c1 |= c2 >> 4
        sb.append(Alphabet(c1))
        c1 = (c2 & 0x0f) << 2
        if (i >= bytes.length) { sb.append(Alphabet(c1)) }
        else {
          c2 = bytes(i) & 0xff
          i += 1
          c1 |= c2 >> 6
          sb.append(Alphabet(c1))
          sb.append(Alphabet(c2 & 0x3f))
        }
      }
    }
    sb.toString
  }

  private def b64Decode(s: String, outLen: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](outLen)
    var oi = 0; var si = 0
    while (oi < outLen && si < s.length) {
      def next(): Int = {
        val c = s.charAt(si); si += 1
        if (c >= 128 || Decode(c.toInt) < 0) return -1
        Decode(c.toInt)
      }
      val c1 = next(); if (c1 < 0) return None
      val c2 = if (si < s.length) next() else -1
      if (c2 < 0) return None
      out(oi) = ((c1 << 2) | (c2 >> 4)).toByte; oi += 1
      if (oi < outLen) {
        val c3 = if (si < s.length) next() else -1
        if (c3 < 0) return None
        out(oi) = (((c2 & 0x0f) << 4) | (c3 >> 2)).toByte; oi += 1
        if (oi < outLen) {
          val c4 = if (si < s.length) next() else -1
          if (c4 < 0) return None
          out(oi) = (((c3 & 0x03) << 6) | c4).toByte; oi += 1
        }
      }
    }
    if (oi == outLen) Some(out) else None
  }

  private val Magic = "OrpheanBeholderScryDoubt".getBytes(StandardCharsets.US_ASCII)

  private def crypt(password: String, cost: Int, salt: Array[Byte]): Array[Byte] = {
    require(cost >= MinCost && cost <= MaxCost, s"bcrypt cost out of range: $cost")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val pw = password.getBytes(StandardCharsets.UTF_8)
    // OpenBSD semantics: at most 72 password bytes participate, plus a
    // terminating NUL that is always part of the cycled key stream.
    val trimmed = if (pw.length > 72) java.util.Arrays.copyOf(pw, 72) else pw
    val key = java.util.Arrays.copyOf(trimmed, trimmed.length + 1)

    val st = new State
    st.expandKey(salt, key)
    var i = 0L
    val rounds = 1L << cost
    while (i < rounds) {
      st.expandKey(null, key)
      st.expandKey(null, salt)
      i += 1
    }

    val c = new Array[Int](6)
    i = 0
    while (i < 6) {
      val b = i.toInt * 4
      c(i.toInt) = ((Magic(b) & 0xff) << 24) | ((Magic(b + 1) & 0xff) << 16) |
        ((Magic(b + 2) & 0xff) << 8) | (Magic(b + 3) & 0xff)
      i += 1
    }
    var round = 0
    val lr = new Array[Int](2)
    while (round < 64) {
      var blk = 0
      while (blk < 3) {
        lr(0) = c(blk * 2); lr(1) = c(blk * 2 + 1)
        st.encipher(lr)
        c(blk * 2) = lr(0); c(blk * 2 + 1) = lr(1)
        blk += 1
      }
      round += 1
    }
    val out = new Array[Byte](23) // 24th ciphertext byte is dropped, per OpenBSD
    var b = 0
    while (b < 23) {
      out(b) = (c(b / 4) >>> (24 - 8 * (b % 4))).toByte
      b += 1
    }
    out
  }

  /** Hash with a fresh random salt; emits the `$2b$` modular format. */
  def hash(password: String, cost: Int = DefaultCost,
      random: java.security.SecureRandom = new java.security.SecureRandom()): String = {
    val salt = new Array[Byte](16)
    random.nextBytes(salt)
    f"$$2b$$$cost%02d$$" + b64Encode(salt) + b64Encode(crypt(password, cost, salt))
  }

  /** Verify against a `$2a$`/`$2b$`/`$2y$` hash (all three share the
    * same algorithm for <=72-byte passwords; `$2y$` is crypt_blowfish's
    * fixed-`$2a$` marker). Constant-time digest compare. */
  def verify(password: String, stored: String): Boolean = {
    // $2X$NN$ + 22 salt chars + 31 digest chars
    if (stored.length != 60 || stored.charAt(0) != '$' || stored.charAt(1) != '2') return false
    val v = stored.charAt(2)
    if (v != 'a' && v != 'b' && v != 'y') return false
    if (stored.charAt(3) != '$' || stored.charAt(6) != '$') return false
    val cost =
      try stored.substring(4, 6).toInt
      catch { case _: NumberFormatException => return false }
    if (cost < MinCost || cost > MaxCost) return false
    b64Decode(stored.substring(7, 29), 16) match {
      case None => false
      case Some(salt) =>
        val digest = b64Encode(crypt(password, cost, salt))
        java.security.MessageDigest.isEqual(
          digest.getBytes(StandardCharsets.US_ASCII),
          stored.substring(29).getBytes(StandardCharsets.US_ASCII))
    }
  }
}
