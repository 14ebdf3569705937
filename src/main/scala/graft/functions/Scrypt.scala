package graft.functions

import java.nio.{ByteBuffer, ByteOrder}
import java.security.{MessageDigest, SecureRandom}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** RFC 7914 scrypt and the werkzeug password-hash wire format
  * (`scrypt:N:r:p$salt$hex` — reference app.py:88 generates it,
  * app.py:102 verifies it), so a `users` table migrated verbatim from
  * the reference keeps verifying here. Pure public-spec implementation:
  * PBKDF2-HMAC-SHA256 via javax.crypto Mac, Salsa20/8 ROMix core in
  * plain int arrays. Driver-side only — auth is a point lookup, never
  * a per-row dataset operation (scrypt is deliberately memory-hard:
  * 128·N·r bytes per call).
  */
object Scrypt {

  /** scrypt(P, S, N, r, p, dkLen) per RFC 7914 §6. */
  def scrypt(password: Array[Byte], salt: Array[Byte], n: Int, r: Int,
      p: Int, dkLen: Int): Array[Byte] = {
    require(n > 1 && (n & (n - 1)) == 0, "N must be a power of two > 1")
    require(r > 0 && p > 0 && dkLen > 0, "r, p, dkLen must be positive")
    // memory bound: 128·N·r ≤ 256 MiB keeps a hostile/corrupt stored
    // hash from driving a multi-GB allocation or overflowing the
    // n·blockWords Int index arithmetic (werkzeug's default is 32 MiB)
    require(n.toLong * r <= (1L << 21),
      s"scrypt cost too large: 128*$n*$r bytes")
    require(p.toLong * r <= (1 << 16), "p*r too large")
    val mfLen = 128 * r
    val b = pbkdf2(password, salt, p * mfLen)
    val blockWords = mfLen / 4 // 32·r ints per MFBlock
    val words = new Array[Int](b.length / 4)
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer().get(words)
    val v = new Array[Int](n * blockWords)
    val x = new Array[Int](blockWords)
    val y = new Array[Int](blockWords)
    val t = new Array[Int](16)
    var i = 0
    while (i < p) {
      romix(words, i * blockWords, n, r, v, x, y, t)
      i += 1
    }
    val out = ByteBuffer.allocate(b.length).order(ByteOrder.LITTLE_ENDIAN)
    words.foreach(out.putInt)
    pbkdf2(password, out.array(), dkLen)
  }

  /** Hash in the werkzeug format with an explicit salt (testing /
    * migration); werkzeug's dklen is hashlib's default 64. */
  def hashWithSalt(password: String, salt: String, n: Int = 32768,
      r: Int = 8, p: Int = 1): String = {
    val dk = scrypt(password.getBytes("UTF-8"), salt.getBytes("UTF-8"),
      n, r, p, 64)
    s"scrypt:$n:$r:$p$$$salt$$${toHex(dk)}"
  }

  /** werkzeug `generate_password_hash(pw, method="scrypt")`: random
    * 16-char alphanumeric salt (werkzeug security.py gen_salt). */
  def generate(password: String, n: Int = 32768, r: Int = 8, p: Int = 1,
      rng: SecureRandom = new SecureRandom()): String = {
    val chars =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val salt = Array.fill(16)(chars(rng.nextInt(chars.length))).mkString
    hashWithSalt(password, salt, n, r, p)
  }

  /** werkzeug `check_password_hash` for the scrypt method. Returns
    * false (never throws) on malformed input. */
  def verify(stored: String, password: String): Boolean =
    stored.split("\\$", 3) match {
      case Array(method, salt, hex) if method.startsWith("scrypt:") =>
        method.stripPrefix("scrypt:").split(":") match {
          case Array(ns, rs, ps) =>
            try {
              val dk = scrypt(password.getBytes("UTF-8"),
                salt.getBytes("UTF-8"), ns.toInt, rs.toInt, ps.toInt, 64)
              MessageDigest.isEqual(toHex(dk).getBytes("UTF-8"),
                hex.getBytes("UTF-8"))
            } catch { case _: IllegalArgumentException | _: NumberFormatException => false }
          case _ => false
        }
      case _ => false
    }

  /** ROMix (RFC 7914 §5) on the 32·r-word block at `buf[off..)`. */
  private def romix(buf: Array[Int], off: Int, n: Int, r: Int,
      v: Array[Int], x0: Array[Int], y0: Array[Int], t: Array[Int]): Unit = {
    val bw = 32 * r
    var x = x0
    var y = y0
    System.arraycopy(buf, off, x, 0, bw)
    var i = 0
    while (i < n) {
      System.arraycopy(x, 0, v, i * bw, bw)
      blockMix(x, y, r, t)
      val tmp = x; x = y; y = tmp
      i += 1
    }
    i = 0
    while (i < n) {
      // Integerify: last 64-byte sub-block as a little-endian int mod N
      val j = x(bw - 16) & (n - 1)
      val vo = j * bw
      var k = 0
      while (k < bw) { x(k) ^= v(vo + k); k += 1 }
      blockMix(x, y, r, t)
      val tmp = x; x = y; y = tmp
      i += 1
    }
    System.arraycopy(x, 0, buf, off, bw)
  }

  /** BlockMix_Salsa20/8 (RFC 7914 §4): out even sub-blocks first, then
    * odd. `t` is the running 16-word Salsa state. */
  private def blockMix(in: Array[Int], out: Array[Int], r: Int,
      t: Array[Int]): Unit = {
    System.arraycopy(in, (2 * r - 1) * 16, t, 0, 16)
    var i = 0
    while (i < 2 * r) {
      val io = i * 16
      var k = 0
      while (k < 16) { t(k) ^= in(io + k); k += 1 }
      salsa8(t)
      val oo = (if (i % 2 == 0) i / 2 else r + i / 2) * 16
      System.arraycopy(t, 0, out, oo, 16)
      i += 1
    }
  }

  /** Salsa20/8 core, in place: b ← b + Rounds8(b). */
  private def salsa8(b: Array[Int]): Unit = {
    val x = new Array[Int](16)
    System.arraycopy(b, 0, x, 0, 16)
    @inline def rl(a: Int, s: Int): Int = Integer.rotateLeft(a, s)
    var i = 0
    while (i < 8) {
      x(4) ^= rl(x(0) + x(12), 7); x(8) ^= rl(x(4) + x(0), 9)
      x(12) ^= rl(x(8) + x(4), 13); x(0) ^= rl(x(12) + x(8), 18)
      x(9) ^= rl(x(5) + x(1), 7); x(13) ^= rl(x(9) + x(5), 9)
      x(1) ^= rl(x(13) + x(9), 13); x(5) ^= rl(x(1) + x(13), 18)
      x(14) ^= rl(x(10) + x(6), 7); x(2) ^= rl(x(14) + x(10), 9)
      x(6) ^= rl(x(2) + x(14), 13); x(10) ^= rl(x(6) + x(2), 18)
      x(3) ^= rl(x(15) + x(11), 7); x(7) ^= rl(x(3) + x(15), 9)
      x(11) ^= rl(x(7) + x(3), 13); x(15) ^= rl(x(11) + x(7), 18)
      x(1) ^= rl(x(0) + x(3), 7); x(2) ^= rl(x(1) + x(0), 9)
      x(3) ^= rl(x(2) + x(1), 13); x(0) ^= rl(x(3) + x(2), 18)
      x(6) ^= rl(x(5) + x(4), 7); x(7) ^= rl(x(6) + x(5), 9)
      x(4) ^= rl(x(7) + x(6), 13); x(5) ^= rl(x(4) + x(7), 18)
      x(11) ^= rl(x(10) + x(9), 7); x(8) ^= rl(x(11) + x(10), 9)
      x(9) ^= rl(x(8) + x(11), 13); x(10) ^= rl(x(9) + x(8), 18)
      x(12) ^= rl(x(15) + x(14), 7); x(13) ^= rl(x(12) + x(15), 9)
      x(14) ^= rl(x(13) + x(12), 13); x(15) ^= rl(x(14) + x(13), 18)
      i += 2
    }
    i = 0
    while (i < 16) { b(i) += x(i); i += 1 }
  }

  /** PBKDF2-HMAC-SHA256 with c=1 (all scrypt ever needs). */
  private def pbkdf2(password: Array[Byte], salt: Array[Byte],
      dkLen: Int): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    // HMAC zero-pads keys to the block size, so the empty password is
    // equivalent to a 64-byte zero key (SecretKeySpec rejects empty)
    val key = if (password.isEmpty) new Array[Byte](64) else password
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    val blocks = (dkLen + 31) / 32
    val out = new Array[Byte](blocks * 32)
    var i = 1
    while (i <= blocks) {
      mac.update(salt)
      mac.update(Array[Byte]((i >>> 24).toByte, (i >>> 16).toByte,
        (i >>> 8).toByte, i.toByte))
      System.arraycopy(mac.doFinal(), 0, out, (i - 1) * 32, 32)
      i += 1
    }
    java.util.Arrays.copyOf(out, dkLen)
  }

  private def toHex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString
}
