package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Scrypt

/** RFC 7914 §12 test vectors + werkzeug-format fixtures generated with
  * CPython's hashlib.scrypt (the exact library werkzeug calls at
  * reference app.py:88), so a hash produced by the reference verifies
  * here bit-for-bit.
  */
class ScryptSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("RFC 7914 vector: empty password/salt, N=16") {
    assert(hex(Scrypt.scrypt(Array.empty, Array.empty, 16, 1, 1, 64)) ===
      "77d6576238657b203b19ca42c18a0497f16b4844e3074ae8dfdffa3fede21442" +
      "fcd0069ded0948f8326a753a0fc81f17e8d3e0fb2e0d3628cf35e20c38d18906")
  }

  test("RFC 7914 vector: password/NaCl, N=1024, r=8, p=16") {
    assert(hex(Scrypt.scrypt("password".getBytes, "NaCl".getBytes,
      1024, 8, 16, 64)) ===
      "fdbabe1c9d3472007856e7190d01e9fe7c6ad7cbc8237830e77376634b373162" +
      "2eaf30d92e22a3886ff109279d9830dac727afb94a83ee6d8360cbdfa2cc0640")
  }

  test("RFC 7914 vector: pleaseletmein, N=16384, r=8, p=1") {
    assert(hex(Scrypt.scrypt("pleaseletmein".getBytes,
      "SodiumChloride".getBytes, 16384, 8, 1, 64)) ===
      "7023bdcb3afd7348461c06cd81fd38ebfda8fbba904f8e3ea9b543f6545da1f2" +
      "d5432955613f0fcf62d49705242a9af9e61e85dc0d651e40dfcf017b45575887")
  }

  test("verifies a literal werkzeug-format hash (hashlib.scrypt fixture)") {
    // python3: hashlib.scrypt(b'secret123', salt=b'AbCdEfGhIjKlMnOp',
    //          n=32768, r=8, p=1, maxmem=132*32768*8, dklen=64).hex()
    val stored = "scrypt:32768:8:1$AbCdEfGhIjKlMnOp$" +
      "b71f4f9b456a647796adb3a999d3f5999f5e719c0c13460bacbe68e3e1db9aeb" +
      "20c889efaa807eeb5469ce3732e97dfe77829fe52d1ff97ecb44e88bde39a543"
    assert(Scrypt.verify(stored, "secret123"))
    assert(!Scrypt.verify(stored, "secret124"))
  }

  test("generate → verify round-trip with werkzeug default parameters") {
    val stored = Scrypt.generate("hunter2")
    assert(stored.startsWith("scrypt:32768:8:1$"))
    assert(Scrypt.verify(stored, "hunter2"))
    assert(!Scrypt.verify(stored, "hunter3"))
  }

  test("malformed input never throws") {
    assert(!Scrypt.verify("", "pw"))
    assert(!Scrypt.verify("scrypt:abc$salt$00", "pw"))
    assert(!Scrypt.verify("pbkdf2:sha256$salt$00", "pw"))
    assert(!Scrypt.verify("scrypt:7:8:1$salt$00", "pw")) // N not a power of 2
    // hostile cost parameters must be rejected, not allocated:
    // 2^23·8 would overflow the block index; 2^31 overflows Int.parse
    assert(!Scrypt.verify("scrypt:8388608:8:1$salt$00", "pw"))
    assert(!Scrypt.verify("scrypt:2147483648:8:1$salt$00", "pw"))
    assert(!Scrypt.verify("scrypt:32768:8:999999$salt$00", "pw"))
  }
}
