package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.auth.{Bcrypt, Passwords}

/** bcrypt parity with the reference's golang.org/x/crypto/bcrypt
  * (server/core/auth.go:215-237, users.go:63). The fixed vectors are
  * the public crypt_blowfish / OpenBSD test vectors that every
  * interoperable implementation reproduces byte-for-byte — they pin the
  * pi-derived P/S boxes, the EksBlowfish schedule, the 64-round
  * OrpheanBeholderScryDoubt encryption, and the bcrypt base64 alphabet
  * all at once.
  */
class BcryptSpec extends AnyFunSuite {

  test("initial P-array word is the first hex digits of pi") {
    assert(Bcrypt.initialPWord0 == 0x243f6a88)
  }

  test("public crypt_blowfish vectors verify") {
    val vectors = Seq(
      "U*U" -> "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW",
      "U*U*" -> "$2a$05$CCCCCCCCCCCCCCCCCCCCC.VGOzA784oUp/Z0DY336zx7pLYAy0lwK",
      "U*U*U" -> "$2a$05$XXXXXXXXXXXXXXXXXXXXXOAcXxm9kjPGEMsLznoKqmqw7tc8WCx4a",
      // 72-byte truncation: everything past byte 72 is ignored
      ("0123456789abcdefghijklmnopqrstuvwxyz" +
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" +
        "chars after 72 are ignored") ->
        "$2a$05$abcdefghijklmnopqrstuu5s2v8.iXieOjg/.AySBTTZIIVFJeBui"
    )
    vectors.foreach { case (pw, hash) =>
      assert(Bcrypt.verify(pw, hash), s"vector failed for '$pw'")
      // appending past the 72-byte cutoff cannot perturb the hash, so
      // only the short vectors get a negative check this way
      if (pw.length < 72)
        assert(!Bcrypt.verify(pw + "x", hash), s"negative failed for '$pw'")
    }
  }

  test("72-byte truncation boundary") {
    val base = "x" * 72
    val h = Bcrypt.hash(base, cost = 4)
    assert(Bcrypt.verify(base + "ignored tail", h))
    assert(!Bcrypt.verify(base.dropRight(1), h))
  }

  test("roundtrip, $2b format, cost encoding, salt freshness") {
    val h = Bcrypt.hash("hello", cost = 6)
    assert(h.startsWith("$2b$06$") && h.length == 60)
    assert(Bcrypt.verify("hello", h))
    assert(!Bcrypt.verify("hellp", h))
    assert(Bcrypt.hash("hello", cost = 6) != h) // fresh salt each time
    // empty password is legal (key stream is just the NUL terminator)
    val e = Bcrypt.hash("", cost = 4)
    assert(Bcrypt.verify("", e) && !Bcrypt.verify("x", e))
  }

  test("malformed hashes are rejected, not thrown") {
    val good = Bcrypt.hash("pw", cost = 4)
    assert(!Bcrypt.verify("pw", good.dropRight(1)))
    assert(!Bcrypt.verify("pw", "$2c" + good.drop(3)))
    assert(!Bcrypt.verify("pw", "$2b$99$" + good.drop(7)))
    assert(!Bcrypt.verify("pw", good.replace("$2b$04$", "$2b$xx$")))
    assert(!Bcrypt.verify("pw", good.take(7) + "!" * 53))
    assert(!Bcrypt.verify("pw", ""))
  }

  test("Passwords front door mints bcrypt and verifies both formats") {
    val h = Passwords.hash("sw0rdfish")
    assert(h.startsWith("$2b$10$")) // reference DefaultCost
    assert(Passwords.verify("sw0rdfish", h) && !Passwords.verify("nope", h))
  }
}
