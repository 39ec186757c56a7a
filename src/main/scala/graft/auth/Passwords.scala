package graft.auth

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import java.util.Base64
import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

/** Password hashing for user login and password-protected dashboards
  * (ref: core/users.go:63, edit_dashboard.go:242-276 — the reference
  * uses bcrypt at DefaultCost=10). New hashes are bcrypt `$2b$`
  * ([[Bcrypt]], pure Scala), byte-compatible with a reference
  * deployment's stored `$2a$`/`$2b$`/`$2y$` hashes in both directions.
  * `verify` additionally accepts this repo's earlier
  * `pbkdf2-sha256$<iters>$<salt-b64>$<dk-b64>` format so hashes minted
  * before the bcrypt port keep working.
  */
object Passwords {

  private val KeyBits = 256

  def hash(password: String,
      random: SecureRandom = new SecureRandom(),
      cost: Int = Bcrypt.DefaultCost): String =
    Bcrypt.hash(password, cost, random)

  def verify(password: String, stored: String): Boolean =
    if (stored.startsWith("$2")) Bcrypt.verify(password, stored)
    else stored.split("\\$", -1) match {
      case Array("pbkdf2-sha256", iters, saltB64, dkB64) =>
        try {
          val salt = Base64.getDecoder.decode(saltB64)
          val expected = Base64.getDecoder.decode(dkB64)
          val dk = derive(password, salt, iters.toInt)
          java.security.MessageDigest.isEqual(dk, expected)
        } catch { case _: Exception => false }
      case _ => false
    }

  private def derive(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, KeyBits)
    try SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
    finally spec.clearPassword()
  }

  /** Password change (ref: UpdateUserPassword, users.go:186-218):
    * verify the CURRENT password against the stored hash, then emit the
    * update event (new hash + exclude-session id) through the supplied
    * journal submitter — the handler invalidates every other session. */
  def updateUserPassword(store: Tokens.TokenStore,
      submit: (String, String) => Boolean, userId: String,
      currentPassword: String, newPassword: String,
      excludeSessionId: String): Either[String, Unit] = {
    val user = store.getUser(userId).getOrElse(return Left("user not found"))
    user.passwordHash match {
      case Some(h) if verify(currentPassword, h) =>
        val m = graft.render.Model
        val json = Seq(
          "\"userId\":" + m.jsonValue(userId),
          "\"passwordHash\":" + m.jsonValue(hash(newPassword)),
          "\"excludeSessionId\":" + m.jsonValue(excludeSessionId)
        ).mkString("{", ",", "}")
        if (submit("update_user_password", json)) Right(())
        else Left("failed to submit password update")
      case _ => Left("invalid current password")
    }
  }

  /** Login flow (ref: core/auth.go:215-237): case-folded trimmed email
    * lookup, password verify against the stored hash, then a fresh
    * session token. The password table is injected (the reference reads
    * users.password_hash from SQLite). */
  def login(store: Tokens.TokenStore, passwordHashByUserId: String => Option[String],
      emailToUserId: String => Option[String], email: String,
      password: String): Either[String, String] = {
    val normalized = email.trim.toLowerCase
    emailToUserId(normalized) match {
      case None => Left("error finding user")
      case Some(userId) =>
        passwordHashByUserId(userId) match {
          case Some(h) if verify(password, h) => Right(store.createSessionForUser(userId))
          case _ => Left("invalid password")
        }
    }
  }
}
