package graft.auth

import java.nio.charset.StandardCharsets
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import scala.collection.mutable

/** API-key + session-token auth and permission strings — the rest of
  * the reference's auth surface beyond JWT (ref: server/core/auth.go,
  * server/core/keys.go, server/web/handler/auth.go:83-300). The
  * reference persists keys/sessions in SQLite fed by its event bus;
  * here the store is an injectable in-process registry with the same
  * record shapes and validation rules (HMAC-SHA256 over the full token
  * with a per-record salt, constant-time compare, prefix + id.suffix
  * token layout, expiry-pruned sessions).
  */
object Tokens {

  /** (ref: keys.go:20) */
  val ApiKeyPrefix = "shaperkey."
  /** (ref: auth.go:105) */
  val SessionTokenPrefix = "shapersession."

  /** (ref: keys.go:22-39) */
  object Permission {
    val GenerateJWT = "jwt"
    val Deploy = "deploy"
    val QueryData = "data:query"
    val IngestData = "data:ingest"
    val ReadMetrics = "metrics"
    val ReadDashboard = "dashboard:read"
    val ReadSchema = "schema:read"
  }
  val AllPermissions: Seq[String] = Seq(
    Permission.GenerateJWT, Permission.Deploy, Permission.QueryData,
    Permission.IngestData, Permission.ReadMetrics, Permission.ReadDashboard,
    Permission.ReadSchema)

  /** (ref: auth.go:30-43) */
  object ActorType {
    val User = "user"
    val ApiKey = "api_key"
    val NoAuth = "no_auth"
    val Task = "task"
    val Public = "public"
  }

  final case class Actor(tpe: String, id: String = "") {
    /** (ref: auth.go:70-75) */
    def render: String = if (id.isEmpty) tpe else s"$tpe:$id"
  }
  object Actor {
    /** (ref: auth.go:88-101) */
    def fromString(s: String): Option[Actor] =
      if (s.isEmpty) None
      else s.split(":", 2) match {
        case Array(t) => Some(Actor(t))
        case Array(t, i) => Some(Actor(t, i))
      }
  }

  final case class ApiKeyRecord(id: String, name: String, hash: String,
      salt: String,
      /** None models the legacy NULL/empty permissions column. */
      permissions: Option[Seq[String]],
      createdAtMillis: Long, createdBy: String)

  final case class SessionRecord(id: String, userId: String, hash: String,
      salt: String, createdAtMillis: Long)

  final case class UserRecord(id: String, email: String, name: String,
      passwordHash: Option[String] = None,
      /** Soft delete (users.go:402-440 keeps the row, sets deleted_at). */
      deletedAtMillis: Option[Long] = None)

  /** (ref: auth.go:128-137) */
  final case class AuthInfo(valid: Boolean, isUser: Boolean = false,
      userId: String = "", userEmail: String = "", userName: String = "",
      sessionId: String = "", apiKeyId: String = "", apiKeyName: String = "")

  def isApiKeyToken(token: String): Boolean = token.startsWith(ApiKeyPrefix)

  /** (ref: auth.go:330-337) */
  def apiKeyId(token: String): String =
    token.stripPrefix(ApiKeyPrefix).split("\\.", -1) match {
      case Array(id, _) => id
      case _ => ""
    }

  private def hmacHex(salt: String, data: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(salt.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def constantTimeEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** In-process analog of the reference's SQLite-backed key/session
    * store. Randomness and clock are injectable for deterministic
    * tests; production use defaults to SecureRandom + wall clock. */
  final class TokenStore(
      val sessionExpMillis: Long = 30L * 24 * 3600 * 1000,
      random: java.util.Random = new java.security.SecureRandom(),
      nowMillis: () => Long = () => System.currentTimeMillis()) {

    private val users = mutable.LinkedHashMap.empty[String, UserRecord]
    private val apiKeys = mutable.LinkedHashMap.empty[String, ApiKeyRecord]
    private val sessions = mutable.LinkedHashMap.empty[String, SessionRecord]

    /** (ref: util/util.go:12-19 — same charset) */
    def generateRandomString(length: Int): String = {
      val charset = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
      val sb = new StringBuilder
      (0 until length).foreach(_ => sb.append(charset.charAt(random.nextInt(charset.length))))
      sb.toString
    }

    /** cuid2-shaped id (lowercase letter + 23 lowercase alnum); the
      * reference uses the cuid2 library — the shape, not the exact
      * entropy mixing, is the contract here. */
    def newId(): String = {
      val letters = "abcdefghijklmnopqrstuvwxyz"
      val alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
      val sb = new StringBuilder
      sb.append(letters.charAt(random.nextInt(letters.length)))
      (0 until 23).foreach(_ => sb.append(alnum.charAt(random.nextInt(alnum.length))))
      sb.toString
    }

    def putUser(u: UserRecord): Unit = users(u.id) = u
    def getUser(id: String): Option[UserRecord] = users.get(id)
    /** Live-user lookup by folded email (Login's WHERE deleted_at IS
      * NULL AND email = $1, auth.go:222-228). */
    def userByEmail(email: String): Option[UserRecord] =
      users.values.find(u => u.deletedAtMillis.isEmpty &&
        u.email.equalsIgnoreCase(email.trim))
    def updateUser(id: String)(f: UserRecord => UserRecord): Unit =
      users.get(id).foreach(u => users(id) = f(u))
    /** (ref: HandleUpdateUserPassword/HandleDeleteUser session sweeps) */
    def deleteSessionsForUser(userId: String, except: Option[String] = None): Int = {
      val victims = sessions.collect {
        case (id, s) if s.userId == userId && !except.contains(id) => id
      }.toSeq
      victims.foreach(sessions.remove)
      victims.size
    }
    def sessionCountForUser(userId: String): Int =
      sessions.values.count(_.userId == userId)
    def putApiKey(k: ApiKeyRecord): Unit = apiKeys(k.id) = k
    def getApiKey(id: String): Option[ApiKeyRecord] = apiKeys.get(id)
    def deleteApiKey(id: String): Unit = apiKeys.remove(id)
    /** Journal-replay ingress (INSERT OR IGNORE, auth.go:189-196). */
    def putSession(s: SessionRecord): Unit =
      if (!sessions.contains(s.id)) sessions(s.id) = s

    /** (ref: keys.go:94-117) — returns (id, full key string). */
    def createApiKey(name: String, permissions: Seq[String],
        actor: Actor): (String, String) = {
      val id = newId()
      val key = s"$ApiKeyPrefix$id.${generateRandomString(32)}"
      val salt = generateRandomString(32)
      apiKeys(id) = ApiKeyRecord(id, name.trim, hmacHex(salt, key), salt,
        Some(permissions), nowMillis(), actor.render)
      (id, key)
    }

    /** (ref: auth.go:266-293) */
    def validateApiKey(token: String): Boolean = {
      if (!isApiKeyToken(token)) return false
      val id = apiKeyId(token)
      if (id.isEmpty) return false
      apiKeys.get(id) match {
        case None => false
        case Some(k) => constantTimeEq(hmacHex(k.salt, token), k.hash)
      }
    }

    /** (ref: auth.go:139-150) */
    def deleteExpiredSessions(userId: String): Int = {
      val cutoff = nowMillis() - sessionExpMillis
      val expired = sessions.collect {
        case (id, s) if s.userId == userId && s.createdAtMillis < cutoff => id
      }.toSeq
      expired.foreach(sessions.remove)
      expired.size
    }

    /** (ref: auth.go:239-262) */
    def createSessionForUser(userId: String): String = {
      deleteExpiredSessions(userId)
      val id = newId()
      val token = s"$SessionTokenPrefix$id.${generateRandomString(32)}"
      val salt = generateRandomString(32)
      sessions(id) = SessionRecord(id, userId, hmacHex(salt, token), salt, nowMillis())
      token
    }

    /** (ref: auth.go:203-214 Logout → delete_session) */
    def logout(sessionId: String): Either[String, Unit] =
      if (sessionId.isEmpty) Left("session ID is required")
      else { sessions.remove(sessionId); Right(()) }

    /** (ref: auth.go:295-328) */
    def validateSessionToken(token: String): Boolean = {
      if (!token.startsWith(SessionTokenPrefix)) return false
      token.stripPrefix(SessionTokenPrefix).split("\\.", -1) match {
        case Array(id, _) =>
          sessions.get(id) match {
            case None => false
            case Some(s) =>
              if (nowMillis() - s.createdAtMillis > sessionExpMillis) false
              else constantTimeEq(hmacHex(s.salt, token), s.hash)
          }
        case _ => false
      }
    }

    /** (ref: auth.go:45-67 Actor.HasPermission): users/tasks/others have
      * all permissions; API keys only what their record lists; a legacy
      * NULL/empty permissions column grants nothing until migrated. */
    def hasPermission(actor: Actor, permission: String): Boolean = {
      if (actor.tpe != ActorType.ApiKey) return true
      apiKeys.get(actor.id) match {
        case Some(k) => k.permissions.exists(_.contains(permission))
        case None => false
      }
    }

    /** (ref: initSQLite migration exercised by auth_test.go:85-99):
      * legacy keys with NULL/empty permissions are granted all. */
    def migrateLegacyKeys(): Int = {
      val legacy = apiKeys.collect {
        case (id, k) if k.permissions.forall(_.isEmpty) => id
      }.toSeq
      legacy.foreach(id => apiKeys(id) = apiKeys(id).copy(permissions = Some(AllPermissions)))
      legacy.size
    }

    /** (ref: keys.go:67-92 ListAPIKeys — legacy NULL renders as []) */
    def listApiKeys: Seq[(String, String, Seq[String])] =
      apiKeys.values.toSeq.sortBy(-_.createdAtMillis)
        .map(k => (k.id, k.name, k.permissions.getOrElse(Nil)))

    /** Active (non-soft-deleted) users in creation order
      * (ref: ListUsers, users.go:119-150 filters deleted_at IS NULL). */
    def listUsers: Seq[UserRecord] =
      users.values.toSeq.filter(_.deletedAtMillis.isEmpty)

    /** (ref: auth.go:342-402 ValidToken) */
    def validToken(token: String, loginRequired: Boolean = true): AuthInfo = {
      if (!loginRequired && token.isEmpty) return AuthInfo(valid = true)
      if (token.startsWith(SessionTokenPrefix)) {
        val sessionId = token.stripPrefix(SessionTokenPrefix).split("\\.")(0)
        sessions.get(sessionId).flatMap(s => users.get(s.userId))
            .filter(_.deletedAtMillis.isEmpty) match {
          case Some(u) if validateSessionToken(token) =>
            return AuthInfo(valid = true, isUser = true, userId = u.id,
              userEmail = u.email, userName = u.name, sessionId = sessionId)
          case _ => ()
        }
      }
      if (isApiKeyToken(token) && validateApiKey(token)) {
        val id = apiKeyId(token)
        return AuthInfo(valid = true, apiKeyId = id,
          apiKeyName = apiKeys.get(id).map(_.name).getOrElse(""))
      }
      AuthInfo(valid = false)
    }
  }

  /** Mint a JWT from a session/API-key token — the fresh-issuance path
    * of the reference's TokenAuth handler (ref: handler/auth.go:163-231):
    * valid token required, `jwt` permission required, API keys must
    * scope to a dashboard, user/api-key identity lands in the claims. */
  def issueJwt(store: TokenStore, token: String, dashboardId: Option[String],
      variables: Map[String, Any], longLived: Boolean, secret: String,
      jwtExpSeconds: Long = Auth.DefaultExpirySeconds,
      nowSeconds: Long = System.currentTimeMillis() / 1000,
      loginRequired: Boolean = true): Either[String, String] = {
    val info = store.validToken(token, loginRequired)
    if (!info.valid) return Left("Invalid token")
    val actor =
      if (info.isUser) Some(Actor(ActorType.User, info.userId))
      else if (info.apiKeyId.nonEmpty) Some(Actor(ActorType.ApiKey, info.apiKeyId))
      else None
    actor.foreach { a =>
      if (!store.hasPermission(a, Permission.GenerateJWT))
        return Left("Missing required permission: " + Permission.GenerateJWT)
    }
    if (dashboardId.isEmpty && info.apiKeyId.nonEmpty)
      return Left("Missing dashboardId")
    variables.foreach {
      case (_, _: String) => ()
      case (k, vs: Seq[_]) =>
        vs.foreach {
          case _: String => ()
          case other => return Left(
            s"Invalid variables format: invalid type in array for key $k: ${other.getClass.getSimpleName}")
        }
      case (k, other) => return Left(
        s"Invalid variables format: unsupported type for key $k: ${if (other == null) "null" else other.getClass.getSimpleName}")
    }
    val exp = nowSeconds + (if (longLived) Auth.LongLivedExpirySeconds else jwtExpSeconds)
    val identity: Seq[(String, Any)] =
      if (info.isUser) Seq("userId" -> info.userId, "userEmail" -> info.userEmail,
        "userName" -> info.userName, "sessionId" -> info.sessionId)
      else if (info.apiKeyId.nonEmpty) Seq("apiKeyId" -> info.apiKeyId,
        "apiKeyName" -> info.apiKeyName)
      else Nil
    val claims = Seq("exp" -> (exp: Any)) ++
      (if (longLived) Seq("longLived" -> (true: Any)) else Nil) ++
      identity ++
      dashboardId.map(d => "dashboardId" -> (d: Any)).toSeq ++
      (if (variables.nonEmpty) Seq("variables" -> (variables: Any)) else Nil)
    Right(Auth.signMap(claims, secret))
  }

  /** JWT-refresh guard rules (ref: handler/auth.go:108-129): a
    * dashboard-scoped token can never mint, and a long-lived token can
    * never mint another long-lived token. */
  def canMintFrom(claims: Auth.Claims, longLivedRequested: Boolean): Either[String, Unit] =
    if (claims.dashboardId.isDefined) Left("Unauthorized")
    else if (longLivedRequested && claims.longLived)
      Left("Cannot generate a long-lived token from a long-lived token")
    else Right(())
}
