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
}
