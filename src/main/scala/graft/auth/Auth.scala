package graft.auth

import graft.ingest.SchemaInfer
import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** JWT (HS256) auth layer carrying dashboard variables — the
  * security-critical piece of shaper's embedded-analytics model
  * (ref: server/core/auth.go, web/handler/auth.go:83-300). Claims:
  * {dashboardId, variables, public, longLived, exp}. Variables from the
  * token are *protected*: URL params can never override them (enforced
  * in graft.interp.Dashboard.collectVars, ported from
  * get_dashboard.go:1526-1528 and proven by the transliterated
  * precedence test).
  */
object Auth {

  final case class Claims(
      dashboardId: Option[String],
      variables: Map[String, Any],
      isPublic: Boolean,
      longLived: Boolean,
      exp: Long,
      /** The reference's PublicAuth puts the dashboard VISIBILITY STRING
        * in the `public` claim ("public" | "password-protected"), and
        * its router detects public sessions by the claim being a string
        * (handler/auth.go:289, routes.go:39). */
      publicVisibility: Option[String] = None)

  private def b64url(b: Array[Byte]): String =
    Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private def b64urlDecode(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)

  private def hmac(secret: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  private def jsonOf(c: Claims): String = {
    val m = graft.render.Model
    val fields = Seq.newBuilder[String]
    c.dashboardId.foreach(d => fields += "\"dashboardId\":" + m.jsonValue(d))
    fields += "\"variables\":" + m.jsonValue(c.variables)
    fields += "\"public\":" + c.publicVisibility.map(m.jsonValue).getOrElse(c.isPublic.toString)
    fields += "\"longLived\":" + c.longLived
    fields += "\"exp\":" + c.exp
    fields.result().mkString("{", ",", "}")
  }

  /** Default expiries: 15 min, long-lived 30 days
    * (ref: main.go:430, handler/auth.go:18). */
  val DefaultExpirySeconds = 15L * 60
  val LongLivedExpirySeconds = 30L * 24 * 3600

  /** Sign an arbitrary ordered claim set — the MapClaims analog used by
    * the TokenAuth issuance path (ref: handler/auth.go:189-231), where
    * user/API-key identity claims ride beside the standard ones. */
  def signMap(claims: Seq[(String, Any)], secret: String): String = {
    val m = graft.render.Model
    val json = claims.map { case (k, v) => m.jsonValue(k) + ":" + m.jsonValue(v) }
      .mkString("{", ",", "}")
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val payload = b64url(json.getBytes(StandardCharsets.UTF_8))
    val sig = b64url(hmac(secret, s"$header.$payload"))
    s"$header.$payload.$sig"
  }

  def sign(claims: Claims, secret: String): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val payload = b64url(jsonOf(claims).getBytes(StandardCharsets.UTF_8))
    val sig = b64url(hmac(secret, s"$header.$payload"))
    s"$header.$payload.$sig"
  }

  def verify(token: String, secret: String,
      nowSeconds: Long = System.currentTimeMillis() / 1000): Either[String, Claims] = {
    val parts = token.split("\\.")
    if (parts.length != 3) return Left("malformed token")
    val expected = hmac(secret, s"${parts(0)}.${parts(1)}")
    val given = try b64urlDecode(parts(2)) catch {
      case _: Exception => return Left("malformed signature")
    }
    if (!java.security.MessageDigest.isEqual(expected, given))
      return Left("invalid signature")
    val payload = try new String(b64urlDecode(parts(1)), StandardCharsets.UTF_8) catch {
      case _: Exception => return Left("malformed payload")
    }
    val obj = try SchemaInfer.parseOrdered(payload) catch {
      case e: Exception => return Left(s"invalid payload JSON: ${e.getMessage}")
    }
    def jv(name: String): Option[SchemaInfer.JValue] = obj.map.get(name)
    val exp = jv("exp") match {
      case Some(SchemaInfer.JNumber(n)) => n.toLong
      case _ => return Left("missing exp")
    }
    if (exp < nowSeconds) return Left("token expired")
    def toScala(v: SchemaInfer.JValue): Any = v match {
      case SchemaInfer.JString(s) => s
      case SchemaInfer.JNumber(n) => n
      case SchemaInfer.JBool(b) => b
      case SchemaInfer.JArray(items) => items.map(toScala)
      case SchemaInfer.JObject(fields) => fields.map { case (k, x) => k -> toScala(x) }.toMap
      case SchemaInfer.JNull => null
    }
    val vars = jv("variables") match {
      case Some(o: SchemaInfer.JObject) => o.fields.map { case (k, v) => k -> toScala(v) }.toMap
      case _ => Map.empty[String, Any]
    }
    val publicVis = jv("public").collect { case SchemaInfer.JString(s) => s }
    Right(Claims(
      dashboardId = jv("dashboardId").collect { case SchemaInfer.JString(s) => s },
      variables = vars,
      // a string-typed public claim IS the public-session marker
      // (routes.go:39); bool is this engine's internal form
      isPublic = publicVis.isDefined ||
        jv("public").collect { case SchemaInfer.JBool(b) => b }.getOrElse(false),
      longLived = jv("longLived").collect { case SchemaInfer.JBool(b) => b }.getOrElse(false),
      exp = exp,
      publicVisibility = publicVis))
  }

  /** Public-dashboard token, the reference's PublicAuth claims shape
    * {exp, dashboardId, public: <visibility>} (handler/auth.go:283-291). */
  def mintPublicToken(dashboardId: String, visibility: String, secret: String,
      nowSeconds: Long = System.currentTimeMillis() / 1000,
      expirySeconds: Long = DefaultExpirySeconds): String =
    signMap(Seq(
      "exp" -> (nowSeconds + expirySeconds),
      "dashboardId" -> dashboardId,
      "public" -> visibility), secret)

  /** A token restricted to one dashboard must not open another
    * (ref: handler/auth_test.go:18-244). */
  def authorizeDashboard(claims: Claims, dashboardId: String): Either[String, Unit] =
    claims.dashboardId match {
      case Some(d) if d != dashboardId => Left(s"token not valid for dashboard $dashboardId")
      case _ => Right(())
    }
}
