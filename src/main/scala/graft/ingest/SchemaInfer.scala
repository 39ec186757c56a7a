package graft.ingest

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import scala.collection.mutable

/** JSON schema inference for the ingest path — ordered-key JSON parsing
  * and the per-batch type vote (ref: server/ingest/ingest.go:57-68,
  * 284-497). Inferred SQL types are the reference's reduced set:
  * BOOLEAN, DOUBLE, TIMESTAMP, DATE, VARCHAR, JSON — all numbers widen
  * to DOUBLE, mixed/complex values fall back to JSON.
  */
object SchemaInfer {

  val IdColumn = "_id"
  val TsColumn = "_ts"

  val TypeBoolean = "BOOLEAN"
  val TypeDouble = "DOUBLE"
  val TypeTimestamp = "TIMESTAMP"
  val TypeDate = "DATE"
  val TypeVarchar = "VARCHAR"
  val TypeJson = "JSON"

  /** A JSON value tree that preserves object key order. */
  sealed trait JValue
  final case class JObject(fields: Vector[(String, JValue)]) extends JValue {
    lazy val map: Map[String, JValue] = fields.toMap
  }
  final case class JArray(items: Vector[JValue]) extends JValue
  final case class JString(v: String) extends JValue
  final case class JNumber(v: Double) extends JValue
  final case class JBool(v: Boolean) extends JValue
  case object JNull extends JValue

  private val factory = new JsonFactory()

  /** Parse a JSON object preserving key order (the reference's custom
    * OrderedJSON unmarshaller, ingest.go:286-375). */
  def parseOrdered(json: String): JObject = {
    val p = factory.createParser(json)
    try {
      val t = p.nextToken()
      require(t == JsonToken.START_OBJECT, s"expected start of object, got $t")
      parseObject(p)
    } finally p.close()
  }

  private def parseObject(p: com.fasterxml.jackson.core.JsonParser): JObject = {
    val fields = Vector.newBuilder[(String, JValue)]
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val name = p.currentName()
      p.nextToken()
      fields += name -> parseValue(p)
    }
    JObject(fields.result())
  }

  private def parseValue(p: com.fasterxml.jackson.core.JsonParser): JValue =
    p.currentToken() match {
      case JsonToken.START_OBJECT => parseObject(p)
      case JsonToken.START_ARRAY =>
        val items = Vector.newBuilder[JValue]
        while (p.nextToken() != JsonToken.END_ARRAY) items += parseValue(p)
        JArray(items.result())
      case JsonToken.VALUE_STRING => JString(p.getText)
      case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT => JNumber(p.getDoubleValue)
      case JsonToken.VALUE_TRUE => JBool(true)
      case JsonToken.VALUE_FALSE => JBool(false)
      case JsonToken.VALUE_NULL => JNull
      case other => throw new IllegalArgumentException(s"unexpected JSON token $other")
    }

  def toJsonString(v: JValue): String = v match {
    case JObject(fields) => fields.map { case (k, x) =>
      graft.render.Model.jsonValue(k) + ":" + toJsonString(x)
    }.mkString("{", ",", "}")
    case JArray(items) => items.map(toJsonString).mkString("[", ",", "]")
    case JString(s) => graft.render.Model.jsonValue(s)
    case JNumber(n) => graft.render.Model.jsonValue(n)
    case JBool(b) => b.toString
    case JNull => "null"
  }

  // ---- timestamp/date string detection (ref: ingest.go:58-68, 780-799)

  import java.time.format.DateTimeFormatter
  import java.time.{LocalDate, LocalDateTime, OffsetDateTime}

  private def tryParse(f: () => Any): Boolean =
    try { f(); true } catch { case _: Exception => false }

  /** Has a time component and parses in one of the supported formats. */
  def isTimestampString(s: String): Boolean =
    tryParse(() => OffsetDateTime.parse(s)) || // RFC3339[Nano]
    tryParse(() => LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))) ||
    tryParse(() => LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))) ||
    tryParse(() => OffsetDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSXXX")))

  /** Parses as a date-only format (no time component). */
  def isDateString(s: String): Boolean =
    tryParse(() => LocalDate.parse(s)) ||
    tryParse(() => LocalDate.parse(s, DateTimeFormatter.ofPattern("MM/dd/yyyy"))) ||
    tryParse(() => LocalDate.parse(s, DateTimeFormatter.ofPattern("dd/MM/yyyy"))) ||
    tryParse(() => LocalDate.parse(s, DateTimeFormatter.ofPattern("dd.MM.yyyy")))

  def parseTimestamp(s: String): java.sql.Timestamp = {
    def attempt[T](f: => T): Option[T] = try Some(f) catch { case _: Exception => None }
    attempt(java.sql.Timestamp.from(OffsetDateTime.parse(s).toInstant))
      .orElse(attempt(java.sql.Timestamp.valueOf(
        LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")))))
      .orElse(attempt(java.sql.Timestamp.valueOf(
        LocalDateTime.parse(s, DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")))))
      .orElse(attempt(java.sql.Timestamp.from(OffsetDateTime.parse(s,
        DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSXXX")).toInstant)))
      .getOrElse(throw new IllegalArgumentException(s"unable to parse timestamp: $s"))
  }

  def parseDate(s: String): java.sql.Date = {
    def attempt[T](f: => T): Option[T] = try Some(f) catch { case _: Exception => None }
    attempt(java.sql.Date.valueOf(LocalDate.parse(s)))
      .orElse(attempt(java.sql.Date.valueOf(LocalDate.parse(s, DateTimeFormatter.ofPattern("MM/dd/yyyy")))))
      .orElse(attempt(java.sql.Date.valueOf(LocalDate.parse(s, DateTimeFormatter.ofPattern("dd/MM/yyyy")))))
      .orElse(attempt(java.sql.Date.valueOf(LocalDate.parse(s, DateTimeFormatter.ofPattern("dd.MM.yyyy")))))
      .getOrElse(throw new IllegalArgumentException(s"unable to parse date: $s"))
  }

  /** Unix seconds vs milliseconds heuristic: > 1e11 ⇒ ms
    * (ref: ingest.go:833-839). */
  def parseUnixTimestamp(value: Double): java.sql.Timestamp =
    if (value > 1e11) new java.sql.Timestamp(value.toLong)
    else new java.sql.Timestamp(value.toLong * 1000)

  // ---- type vote (ref: determineColumnType, ingest.go:430-497) --------

  def determineColumnType(samples: Seq[JValue]): String = {
    if (samples.isEmpty) return TypeJson
    var hasTimestamp, hasDate, hasString, hasNumber, hasBoolean, hasComplex = false
    samples.foreach {
      case JNull => ()
      case JBool(_) => hasBoolean = true
      case JNumber(_) => hasNumber = true
      case JString(s) =>
        hasString = true
        if (isTimestampString(s)) hasTimestamp = true
        else if (isDateString(s)) hasDate = true
      case _: JObject | _: JArray => hasComplex = true
    }
    if (hasBoolean && !hasString && !hasNumber && !hasComplex) TypeBoolean
    else if (hasNumber && !hasString && !hasBoolean && !hasComplex) TypeDouble
    else if (hasString && !hasNumber && !hasBoolean && !hasComplex) {
      if (hasTimestamp && !hasDate) TypeTimestamp
      else if (hasDate && !hasTimestamp) TypeDate
      else TypeVarchar
    } else TypeJson
  }

  /** One ingest message: payload JSON + transport metadata
    * (the NATS msg-id header and publish timestamp in the reference). */
  final case class Message(
      table: String,
      json: String,
      headerId: Option[String] = None,
      metaTimestamp: java.sql.Timestamp = new java.sql.Timestamp(System.currentTimeMillis()))

  /** Per-batch schema vote with `_id`/`_ts` prepended, order-preserving
    * (ref: detectSchemaFromBatch, ingest.go:377-428). Returns
    * (column → type, ordered column names, parsed objects). */
  def detectSchemaFromBatch(messages: Seq[Message])
      : (Map[String, String], Seq[String], Seq[JObject]) = {
    require(messages.nonEmpty, "cannot detect schema from empty batch")
    val samples = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[JValue]]
    samples(IdColumn) = mutable.ArrayBuffer.empty
    samples(TsColumn) = mutable.ArrayBuffer.empty
    val parsed = messages.map { m =>
      val obj = parseOrdered(m.json)
      obj.fields.foreach { case (field, value) =>
        if (field != IdColumn && field != TsColumn)
          samples.getOrElseUpdate(field, mutable.ArrayBuffer.empty) += value
      }
      obj
    }
    val types = samples.keysIterator.map { field =>
      field -> (field match {
        case IdColumn => TypeVarchar
        case TsColumn => TypeTimestamp
        case f => determineColumnType(samples(f).toSeq)
      })
    }.toMap
    (types, samples.keys.toSeq, parsed)
  }
}
