package graft.export

import graft.render.Render
import graft.sqlfront.Gate
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.unsafe.types.CalendarInterval

import java.io.{OutputStream, Writer}
import java.nio.charset.StandardCharsets
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Streaming exports: CSV / JSON / XLSX plus download-target resolution
  * (ref: server/core/stream_query.go:29-730). Value formatting ports
  * `formatValue`/`intervalToString` exactly: interval "10d 5h 30m
  * 15.068s", RFC3339 timestamps, UUID bytes → 8-4-4-4-12, lists joined
  * with ", ", shaper unions unwrapped.
  *
  * Scale note: all three writers consume `df.toLocalIterator` — one
  * partition at a time streams through the driver without
  * materializing the full result (the Spark analog of the reference's
  * row-streaming over a DuckDB cursor).
  */
object Export {

  // ---- value formatting (ref: formatValue, stream_query.go:658-686) --

  def formatUUID(b: Array[Byte]): String = {
    val hex = b.map(x => f"${x & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** "10d 5h 30m 15.068s" (ref: intervalToString, stream_query.go:698-730). */
  def intervalToString(months: Int, days: Int, micros: Long): String = {
    val parts = Seq.newBuilder[String]
    val totalDays = days + months * 30
    if (totalDays != 0) parts += s"${totalDays}d"
    var remaining = micros
    val hours = remaining / (3600L * 1000000)
    if (hours != 0) { parts += s"${hours}h"; remaining -= hours * 3600L * 1000000 }
    val minutes = remaining / (60L * 1000000)
    if (minutes != 0) { parts += s"${minutes}m"; remaining -= minutes * 60L * 1000000 }
    val seconds = remaining / 1000000.0
    val built = parts.result()
    val withSec =
      if (seconds != 0 || built.isEmpty) built :+ f"$seconds%.3fs" else built
    withSec.mkString(" ")
  }

  private def intervalString(v: Any): String = v match {
    case d: java.time.Duration =>
      intervalToString(0, 0, d.getSeconds * 1000000L + d.getNano / 1000)
    case p: java.time.Period =>
      intervalToString(p.toTotalMonths.toInt, p.getDays, 0)
    case c: CalendarInterval => intervalToString(c.months, c.days, c.microseconds)
    case _ => String.valueOf(v)
  }

  /** Day-fraction for XLSX interval cells
    * (ref: intervalToDays, stream_query.go:688-695). */
  def intervalToDays(months: Int, days: Int, micros: Long): Double =
    days + months * 30 + micros / (24.0 * 3600 * 1000000)

  private val rfc3339 = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssXXX")

  def formatValue(value: Any): String = value match {
    case null => ""
    case b: Array[Byte] => if (b.length == 16) formatUUID(b) else new String(b, StandardCharsets.UTF_8)
    case v if Render.isIntervalValue(v) => intervalString(v)
    case t: java.sql.Timestamp => t.toInstant.atZone(ZoneOffset.UTC).format(rfc3339)
    case d: java.sql.Date => d.toLocalDate.toString
    case t: java.time.LocalDateTime => t.atZone(ZoneOffset.UTC).format(rfc3339)
    case s: scala.collection.Seq[_] => s.map(formatValue).mkString(", ")
    case r: Row if r.length == 1 => formatValue(r.get(0)) // shaper union unwrap
    case other => String.valueOf(other)
  }

  // ---- download-target resolution (ref: stream_query.go:29-65) -------

  private val excludedTypesRegex =
    ("\\b(LABEL|SECTION|XLINE|YLINE|DROPDOWN|DOWNLOAD_CSV|DOWNLOAD_XLSX|DOWNLOAD_JSON|" +
      "DOWNLOAD_PDF|DATEPICKER|DATEPICKER_FROM|DATEPICKER_TO|PLACEHOLDER|INPUT|RELOAD|" +
      "HEADER_IMAGE|FOOTER_LINK)\\b").r

  /** Find the statement a csv/xlsx/json download refers to: the one
    * mentioning DOWNLOAD_<TYPE> (the *next* statement is the target, so
    * return index+1), else the only non-widget query. */
  def resolveDownloadQueryID(sqls: Seq[String], downloadType: String): Either[String, Int] = {
    val upperType = "DOWNLOAD_" + downloadType.toUpperCase
    val marked = sqls.zipWithIndex.filter(_._1.toUpperCase.contains(upperType))
    if (marked.length == 1) return Right(marked.head._2 + 1)
    val candidates = sqls.zipWithIndex.filter { case (s, _) =>
      !Gate.isSideEffect(s) && excludedTypesRegex.findFirstIn(s.toUpperCase).isEmpty
    }
    candidates.length match {
      case 1 => Right(candidates.head._2)
      case 0 => Left(s"could not find a matching query for ${downloadType.toUpperCase} download")
      case n => Left(s"found $n potential queries for ${downloadType.toUpperCase} download, " +
        "please specify which one with query_id")
    }
  }

  // ---- CSV (ref: StreamSQLToCSVWithConn, stream_query.go:336-397) ----

  private def csvEscape(s: String): String =
    if (s.contains(",") || s.contains("\"") || s.contains("\n") || s.contains("\r"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def toCSV(df: DataFrame, out: Writer): Unit = {
    val cols = df.columns
    out.write(cols.map(csvEscape).mkString(","))
    out.write("\n")
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      out.write(cols.indices.map(i => csvEscape(formatValue(row.get(i)))).mkString(","))
      out.write("\n")
    }
    out.flush()
  }

  // ---- JSON (ref: stream_query.go:156-334) ---------------------------

  private def jsonCell(v: Any): String = v match {
    case null => "null"
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Number =>
      val d = n.doubleValue()
      if (d.isNaN || d.isInfinite) "null" else graft.render.Model.jsonValue(n)
    case r: Row if r.length == 1 => jsonCell(r.get(0))
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => graft.render.Model.jsonValue(String.valueOf(k)) + ":" + jsonCell(x) }
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(jsonCell).mkString("[", ",", "]")
    case other => graft.render.Model.jsonValue(formatValue(other))
  }

  def toJSON(df: DataFrame, out: Writer): Unit = {
    val cols = df.columns
    out.write("[")
    val it = df.toLocalIterator()
    var first = true
    while (it.hasNext) {
      val row = it.next()
      if (!first) out.write(",")
      first = false
      out.write(cols.indices.map(i =>
        graft.render.Model.jsonValue(cols(i)) + ":" + jsonCell(row.get(i))).mkString("{", ",", "}"))
    }
    out.write("]")
    out.flush()
  }

  // ---- XLSX (ref: stream_query.go:399-651; excelize replaced by ------
  // hand-built minimal OOXML — header row, typed cells, frozen header)

  private def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def toXLSX(df: DataFrame, out: OutputStream): Unit = {
    val zip = new ZipOutputStream(out)
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
    sb.append("""<sheetViews><sheetView workbookViewId="0"><pane ySplit="1" topLeftCell="A2" state="frozen"/></sheetView></sheetViews>""")
    val cols = df.columns
    // column widths sized from header length (ref: excelize col widths,
    // stream_query.go:399-651)
    sb.append("<cols>")
    cols.zipWithIndex.foreach { case (c, i) =>
      val w = math.max(10, math.min(40, c.length + 4))
      sb.append(s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>""")
    }
    sb.append("</cols>")
    sb.append("<sheetData>")
    sb.append("<row r=\"1\">")
    cols.foreach(c => sb.append(s"""<c t="inlineStr"><is><t>${xml(c)}</t></is></c>"""))
    sb.append("</row>")
    val it = df.toLocalIterator()
    var r = 2
    while (it.hasNext) {
      val row = it.next()
      sb.append(s"""<row r="$r">""")
      cols.indices.foreach { i =>
        Render.unwrap(row.get(i)) match {
          case null => sb.append("<c/>")
          case n: java.lang.Number => sb.append(s"""<c t="n"><v>${n}</v></c>""")
          case b: java.lang.Boolean => sb.append(s"""<c t="b"><v>${if (b) 1 else 0}</v></c>""")
          case d: java.time.Duration =>
            // interval as Excel day-fraction (ref intervalToDays)
            sb.append(s"""<c t="n"><v>${intervalToDays(0, 0, d.getSeconds * 1000000L + d.getNano / 1000)}</v></c>""")
          case other =>
            sb.append(s"""<c t="inlineStr"><is><t>${xml(formatValue(other))}</t></is></c>""")
        }
      }
      sb.append("</row>")
      r += 1
    }
    sb.append("</sheetData>")
    // autofilter over the header row (ref parity)
    val lastCol = {
      var n = cols.length
      val b = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; b.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      b.toString
    }
    sb.append(s"""<autoFilter ref="A1:$lastCol${math.max(1, r - 1)}"/>""")
    sb.append("</worksheet>")
    entry("xl/worksheets/sheet1.xml", sb.toString)
    zip.finish()
    zip.flush()
  }
}
