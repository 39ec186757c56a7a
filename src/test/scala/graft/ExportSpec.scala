package graft

import graft.export.Export
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayOutputStream, StringWriter}
import java.util.zip.ZipInputStream

/** Export tests from server/core/stream_query_test.go:15-188. */
class ExportSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("interval formatting '10d 5h 30m 15.068s' (stream_query.go:698-730)") {
    assert(Export.intervalToString(0, 10, (5L * 3600 + 30 * 60 + 15) * 1000000 + 68000)
      == "10d 5h 30m 15.068s")
    assert(Export.intervalToString(0, 0, 90L * 60 * 1000000) == "1h 30m")
    assert(Export.intervalToString(0, 0, 0) == "0.000s")
    assert(Export.intervalToString(1, 2, 0) == "32d") // months ~ 30d
  }

  test("CSV export: header + typed values (stream_query_test.go:15-68)") {
    val df = spark.sql(
      "SELECT 1 AS a, 'x' AS b, INTERVAL '90' MINUTE AS c, TIMESTAMP '2024-05-01 10:30:00' AS ts")
    val w = new StringWriter
    Export.toCSV(df, w)
    val lines = w.toString.split("\n").toSeq
    assert(lines.head == "a,b,c,ts")
    assert(lines(1) == "1,x,1h 30m,2024-05-01T10:30:00Z")
  }

  test("CSV escaping") {
    import spark.implicits._
    val df = Seq(("has,comma", "has\"quote", "plain")).toDF("a", "b", "c")
    val w = new StringWriter
    Export.toCSV(df, w)
    assert(w.toString.split("\n")(1) == "\"has,comma\",\"has\"\"quote\",plain")
  }

  test("JSON export: array of objects, intervals as strings") {
    val df = spark.sql("SELECT 1 AS a, 'x' AS b, INTERVAL '90' MINUTE AS c")
    val w = new StringWriter
    Export.toJSON(df, w)
    assert(w.toString == """[{"a":1,"b":"x","c":"1h 30m"}]""")
  }

  test("UUID bytes format 8-4-4-4-12") {
    val bytes = (0 until 16).map(_.toByte).toArray
    assert(Export.formatUUID(bytes) == "00010203-0405-0607-0809-0a0b0c0d0e0f")
  }

  test("download query resolution (stream_query_test.go:70-150)") {
    val sqls = Seq(
      "SELECT 'f.csv'::DOWNLOAD_CSV",
      "SELECT * FROM data")
    // marked: DOWNLOAD_CSV in statement 0 ⇒ target is the NEXT (index+1)
    assert(Export.resolveDownloadQueryID(sqls, "csv") == Right(1))
    // unmarked: the only non-widget query
    val sqls2 = Seq(
      "SELECT 'x'::DROPDOWN",
      "SELECT * FROM data",
      "SET VARIABLE a = 1")
    assert(Export.resolveDownloadQueryID(sqls2, "xlsx") == Right(1))
    // ambiguous
    val sqls3 = Seq("SELECT 1", "SELECT 2")
    assert(Export.resolveDownloadQueryID(sqls3, "json").isLeft)
  }

  test("XLSX export is a valid zip with typed cells and frozen header") {
    val df = spark.sql("SELECT 42 AS n, 'hello' AS s, true AS b")
    val out = new ByteArrayOutputStream
    Export.toXLSX(df, out)
    val zip = new ZipInputStream(new java.io.ByteArrayInputStream(out.toByteArray))
    val entries = Iterator.continually(zip.getNextEntry).takeWhile(_ != null).map { e =>
      val content = new String(zip.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      e.getName -> content
    }.toMap
    assert(entries.keySet == Set("[Content_Types].xml", "_rels/.rels",
      "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
    val sheet = entries("xl/worksheets/sheet1.xml")
    assert(sheet.contains("""<c t="n"><v>42</v></c>"""))
    assert(sheet.contains("<t>hello</t>"))
    assert(sheet.contains("""<c t="b"><v>1</v></c>"""))
    assert(sheet.contains("""state="frozen""""))
  }
}
