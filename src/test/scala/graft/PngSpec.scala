package graft

import graft.interp.Dashboard
import graft.render.Png
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** PNG dashboard render (op #33): every painter class executes over a
  * real interpreter result, output decodes as PNG, and rendering is
  * byte-deterministic (antialiasing off → every chart pixel is an exact
  * palette color).
  */
class PngSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val content =
    """SELECT 'Render Gallery'::SECTION;
      |SELECT 'Trend'::LABEL;
      |SELECT col0::XAXIS, col1::LINECHART FROM (VALUES (1, 10), (2, 30), (3, 20));
      |SELECT 'Mix'::LABEL;
      |SELECT col0::XAXIS, col1::CATEGORY, col2::BARCHART_STACKED
      |FROM (VALUES ('a', 'x', 4), ('a', 'y', 6), ('b', 'x', 3));
      |SELECT 'Share'::LABEL;
      |SELECT col0::CATEGORY, col1::PIECHART FROM (VALUES ('p', 7), ('q', 3));
      |SELECT 42.0::GAUGE AS g, [0.0, 50.0, 100.0]::RANGE;
      |SELECT 'g'::XAXIS AS grp, BOXPLOT(col0) AS bp
      |FROM (VALUES (1.0), (2.0), (3.0), (4.0), (9.0));
      |SELECT 'pick'::DROPDOWN AS opt;
      |SELECT 123 AS big_value;
      |SELECT col0 AS name, col1 AS qty FROM (VALUES ('n1', 1), ('n2', 2));""".stripMargin

  private lazy val result = Dashboard.run(spark, content)
  private lazy val png = Png.render(result)

  test("gallery covers the painter classes") {
    val types = result.sections.flatMap(_.queries).map(_.render.renderType)
    assert(types.contains("linechart"))
    assert(types.exists(_.startsWith("barchart")))
    assert(types.contains("piechart"))
    assert(types.contains("gauge"))
    assert(types.contains("boxplot"))
    assert(types.contains("dropdown"))
    assert(types.contains("value"))
    assert(types.contains("table"))
  }

  test("renders a decodable PNG of the full page") {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null)
    assert(img.getWidth == 1200)
    // section band + 5 charts + dropdown + value + table
    assert(img.getHeight > 1500)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
  }

  test("chart geometry lands in exact palette colors") {
    val counts = Png.paletteCounts(png).toMap
    // series 0 (line, first stack segment, first pie slice, boxplot box)
    assert(counts("#3b6fb6") > 1000, s"counts: $counts")
    // series 1 (second category / pie slice)
    assert(counts("#d95f4b") > 500, s"counts: $counts")
  }

  test("rendering is byte-deterministic") {
    val again = Png.render(Dashboard.run(spark, content))
    assert(java.util.Arrays.equals(png, again))
  }

  test("numeric YLINE marklines paint as dashed rules in the chart band") {
    val r = Dashboard.run(spark,
      """SELECT 20.0::YLINE AS mark, 'cap'::LABEL AS l;
        |SELECT col0::XAXIS, col1::LINECHART FROM (VALUES (1, 10), (2, 30));""".stripMargin)
    val chart = r.sections.flatMap(_.queries).find(_.render.renderType == "linechart").get
    assert(chart.render.markLines.exists(_.isYaxis),
      s"markline missing from render spec: ${chart.render.markLines}")
    val bytes = Png.render(r)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var markPixels = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xffffff) == 0x888888) markPixels += 1
    assert(markPixels > 100, s"dashed markline not painted ($markPixels pixels)")
  }

  test("PDF wrap: valid single-page structure, image roundtrips through Flate") {
    val pdf = graft.render.Pdf.render(result)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.contains("/Subtype /Image") && s.contains("/Width 1200"))
    assert(s.contains("/MediaBox [0 0 1200 "))
    assert(s.endsWith("%%EOF\n"))
    // inflate the image stream back and check it is exactly w*h*3 samples
    val lenRe = "/Length (\\d+) >>\\nstream\\n".r
    val m = lenRe.findFirstMatchIn(s.substring(s.indexOf("/Subtype /Image"))).get
    val start = s.indexOf("/Subtype /Image") + m.end
    val deflated = pdf.slice(start, start + m.group(1).toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(deflated)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val raw = new Array[Byte](img.getWidth * img.getHeight * 3)
    val n = inf.inflate(raw)
    assert(inf.finished() && n == raw.length)
    // deterministic like the PNG path
    assert(java.util.Arrays.equals(pdf, graft.render.Pdf.render(result)))
  }

  test("empty-ish dashboards still render (no rows, no sections edge)") {
    val r = Dashboard.run(spark, "SELECT 1 AS x WHERE 1 = 0")
    val bytes = Png.render(r)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 1200)
  }
}
