package graft

import graft.interp.Dashboard
import graft.interp.Dashboard.RunConfig
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Remaining render-type decision-tree coverage (ref decision order:
  * get_dashboard.go:874-1347) beyond DashboardSpec's chart cases. */
class RenderTreeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(sql: String, cfg: RunConfig = RunConfig()) = Dashboard.run(spark, sql, cfg)

  test("piechart with category and color") {
    val q = run(
      """SELECT 10.0::PIECHART AS v, 'a'::PIECHART_CATEGORY AS c, '#f00'::PIECHART_COLOR AS col
        |UNION ALL SELECT 20.0::PIECHART, 'b'::PIECHART_CATEGORY, '#0f0'::PIECHART_COLOR""".stripMargin)
      .sections.head.queries.head
    assert(q.render.renderType == "piechart")
    assert(q.columns.map(_.tag) == Seq("value", "category", "color"))
  }

  test("donutchart via DONUTCHART") {
    val q = run("SELECT 10.0::DONUTCHART AS v, 'a'::CATEGORY AS c")
      .sections.head.queries.head
    assert(q.render.renderType == "donutchart")
    assert(q.columns.map(_.tag) == Seq("value", "category"))
  }

  test("value with COMPARE (1 row, 2 cols)") {
    val q = run("SELECT 100.0 AS now, 90.0::COMPARE AS prev")
      .sections.head.queries.head
    assert(q.render.renderType == "value")
    assert(q.columns.map(_.tag) == Seq("value", "compare"))
  }

  test("TEXT_MEDIUM value size tag") {
    val q = run("SELECT 'big number'::TEXT_MEDIUM AS v").sections.head.queries.head
    assert(q.render.renderType == "value")
    assert(q.columns.head.tag == "medium")
  }

  test("table with TREND columns") {
    val q = run(
      """SELECT 'a' AS name, 1.5::TREND AS t1, 2.5::TREND AS t2
        |UNION ALL SELECT 'b', 3.0::TREND, 4.0::TREND""".stripMargin)
      .sections.head.queries.head
    assert(q.render.renderType == "table")
    assert(q.columns.map(_.tag) == Seq("", "trend", "trend"))
  }

  test("placeholder") {
    val q = run("SELECT 'No data yet'::PLACEHOLDER AS p").sections.head.queries.head
    assert(q.render.renderType == "placeholder")
  }

  test("input widget collects URL param into variables") {
    val r = run(
      """SELECT 'Search term'::INPUT AS term;
        |SELECT getvariable('term') AS v;""".stripMargin,
      RunConfig(queryParams = Map("term" -> Seq("hello"))))
    assert(r.sections.head.queries.head.render.renderType == "input")
    assert(r.sections(1).queries.head.rows.head.head == "hello")
  }

  test("dropdownMulti defaults to all rows; multi var renders as array") {
    val r = run(
      """SELECT 'a'::DROPDOWN_MULTI AS pick UNION ALL SELECT 'b'::DROPDOWN_MULTI;
        |SELECT array_join(getvariable('pick'), '|') AS joined;""".stripMargin)
    assert(r.sections.head.queries.head.render.renderType == "dropdownMulti")
    assert(r.sections(1).queries.head.rows.head.head == "a|b")
  }

  test("daterangePicker: TO date gets end-of-day timestamp") {
    val r = run(
      """SELECT DATE '2024-01-01'::DATEPICKER_FROM AS t_from, DATE '2024-01-31'::DATEPICKER_TO AS t_to;
        |SELECT CAST(getvariable('t_to') AS STRING) AS v;""".stripMargin)
    assert(r.sections.head.queries.head.render.renderType == "daterangePicker")
    assert(r.sections(1).queries.head.rows.head.head.toString.contains("23:59:59"))
  }

  test("HEADER_IMAGE / FOOTER_LINK captured as meta") {
    val r = run(
      """SELECT 'https://x/img.png'::HEADER_IMAGE;
        |SELECT 'https://x'::FOOTER_LINK;
        |SELECT 1 AS v;""".stripMargin)
    assert(r.headerImage.contains("https://x/img.png"))
    assert(r.footerLink.contains("https://x"))
    assert(r.sections.length == 1)
  }

  test("download button: URL synthesized, next statement skipped (get_dashboard.go:202-269)") {
    val r = run(
      """SELECT 'report'::DOWNLOAD_CSV AS dl;
        |SELECT * FROM range(10);
        |SELECT 99 AS visible;""".stripMargin,
      RunConfig(dashboardId = "dash-x"))
    val button = r.sections.head.queries.head
    assert(button.render.renderType == "button")
    assert(button.columns.head.tag == "download")
    val url = button.rows.head.head.toString
    assert(url.startsWith("api/dashboards/dash-x/download/report.csv?"))
    assert(url.contains("query_id=1"))
    // the statement AFTER the download button is skipped; the next one runs
    val visibleRows = r.sections.flatMap(_.queries).flatMap(_.rows).flatten
    assert(visibleRows.exists(v => v == 99))
    assert(!visibleRows.exists(v => v == 5L || v == 5))
  }

  test("PDF download with ID indirection (get_dashboard_test.go:38-69)") {
    val r = run(
      """SELECT 'target-dash'::ID AS id, 'Download'::DOWNLOAD_PDF AS dl;""".stripMargin,
      RunConfig(dashboardId = "src-dash"))
    val q = r.sections.head.queries.head
    assert(q.render.renderType == "button")
    val url = q.rows.head(1).toString
    assert(url.startsWith("api/dashboards/target-dash/download/Download.pdf"))
  }

  test("boxplot over groups via interpreter + BOXPLOT aggregate") {
    val q = run(
      """SELECT 'grp-a'::XAXIS AS g, BOXPLOT(v) AS bp FROM (
        |  SELECT 1.0 AS v UNION ALL SELECT 5.0 UNION ALL SELECT 9.0
        |) GROUP BY 1""".stripMargin).sections.head.queries.head
    assert(q.render.renderType == "boxplot")
    assert(q.columns.map(_.tag) == Seq("index", "value"))
  }

  test("gauge percent defaults to [0,1] range") {
    val q = run("SELECT 0.65::GAUGE_PERCENT AS pct").sections.head.queries.head
    assert(q.render.renderType == "gauge")
    assert(q.render.gaugeCategories == Seq(graft.render.Model.GaugeCategory(0.0, 1.0, "", "")))
  }
}
