package graft.queries

import graft.Tables
import graft.interp.Dashboard
import graft.interp.Dashboard.RunConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dashboard-interpreter entries in the driver contract: run a full
  * multi-statement shaper dashboard (LABEL / ::TYPE tags / sections /
  * variables) through graft.interp.Dashboard and surface the render
  * result as a DataFrame. Rows-only checks (the render JSON contract has
  * no DuckDB-SQL equivalent — correctness is covered by DashboardSpec,
  * transliterated from the reference's get_dashboard_test.go).
  */
object Dashboards {

  /** The canonical README demo (README.md:12-19) over `events`. */
  private val demoContent =
    """SELECT 'Sessions per Week'::LABEL;
      |SELECT date_trunc('week', ts)::XAXIS, event_type::CATEGORY,
      |       count()::BARCHART_STACKED
      |FROM events GROUP BY ALL ORDER BY ALL;""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dl01_download_flow" -> ((s, d) => {
      // full download path: dropdown default replayed into the variable,
      // CSV streamed, parsed back for the oracle
      val content =
        """SELECT 'click'::DROPDOWN AS evtype UNION ALL SELECT 'view'::DROPDOWN;
          |SELECT 'evts.csv'::DOWNLOAD_CSV AS dl;
          |SELECT getvariable('evtype') AS evtype, CAST(count(*) AS BIGINT) AS n
          |FROM events WHERE event_type = getvariable('evtype') GROUP BY 1;""".stripMargin
      val w = new java.io.StringWriter
      graft.interp.Download.run(s, content, "csv", w,
        prepare = ss => Tables.registerAll(ss, d))
        .left.foreach(err => throw new IllegalStateException(err))
      import s.implicits._
      w.toString.split("\n").drop(1).filter(_.nonEmpty).toSeq
        .map { line => val p = line.split(","); (p(0), p(1).toLong) }
        .toDF("evtype", "n")
    }),

    "sum01_summarize" -> ((s, d) => {
      // SUMMARIZE through the interpreter, checked against DuckDB's
      // native SUMMARIZE on its deterministic columns (min/max/count —
      // avg/std/quantiles use approximate or differently-formatted
      // algorithms on each engine)
      val r = Dashboard.run(s, "SUMMARIZE nation",
        RunConfig(dashboardId = "sum", prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.head.queries.head.rows.map { row =>
        (String.valueOf(row(0)), String.valueOf(row(2)), String.valueOf(row(3)),
          row(10).toString.toLong)
      }.toDF("column_name", "min_v", "max_v", "n").orderBy("column_name")
    }),

    "sh01_dashboard_render" -> ((s, d) => {
      val r = Dashboard.run(s, demoContent,
        RunConfig(dashboardId = "demo", prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.zipWithIndex.flatMap { case (sec, si) =>
        sec.queries.zipWithIndex.map { case (q, qi) =>
          (si, qi, sec.sectionType, q.render.renderType,
            q.render.label.getOrElse(""), q.columns.map(_.tag).mkString(","),
            q.rows.length)
        }
      }.toDF("section", "query", "section_type", "render_type", "label", "tags", "n_rows")
    }),

    "sh02_dashboard_json" -> ((s, d) => {
      val r = Dashboard.run(s, demoContent,
        RunConfig(dashboardId = "demo", prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      Seq(graft.render.Model.toJson(r)).toDF("dashboard_json")
    }),

    "sh04_secure_dashboard" -> ((s, d) => {
      // full auth flow: sign JWT with protected variables -> verify ->
      // render; a malicious URL param must NOT override the JWT value
      // (the reference's security-critical test, get_dashboard_test.go:166-190)
      val claims = graft.auth.Auth.Claims(
        dashboardId = Some("secure-demo"),
        variables = Map("evtype" -> "purchase"),
        isPublic = false, longLived = false,
        exp = System.currentTimeMillis() / 1000 + 900)
      val token = graft.auth.Auth.sign(claims, "demo-secret")
      val verified = graft.auth.Auth.verify(token, "demo-secret")
        .getOrElse(throw new IllegalStateException("token verification failed"))
      val content =
        """SELECT 'purchase'::DROPDOWN AS evtype UNION ALL SELECT 'click'::DROPDOWN;
          |SELECT getvariable('evtype') AS effective, count(*) AS n
          |FROM events WHERE event_type = getvariable('evtype') GROUP BY 1;""".stripMargin
      val r = Dashboard.run(s, content, RunConfig(
        dashboardId = "secure-demo",
        queryParams = Map("evtype" -> Seq("click")), // attack attempt
        variables = verified.variables,
        prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.flatMap(_.queries).flatMap(_.rows).map(row =>
        (String.valueOf(row.head), String.valueOf(row.lift(1).getOrElse(""))))
        .toDF("value", "extra")
    }),

    "sh03_dashboard_widgets" -> ((s, d) => {
      // widgets + variables + sections + gauge in one dashboard
      val content =
        """SELECT 'Widget Demo'::SECTION;
          |SELECT 'click'::DROPDOWN AS evtype UNION ALL SELECT 'view'::DROPDOWN;
          |SELECT count(*)::GAUGE AS n FROM events WHERE event_type = getvariable('evtype');
          |SELECT 'Top users'::LABEL;
          |SELECT user_id, count(*) AS n FROM events
          |WHERE event_type = getvariable('evtype')
          |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 5;""".stripMargin
      val r = Dashboard.run(s, content,
        RunConfig(dashboardId = "widgets", prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.flatMap(sec => sec.queries.map(q =>
        (sec.sectionType, q.render.renderType, q.render.label.getOrElse(""),
          q.rows.length, q.render.gaugeCategories.length)))
        .toDF("section_type", "render_type", "label", "n_rows", "n_gauge_cats")
    })
  )
}
