package graft.queries

/** Oracles for the dashboard-flow entries. The render-tree entries
  * sh01-sh04 pin CONSTANTS (like au01/http01): DuckDB cannot recompute
  * a render tree, but the entries are deterministic functions of the
  * fixed sf0.01 corpus — the golden shapes, counts, serialized JSON,
  * and JWT-variable precedence values are pinned verbatim, so ANY
  * interpreter/render/serialization drift hash-fails the gate. */
object DashboardOracles {
  val oracles: Map[String, String] = Map(
    "sh01_dashboard_render" -> """
      SELECT * FROM (VALUES (0, 0, 'content', 'barchartHorizontalStacked',
        'Sessions per Week', 'index,category,value', 25))
        t(section, "query", section_type, render_type, label, tags, n_rows)""",

    "sh02_dashboard_json" -> ("SELECT '" +
      """{"name":"","sections":[{"type":"content","title":null,"queries":[{"render":{"type":"barchartHorizontalStacked","label":"Sessions per Week"},"columns":[{"name":"XAXIS(date_trunc(week, ts))","type":"date","nullable":false,"tag":"index"},{"name":"CATEGORY(event_type)","type":"string","nullable":false,"tag":"category"},{"name":"BARCHART_STACKED(count(1))","type":"number","nullable":false,"tag":"value"}],"rows":[[1704067200000,"click",493],[1704067200000,"error",459],[1704067200000,"purchase",488],[1704067200000,"signup",460],[1704067200000,"view",448],[1704672000000,"click",432],[1704672000000,"error",470],[1704672000000,"purchase",446],[1704672000000,"signup",493],[1704672000000,"view",479],[1705276800000,"click",481],[1705276800000,"error",497],[1705276800000,"purchase",450],[1705276800000,"signup",469],[1705276800000,"view",431],[1705881600000,"click",469],[1705881600000,"error",461],[1705881600000,"purchase",454],[1705881600000,"signup",468],[1705881600000,"view",478],[1706486400000,"click",131],[1706486400000,"error",127],[1706486400000,"purchase",143],[1706486400000,"signup",127],[1706486400000,"view",146]]}]}],"minTimeValue":1704067200000,"maxTimeValue":1706486400000}""" +
      "' AS dashboard_json"),

    "sh03_dashboard_widgets" -> """
      SELECT * FROM (VALUES
        ('header', 'dropdown', '', 2, 0),
        ('content', 'gauge', '', 1, 1),
        ('content', 'table', 'Top users', 5, 0))
        t(section_type, render_type, label, n_rows, n_gauge_cats)""",

    "sh04_secure_dashboard" -> """
      SELECT * FROM (VALUES ('purchase', ''), ('click', ''), ('purchase', '1981'))
        t("value", extra)""",

    "sh05_render_golden" -> """
      SELECT * FROM (VALUES
        (CAST(1785837600000 AS BIGINT), true, CAST(1785844800000 AS BIGINT),
         'timestamp', 4))
        t(xline_ms, yline_is_y, reload_at, xaxis_type, n_queries)""",

    "dl01_download_flow" -> """
      SELECT 'click' AS evtype, count(*) AS n FROM events WHERE event_type = 'click'""",

    "sum01_summarize" -> """
      SELECT column_name, min AS min_v, max AS max_v, count AS n
      FROM (SUMMARIZE nation)
      ORDER BY column_name""",

    // login-surface goldens: every check must hold (constants by design,
    // like http01 — the entry computes them live against real hashes)
    "au01_auth_flow" -> """
      SELECT check_name, true AS ok FROM (VALUES
        ('folded_email_logs_in'), ('fresh_hash_is_2b10'),
        ('fresh_hash_roundtrips'), ('reference_hash_verifies'),
        ('session_validates'), ('unknown_email_fails'),
        ('wrong_password_fails')) t(check_name)
      ORDER BY check_name""",

    // op #33 PNG render: geometry-only goldens (page dims + exact
    // palette pixel counts — text pixels are ink-colored and excluded,
    // so these constants depend only on chart geometry; captured at
    // sf0.01, the gate's scale)
    "png01_png_render" -> """
      SELECT metric, CAST(v AS BIGINT) AS value
      FROM (VALUES
        ('#3b6fb6', 37433), ('#3f9e63', 32232), ('#4fa9b8', 0),
        ('#7d5fa8', 32266), ('#d95f4b', 32776), ('#e0a83a', 32844),
        ('height', 1178), ('width', 1200)) t(metric, v)
      ORDER BY metric""",

    // the HTTP slice's golden status codes + payload checks: the entry
    // asserts body contents in-process; the oracle pins the contract
    "http01_api_slice" -> """
      SELECT route, CAST(status AS BIGINT) AS status, ok
      FROM (VALUES ('dashboards', 200, true), ('data', 202, true),
                   ('sql', 200, true), ('unauth', 401, true),
                   ('validate', 200, true)) t(route, status, ok)
      ORDER BY route""",

    // round-4 control/listing/deploy/download-intent plane goldens
    "http02_control_plane" -> """
      SELECT route, CAST(status AS BIGINT) AS status, ok
      FROM (VALUES ('apps', 200, true), ('config', 200, true),
                   ('deploy', 200, true), ('download', 200, true),
                   ('info', 200, true), ('metrics', 200, true),
                   ('reset', 200, true), ('setup', 200, true),
                   ('status', 200, true), ('version', 200, true))
        t(route, status, ok)
      ORDER BY route"""
  )
}
