package graft.queries

/** Oracles for the dashboard-flow entries that ARE recomputable by
  * DuckDB (the render-JSON entries sh01-sh04 stay rows-only). */
object DashboardOracles {
  val oracles: Map[String, String] = Map(
    "dl01_download_flow" -> """
      SELECT 'click' AS evtype, count(*) AS n FROM events WHERE event_type = 'click'""",

    "sum01_summarize" -> """
      SELECT column_name, min AS min_v, max AS max_v, count AS n
      FROM (SUMMARIZE nation)
      ORDER BY column_name""",

    // the HTTP slice's golden status codes + payload checks: the entry
    // asserts body contents in-process; the oracle pins the contract
    "http01_api_slice" -> """
      SELECT route, CAST(status AS BIGINT) AS status, ok
      FROM (VALUES ('dashboards', 200, true), ('data', 202, true),
                   ('sql', 200, true), ('unauth', 401, true),
                   ('validate', 200, true)) t(route, status, ok)
      ORDER BY route"""
  )
}
