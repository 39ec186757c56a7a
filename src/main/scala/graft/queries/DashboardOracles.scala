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
      ORDER BY column_name"""
  )
}
