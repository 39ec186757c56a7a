package graft.queries

/** Oracles for the dashboard-flow entries that ARE recomputable by
  * DuckDB (the render-JSON entries sh01-sh04 stay rows-only). */
object DashboardOracles {
  val oracles: Map[String, String] = Map(
    "dl01_download_flow" -> """
      SELECT 'click' AS evtype, count(*) AS n FROM events WHERE event_type = 'click'"""
  )
}
