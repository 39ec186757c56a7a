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
