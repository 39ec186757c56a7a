package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2 + training-data
  * pipeline ops); `oracleSql` holds the DuckDB-equivalent SQL for each
  * (omitted only for ops DuckDB cannot express — those get rows-only
  * checks).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's canonical README demo (README.md:12-19):
    * weekly event counts by category — here over the `events` table.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.t(spark, dir, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("week", "event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreSql.defs ++ graft.queries.PipelineOps.defs ++
      graft.queries.Dashboards.defs ++ graft.queries.EngineOps.defs ++
      graft.queries.MediaCatalogOps.defs

  def oracleSql: Map[String, String] =
    graft.queries.CoreSql.oracles ++ graft.queries.PipelineOps.oracles ++
      graft.queries.EngineOps.oracles ++ graft.queries.MediaCatalogOps.oracles ++
      graft.queries.DashboardOracles.oracles
}
