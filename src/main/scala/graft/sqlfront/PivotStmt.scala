package graft.sqlfront

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DuckDB `PIVOT`/`UNPIVOT` statement forms
  * (`PIVOT tbl ON col USING agg(x) [GROUP BY g, ...]`), which the
  * reference admits through its gate (sql_validation.go:53-54).
  *
  * DuckDB enumerates the pivot values dynamically; the Spark idiom is a
  * bounded distinct-collect of the ON column (capped at 10k values like
  * Spark's own pivot default) followed by
  * `RelationalGroupedDataset.pivot(col, values)` — values are passed
  * explicitly so the aggregation runs as ONE job with map-side partial
  * aggregation instead of one job per value.
  */
object PivotStmt {

  private val pivotRe =
    "(?is)^PIVOT\\s+(\\S+)\\s+ON\\s+(\\S+)\\s+USING\\s+(\\w+)\\s*\\(\\s*([^)]*)\\s*\\)(?:\\s+GROUP\\s+BY\\s+(.+))?\\s*$".r

  private val unpivotRe =
    "(?is)^UNPIVOT\\s+(\\S+)\\s+ON\\s+(.+?)\\s+INTO\\s+NAME\\s+(\\S+)\\s+VALUE\\s+(\\S+)\\s*$".r

  def isPivotStatement(sql: String): Boolean = {
    val u = sql.trim.toUpperCase
    u.startsWith("PIVOT") || u.startsWith("UNPIVOT")
  }

  def execute(spark: SparkSession, sql: String): DataFrame = sql.trim match {
    case pivotRe(table, onCol, aggFn, aggArg, groupBy) =>
      val df = spark.table(table)
      val values = df.select(col(onCol)).distinct()
        .orderBy(onCol).limit(10000).collect()
        .map(_.get(0)).toSeq
      val groupCols = Option(groupBy)
        .map(_.split(",").map(_.trim).toSeq)
        .getOrElse(df.columns.toSeq.filterNot(c =>
          c.equalsIgnoreCase(onCol) ||
            (aggArg.trim != "*" && c.equalsIgnoreCase(aggArg.trim))))
      val arg = if (aggArg.trim.isEmpty || aggArg.trim == "*") lit(1) else col(aggArg.trim)
      val agged = df.groupBy(groupCols.map(col): _*)
        .pivot(onCol, values)
        .agg(expr(s"$aggFn(${if (aggArg.trim.isEmpty) "*" else aggArg})"))
      // DuckDB count-pivot yields 0 for empty cells, Spark yields null
      if (aggFn.equalsIgnoreCase("count"))
        agged.na.fill(0L, values.map(String.valueOf))
      else agged
    case unpivotRe(table, onCols, nameCol, valueCol) =>
      val df = spark.table(table)
      val cols = onCols.split(",").map(_.trim.stripPrefix("(").stripSuffix(")").trim)
      val ids = df.columns.filterNot(c => cols.exists(_.equalsIgnoreCase(c)))
      df.unpivot(ids.map(col), cols.map(col),
        nameCol.stripPrefix("\"").stripSuffix("\""),
        valueCol.stripPrefix("\"").stripSuffix("\""))
    case other =>
      throw new IllegalArgumentException(s"unsupported PIVOT statement: $other")
  }
}
