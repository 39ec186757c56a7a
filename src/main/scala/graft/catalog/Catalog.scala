package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema introspection: databases → tables → columns as both a
  * DataFrame and a JSON document (ref: server/core/duckdb_schema.go —
  * the databases()/tables()/columns() catalog walk; enums/constraints
  * are DuckDB-only and modeled thin, as SURVEY.md §2 notes).
  */
object Catalog {

  /** Spark type → the reference's DuckDB-ish type vocabulary. */
  def duckTypeName(dt: DataType): String = dt match {
    case BooleanType => "BOOLEAN"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BinaryType => "BLOB"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(et, _) => duckTypeName(et) + "[]"
    case MapType(k, v, _) => s"MAP(${duckTypeName(k)}, ${duckTypeName(v)})"
    case s: StructType =>
      s.fields.map(f => "\"" + f.name + "\" " + duckTypeName(f.dataType))
        .mkString("STRUCT(", ", ", ")")
    case _: DayTimeIntervalType | _: YearMonthIntervalType | CalendarIntervalType => "INTERVAL"
    case other => other.simpleString.toUpperCase
  }

  /** All columns of all tables/views visible in the session, one row per
    * column (table_name, column_name, ordinal, data_type, nullable). */
  def columns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq
      .sortBy(_.name)
      .flatMap { t =>
        val schema = spark.table(t.name).schema
        schema.fields.zipWithIndex.map { case (f, i) =>
          (t.name, f.name, i + 1, duckTypeName(f.dataType), f.nullable)
        }
      }
    rows.toDF("table_name", "column_name", "ordinal", "data_type", "nullable")
  }

  /** JSON schema document (the /api/schema shape: databases → schemas →
    * tables/views with comments and view definitions, ref:
    * duckdb_schema.go:10-360 + duckdb_schema_test.go:18-117. Enums and
    * constraints are DuckDB-only — emitted as empty lists so consumers
    * of the reference shape parse unchanged. */
  /** Ignore-list semantics from the reference (duckdb_schema.go:346-360):
    * `db` hides a whole database, `db.schema` a schema, `db.schema.obj`
    * one table/view. The Spark catalog surfaces as database `memory`,
    * schema `main` — the reference's in-memory-mode names. */
  private def shouldIgnore(ignore: Seq[String], database: String,
      schema: String, obj: String): Boolean =
    ignore.exists(_.split("\\.") match {
      case Array(d) => database == d
      case Array(d, s) => schema.nonEmpty && database == d && schema == s
      case Array(d, s, o) => obj.nonEmpty && database == d && schema == s && obj == o
      case _ => false
    })

  def schemaJson(spark: SparkSession, ignore: Seq[String] = Nil): String = {
    if (shouldIgnore(ignore, "memory", "", ""))
      return graft.render.Model.jsonValue(Map("databases" -> Seq.empty[String]))
    if (shouldIgnore(ignore, "memory", "main", ""))
      return graft.render.Model.jsonValue(Map("databases" -> Seq(
        Map("name" -> "memory", "schemas" -> Seq.empty[String]))))
    val all = spark.catalog.listTables().collect().toSeq.sortBy(_.name)
      .filterNot(t => shouldIgnore(ignore, "memory", "main", t.name))
    def colsOf(name: String) = spark.table(name).schema.fields.map { f =>
      Map("name" -> f.name, "type" -> duckTypeName(f.dataType),
        "nullable" -> f.nullable,
        "comment" -> f.getComment().getOrElse(""))
    }.toSeq
    val (viewish, tabley) = all.partition(t =>
      t.tableType == "VIEW" || t.tableType == "TEMPORARY")
    val tables = tabley.map { t =>
      Map("name" -> t.name, "type" -> t.tableType.toLowerCase,
        "comment" -> Option(t.description).getOrElse(""),
        "columns" -> colsOf(t.name), "constraints" -> Seq.empty[String])
    }
    val views = viewish.map { t =>
      val definition =
        try spark.sql(s"SHOW CREATE TABLE `${t.name}`").head.getString(0)
        catch { case _: Exception => "" } // temp views have no stored DDL
      Map("name" -> t.name, "type" -> t.tableType.toLowerCase,
        "comment" -> Option(t.description).getOrElse(""),
        "definition" -> definition, "columns" -> colsOf(t.name))
    }
    graft.render.Model.jsonValue(Map("databases" -> Seq(
      Map("name" -> "memory", "schemas" -> Seq(
        Map("name" -> "main", "tables" -> tables, "views" -> views,
          "enums" -> Seq.empty[String]))))))
  }
}
