package graft.catalog

import org.apache.spark.sql.SparkSession

/** SQL-callable `duckdb_*` catalog table functions (round-2 review
  * item #6). The reference's schema walk queries these directly from
  * SQL (ref: server/core/duckdb_schema.go:21-287); here each name is
  * backed by a session temp view rebuilt from the Spark catalog when a
  * statement references it, and the dialect layer strips the `()` call
  * syntax so `FROM duckdb_columns()` resolves. Driver-side cost is one
  * catalog listing per referencing statement — metadata-sized, never a
  * data scan.
  *
  * Mapping: Spark has no database/schema split, so the whole session is
  * the `memory` database and each Spark database is a schema
  * (`default` → `main`) — the same shape `Catalog.schemaJson` emits.
  * Managed/external tables land in duckdb_tables; views and temp views
  * land in duckdb_views (temp views have no stored SQL). duckdb_types /
  * duckdb_extensions / duckdb_secrets / duckdb_constraints exist with
  * the reference-queried columns and are empty — Spark has no enums,
  * loadable extensions, or secrets, and the reference tolerates empty
  * results on all four paths.
  */
object CatalogFunctions {

  val names: Set[String] = Set(
    "duckdb_databases", "duckdb_schemas", "duckdb_tables", "duckdb_columns",
    "duckdb_views", "duckdb_types", "duckdb_extensions", "duckdb_secrets",
    "duckdb_constraints")

  /** Cheap pre-check before paying for a catalog refresh. */
  def referenced(sql: String): Boolean = {
    val lower = sql.toLowerCase
    lower.contains("duckdb_") && names.exists(lower.contains)
  }

  private def schemaNameOf(sparkDb: String): String =
    if (sparkDb == "default") "main" else sparkDb

  /** (Re)build the duckdb_* temp views from the current Spark catalog
    * and register the polite `enum_range` error. */
  def refresh(spark: SparkSession): Unit = {
    import spark.implicits._

    Seq(("memory", false), ("system", true), ("temp", true))
      .toDF("database_name", "internal")
      .createOrReplaceTempView("duckdb_databases")

    val dbs = spark.catalog.listDatabases().collect().map(_.name).toSeq.sorted
    dbs.map(db => ("memory", schemaNameOf(db)))
      .toDF("database_name", "schema_name")
      .createOrReplaceTempView("duckdb_schemas")

    val all = dbs.flatMap { db =>
      spark.catalog.listTables(db).collect().toSeq.map(t => (db, t))
    }
    // temp views repeat in every per-db listing — dedup those by bare
    // name; persistent tables are distinct per (db, name), so two
    // same-named tables in different databases both survive
    val seen = scala.collection.mutable.Set.empty[String]
    val entries = all.filter { case (db, t) =>
      val key = (if (t.tableType == "TEMPORARY") "" else db) + ":" + t.name
      seen.add(key)
    }

    val (viewish, tabley) = entries.partition { case (_, t) =>
      t.tableType == "VIEW" || t.tableType == "TEMPORARY"
    }

    tabley.map { case (db, t) =>
      ("memory", schemaNameOf(db), t.name, Option(t.description).getOrElse(""),
        false, false)
    }.toDF("database_name", "schema_name", "table_name", "comment",
      "internal", "temporary")
      .createOrReplaceTempView("duckdb_tables")

    viewish.map { case (db, t) =>
      val sql =
        if (t.tableType == "VIEW")
          try spark.sql(s"SHOW CREATE TABLE `${t.name}`").head.getString(0)
          catch { case _: Exception => "" }
        else "" // temp views have no stored DDL
      ("memory", schemaNameOf(if (t.tableType == "TEMPORARY") "default" else db),
        t.name, Option(t.description).getOrElse(""), sql, false)
    }.toDF("database_name", "schema_name", "view_name", "comment", "sql", "internal")
      .createOrReplaceTempView("duckdb_views")

    entries.flatMap { case (db, t) =>
      val qualified =
        if (t.tableType == "TEMPORARY" || db == "default") t.name else s"$db.${t.name}"
      val schema =
        try spark.table(qualified).schema
        catch { case _: Exception => new org.apache.spark.sql.types.StructType() }
      val schemaName =
        schemaNameOf(if (t.tableType == "TEMPORARY") "default" else db)
      schema.fields.zipWithIndex.map { case (f, i) =>
        ("memory", schemaName, t.name, f.name, i + 1,
          Catalog.duckTypeName(f.dataType), f.nullable,
          null.asInstanceOf[String], f.getComment().getOrElse(""))
      }
    }.toDF("database_name", "schema_name", "table_name", "column_name",
      "column_index", "data_type", "is_nullable", "column_default", "comment")
      .createOrReplaceTempView("duckdb_columns")

    // reference-queried shapes, empty on Spark (no enums / extensions /
    // secrets / constraints)
    Seq.empty[(String, String, String, Boolean)]
      .toDF("schema_name", "type_name", "logical_type", "internal")
      .createOrReplaceTempView("duckdb_types")
    Seq.empty[(String, String, Boolean, Boolean)]
      .toDF("extension_name", "description", "loaded", "installed")
      .createOrReplaceTempView("duckdb_extensions")
    Seq.empty[(String, String, String, Seq[String])]
      .toDF("name", "type", "provider", "scope")
      .createOrReplaceTempView("duckdb_secrets")
    Seq.empty[(String, String, String, String, String)]
      .toDF("database_name", "schema_name", "table_name",
        "constraint_type", "constraint_text")
      .createOrReplaceTempView("duckdb_constraints")

    spark.udf.register("enum_range", (_: String) => {
      throw new UnsupportedOperationException(
        "enum_range: ENUM types are not supported by this engine")
      "": String
    })
  }
}
