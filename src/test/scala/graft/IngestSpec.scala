package graft

import graft.ingest.{IngestPipeline, IngestStream, SchemaInfer}
import graft.ingest.SchemaInfer._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ingest tests transliterated from the reference's largest suite
  * (server/ingest/ingest_test.go): schema detection / type vote,
  * timestamp/date string detection, processBatch E2E, schema evolution,
  * mixed types, `_id`/`_ts` precedence, column order, unix s/ms. */
class IngestSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  // run-unique prefix: the warehouse dir outlives the in-memory catalog
  // across JVM runs, so fixed names would collide with stale directories
  private val runId = java.lang.Long.toString(System.nanoTime(), 36)
  private var counter = 0
  private def freshTable(): String = { counter += 1; s"ingest_${runId}_t$counter" }

  test("type vote matrix (ingest_test.go:137-233)") {
    def vote(jsons: String*): String =
      determineColumnType(jsons.map(j => parseOrdered(s"""{"v":$j}""").fields.head._2))
    assert(vote("true", "false") == "BOOLEAN")
    assert(vote("1", "2.5") == "DOUBLE")
    assert(vote("\"a\"", "\"b\"") == "VARCHAR")
    assert(vote("\"2023-01-15T10:30:45Z\"") == "TIMESTAMP")
    assert(vote("\"2023-01-15\"") == "DATE")
    assert(vote("\"2023-01-15\"", "\"2023-01-15T10:30:45Z\"") == "VARCHAR") // mixed date+ts
    assert(vote("1", "\"x\"") == "JSON") // mixed number+string
    assert(vote("{\"a\":1}") == "JSON")
    assert(vote("[1,2]") == "JSON")
    assert(vote("null", "true") == "BOOLEAN") // nulls ignored
    assert(determineColumnType(Nil) == "JSON")
  }

  test("timestamp/date string detection (ingest_test.go:234-289)") {
    assert(isTimestampString("2023-01-15T10:30:45Z"))
    assert(isTimestampString("2023-01-15T10:30:45.123456789Z"))
    assert(isTimestampString("2023-01-15 10:30:45"))
    assert(isTimestampString("2023-01-15T10:30:45"))
    assert(!isTimestampString("2023-01-15"))
    assert(isDateString("2023-01-15"))
    assert(isDateString("01/15/2023")) // MM/DD/YYYY
    assert(isDateString("15/01/2023")) // DD/MM/YYYY
    assert(isDateString("15.01.2023")) // DD.MM.YYYY
    assert(!isDateString("not a date"))
    assert(!isDateString("2023-01-15T10:30:45Z"))
  }

  test("processBatch E2E: basic typed object (ingest_test.go:290-315)") {
    val table = freshTable()
    val msg = Message(table,
      """{"id": 1, "name": "John Doe", "is_active": true,
         "created": "2023-01-15T10:30:45Z", "metadata": {"role": "admin"}}""")
    val counts = IngestPipeline.processBatch(spark, Seq(msg))
    assert(counts == Map(table -> 1L))
    val df = spark.table(table)
    // order preserved, _id/_ts prepended
    assert(df.columns.toSeq == Seq("_id", "_ts", "id", "name", "is_active", "created", "metadata"))
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("id") == "double")
    assert(types("name") == "string")
    assert(types("is_active") == "boolean")
    assert(types("created") == "timestamp")
    assert(types("metadata") == "string") // JSON stored as text
    val row = df.collect().head
    assert(row.getAs[Double]("id") == 1.0)
    assert(row.getAs[String]("metadata") == """{"role":"admin"}""")
    assert(row.getAs[java.sql.Timestamp]("created").toInstant.toString == "2023-01-15T10:30:45Z")
  }

  test("republished message ids dedup within a batch (JetStream Nats-Msg-Id window)") {
    val table = freshTable()
    val msgs = Seq(
      Message(table, """{"_id": "dup-1", "v": 1}"""),
      Message(table, """{"_id": "dup-1", "v": 1}"""), // exact republish
      Message(table, """{"v": 2}""", Some("hdr-1")),
      Message(table, """{"v": 3}""", Some("hdr-1")), // same header id
      Message(table, """{"v": 4}"""), // no id: generated, never dropped
      Message(table, """{"v": 5}"""))
    val counts = IngestPipeline.processBatch(spark, msgs)
    assert(counts == Map(table -> 4L)) // dup-1 once, hdr-1 once, 2 generated
    val ids = spark.table(table).collect().map(_.getAs[String]("_id")).toSeq
    assert(ids.count(_ == "dup-1") == 1)
    assert(ids.count(_ == "hdr-1") == 1)
  }

  test("parquet schema cache invalidates when a path is rewritten (advice r2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cache").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "old_col").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(graft.Tables.t(spark, dir, "t").columns.toSeq == Seq("k", "old_col"))
    assert(graft.Tables.t(spark, dir, "t").columns.toSeq == Seq("k", "old_col")) // cached
    // rewrite with a different schema: must re-infer, not silently null
    Seq((2L, 3.5)).toDF("k", "new_col").write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(graft.Tables.t(spark, dir, "t").columns.toSeq == Seq("k", "new_col"))
  }

  test("non-string _id never dedups: publishers set fresh header ids for them (events.go:72-79, advice r2)") {
    val table = freshTable()
    // two events sharing a numeric _id in one batch are distinct events —
    // the reference only sets Nats-Msg-Id from non-empty STRING _ids
    val msgs = Seq(
      Message(table, """{"_id": 42, "v": 1}"""),
      Message(table, """{"_id": 42, "v": 2}"""))
    val counts = IngestPipeline.processBatch(spark, msgs)
    assert(counts == Map(table -> 2L))
  }

  test("_id/_ts precedence: msg > header > generated (ingest_test.go:1427-1514)") {
    val table = freshTable()
    val meta = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val msgs = Seq(
      Message(table, """{"regular_field": "value1"}""", None, meta),
      Message(table,
        """{"_id": "explicit-id-123", "_ts": "2023-05-15T10:30:00Z", "regular_field": "value2"}""",
        None, meta),
      Message(table, """{"regular_field": "value3"}""", Some("header-id-456"), meta))
    IngestPipeline.processBatch(spark, msgs)
    val rows = spark.table(table).orderBy("regular_field").collect()
    // row1: generated id + meta ts
    assert(rows(0).getAs[String]("_id").nonEmpty)
    assert(rows(0).getAs[java.sql.Timestamp]("_ts") == meta)
    // row2: explicit
    assert(rows(1).getAs[String]("_id") == "explicit-id-123")
    assert(rows(1).getAs[java.sql.Timestamp]("_ts").toInstant.toString == "2023-05-15T10:30:00Z")
    // row3: header id
    assert(rows(2).getAs[String]("_id") == "header-id-456")
  }

  test("schema evolution: ALTER TABLE ADD COLUMN (ingest_test.go:592-779)") {
    val table = freshTable()
    IngestPipeline.processBatch(spark, Seq(Message(table, """{"a": 1}""")))
    IngestPipeline.processBatch(spark, Seq(Message(table, """{"a": 2, "b": "x"}""")))
    val df = spark.table(table)
    assert(df.columns.toSeq == Seq("_id", "_ts", "a", "b"))
    val rows = df.orderBy("a").collect()
    assert(rows(0).getAs[Any]("b") == null) // old row NULL for new column
    assert(rows(1).getAs[String]("b") == "x")
    // removed columns: batch 3 without 'a' inserts NULL
    IngestPipeline.processBatch(spark, Seq(Message(table, """{"b": "y"}""")))
    assert(spark.table(table).filter("a IS NULL AND b = 'y'").count() == 1)
  }

  test("append into user-created columns converts by the ACTUAL type; out-of-range narrows to NULL") {
    // a CTAS table carries types ingest never infers — the conversion
    // must target the real column type (ref: appender switches on the
    // DuckDB column type, ingest.go:680-778)
    val table = freshTable()
    spark.sql(s"CREATE TABLE $table (_id STRING, _ts TIMESTAMP, " +
      "n_long BIGINT, n_int INT, n_byte TINYINT, n_dec DECIMAL(6,2), " +
      "arr ARRAY<DOUBLE>, kv MAP<STRING,BIGINT>) USING PARQUET")
    IngestPipeline.processBatch(spark, Seq(Message(table,
      """{"_id": "c1", "n_long": 9000000000, "n_int": 42, "n_byte": 300,
         "n_dec": 12.345, "arr": [1.5, 2.5], "kv": {"a": 7}}""")))
    val r = spark.table(table).collect().head
    assert(r.getAs[Long]("n_long") == 9000000000L)
    assert(r.getAs[Int]("n_int") == 42)
    // 300 exceeds TINYINT: NULL, never a wrapped 44
    assert(r.getAs[Any]("n_byte") == null)
    assert(r.getAs[java.math.BigDecimal]("n_dec").doubleValue() == 12.35) // scale 2, HALF_UP
    assert(r.getAs[scala.collection.Seq[Double]]("arr").toSeq == Seq(1.5, 2.5))
    assert(r.getAs[scala.collection.Map[String, Long]]("kv").toMap == Map("a" -> 7L))
  }

  test("mixed-type column becomes JSON (ingest_test.go:780-862)") {
    val table = freshTable()
    IngestPipeline.processBatch(spark, Seq(
      Message(table, """{"v": 1}"""),
      Message(table, """{"v": "x"}""")))
    val df = spark.table(table)
    assert(df.schema("v").dataType.simpleString == "string")
    assert(df.select("v").orderBy("v").collect().map(_.getString(0)).toSeq == Seq("1", "x"))
  }

  test("unix seconds vs milliseconds heuristic (ingest_test.go:863-1004)") {
    assert(parseUnixTimestamp(1700000000.0).toInstant.getEpochSecond == 1700000000L)
    assert(parseUnixTimestamp(1700000000000.0).toInstant.toEpochMilli == 1700000000000L)
    val table = freshTable()
    IngestPipeline.processBatch(spark, Seq(
      Message(table, """{"_ts": 1700000000, "v": "s"}"""),
      Message(table, """{"_ts": 1700000000123, "v": "ms"}""")))
    val byV = spark.table(table).collect().map(r => r.getAs[String]("v") ->
      r.getAs[java.sql.Timestamp]("_ts").toInstant.toEpochMilli).toMap
    assert(byV("s") == 1700000000000L)
    assert(byV("ms") == 1700000000123L)
  }

  test("column order preservation across messages (ingest_test.go:1248-1379)") {
    val table = freshTable()
    IngestPipeline.processBatch(spark, Seq(
      Message(table, """{"z_field": 1, "a_field": 2, "m_field": 3}"""),
      Message(table, """{"a_field": 4, "new_field": 5}""")))
    assert(spark.table(table).columns.toSeq ==
      Seq("_id", "_ts", "z_field", "a_field", "m_field", "new_field"))
  }

  test("multi-part table names (ingest_test.go:422-513)") {
    assert(IngestPipeline.quoteTable("db.schema.t") == "`db`.`schema`.`t`")
    assert(IngestPipeline.quoteTable("plain") == "`plain`")
    // db.table: namespace auto-created, rows land in the right table
    val table = s"graftdb_$runId.t1"
    IngestPipeline.processBatch(spark, Seq(Message(table, """{"x": 1}""")))
    assert(spark.table(table).count() == 1)
  }

  test("streaming ingest via foreachBatch (ingest.go:86-268 analog)") {
    import spark.implicits._
    val table = freshTable()
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, String, java.sql.Timestamp)]
    val source = input.toDF().toDF("table", "json", "header_id", "meta_ts")
    val q = IngestStream.start(spark, source, triggerMillis = 100)
    input.addData((table, """{"n": 1}""", null, java.sql.Timestamp.from(java.time.Instant.now())))
    input.addData((table, """{"n": 2}""", null, java.sql.Timestamp.from(java.time.Instant.now())))
    q.processAllAvailable()
    q.stop()
    assert(spark.table(table).count() == 2)
    assert(spark.table(table).agg(org.apache.spark.sql.functions.sum("n")).collect().head.getDouble(0) == 3.0)
  }
}
