package graft.queries

import graft.Tables
import graft.catalog.Catalog
import graft.ops.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract entries for multimodal column ops and catalog
  * introspection. mm01/mm02/ct01 are oracle-checked on the parts DuckDB
  * can recompute (payload sizes, frame indexing, schema listing); the
  * stubbed decoder's pixel statistics are covered by MultimodalSpec.
  */
object MediaCatalogOps {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mm01_media_meta" -> ((s, d) => {
      // binary payload + typed metadata: byte sizes and dimensions are
      // recomputable by the oracle from the source text
      Multimodal.mediaTable(s, d).toDF()
        .select(col("doc_id"), col("media_type"),
          col("meta.format").as("format"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.nBytes").as("n_bytes"))
        .orderBy("doc_id")
    }),

    "mm02_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(s, d, stride = 2).select("doc_id", "frame_idx")),

    "mm03_image_features" -> ((s, d) =>
      // decode stub output (mean/max byte) — no SQL oracle; quality
      // asserted in MultimodalSpec
      Multimodal.imageFeatures(s, d)),

    "mm04_resize" -> ((s, d) => Multimodal.resize(s, d, maxDim = 64)),

    "ex01_export_roundtrip" -> ((s, d) => {
      // CSV/JSON/XLSX writers over a real query result; CSV is re-read
      // by Spark to prove the round trip, XLSX validated as a zip
      import s.implicits._
      Tables.registerAll(s, d)
      val df = s.sql(
        """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS qty
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      val csv = { val w = new java.io.StringWriter; graft.export.Export.toCSV(df, w); w.toString }
      val json = { val w = new java.io.StringWriter; graft.export.Export.toJSON(df, w); w.toString }
      val xlsx = { val o = new java.io.ByteArrayOutputStream; graft.export.Export.toXLSX(df, o); o.toByteArray }
      val csvLines = csv.split("\n").filter(_.nonEmpty)
      val reRead = s.read.option("header", "true").csv(
        csvLines.toSeq.toDS()).count()
      val zipEntries = {
        val z = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(xlsx))
        Iterator.continually(z.getNextEntry).takeWhile(_ != null).length
      }
      Seq(
        ("csv_rows", csvLines.length.toLong - 1),
        ("csv_reread_rows", reRead),
        ("json_objects", json.count(_ == '{').toLong),
        ("xlsx_zip_entries", zipEntries.toLong)
      ).toDF("metric", "value").orderBy("metric")
    }),

    "st01_stream_windowed" -> ((s0, d) => {
      // real Structured Streaming execution: the first 5000 events
      // replayed through a memory source -> 5-minute tumbling windows ->
      // memory sink (complete mode so every window materializes).
      // Runs in a child session with few shuffle partitions: stateful
      // aggregation spins up one state store per partition, and for a
      // 5k-event replay that fixed cost dominates at 32 partitions.
      val s = s0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      import s.implicits._
      implicit val ctx = s.sqlContext
      val events = graft.Tables.t(s, d, "events")
        .orderBy("event_id").limit(5000)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[graft.streaming.Streams.Event].collect().toSeq
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Streams.Event]
      val agg = input.toDF()
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
      val name = "st01_sink_" + math.abs(d.hashCode)
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      input.addData(events)
      q.processAllAvailable()
      q.stop()
      s.table(name).orderBy("window_start", "event_type")
    }),

    "mm05_ppm_decode" -> ((s, d) =>
      // real (non-stub) image decode: P6 PPM encode → binary column →
      // parse + channel stats; oracle recomputes from the pixel formula
      Multimodal.ppmFeatures(s, d)),

    "st02_stream_dedup" -> ((s0, d) => {
      // Streaming exactly-once dedup across micro-batches: the first
      // 5000 events stream through, then a second batch re-publishes
      // every event from the final 5 minutes (inside the 10-minute
      // watermark horizon, so the dedup state is guaranteed live and
      // the drop deterministic). The sink must hold exactly the 5000
      // originals — the declarative analog of JetStream's Nats-Msg-Id
      // duplicate window, with state bounded by the watermark at scale.
      val s = s0.newSession()
      // 2 partitions: dedup keeps one state store per partition and the
      // 5k-row replay is fixed-cost-dominated (measured: 4 → 2 saves
      // ~0.8 s/batch-pair at sf0.1; correctness is partition-count
      // independent since state is hash-partitioned on event_id)
      s.conf.set("spark.sql.shuffle.partitions", "2")
      import s.implicits._
      implicit val ctx = s.sqlContext
      val events = graft.Tables.t(s, d, "events")
        .orderBy("event_id").limit(5000)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[graft.streaming.Streams.Event].collect().toSeq
      val maxTs = events.map(_.ts.getTime).max
      val republished = events.filter(_.ts.getTime >= maxTs - 5 * 60 * 1000)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Streams.Event]
      val deduped = graft.streaming.Streams.dedupeByKey(
        input.toDF(), "ts", "10 minutes", Seq("event_id"))
      val name = "st02_sink_" + math.abs(d.hashCode)
      val q = deduped.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      input.addData(events)
      q.processAllAvailable()
      input.addData(republished) // duplicate publish: state must drop all
      q.processAllAvailable()
      q.stop()
      s.table(name)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("event_type")
    }),

    "ct01_catalog_columns" -> ((s, d) => {
      Tables.registerAll(s, d)
      Catalog.columns(s)
        .filter(col("table_name").isin(Tables.names: _*))
        .orderBy("table_name", "ordinal")
    }),

    "ct02_catalog_sql" -> ((s, d) => {
      // duckdb_columns() called from dashboard SQL text (round-2 review
      // item #6): the dialect strips the call parens, the interpreter
      // rebuilds the catalog views, and DuckDB's real duckdb_columns()
      // is the oracle — both engines introspect the same parquet.
      val content =
        """SELECT table_name, column_name, column_index, data_type, is_nullable
          |FROM duckdb_columns()
          |WHERE table_name IN ('region', 'nation')
          |ORDER BY table_name, column_index;""".stripMargin
      val r = graft.interp.Dashboard.run(s, content,
        graft.interp.Dashboard.RunConfig(prepare = ss => Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.head.queries.head.rows.map(row =>
        (String.valueOf(row(0)), String.valueOf(row(1)), row(2).toString.toInt,
          String.valueOf(row(3)), row(4).toString.toBoolean))
        .toDF("table_name", "column_name", "column_index", "data_type", "is_nullable")
        .orderBy("table_name", "column_index")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm01_media_meta" -> """
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS format,
             CAST(n_chars % 640 AS INTEGER) AS width,
             CAST(n_chars % 480 AS INTEGER) AS height,
             octet_length(encode(text)) AS n_bytes
      FROM documents ORDER BY doc_id""",

    // mm03/mm04 oracles recompute the deterministic stub from the text
    // bytes (corpus is pure ASCII, so unicode(char) == payload byte;
    // verified octet_length(encode(text)) == length(text) for all docs)
    "mm03_image_features" -> """
      WITH ch AS (
        SELECT doc_id, unicode(c) AS b
        FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
      ), st AS (
        SELECT doc_id, CAST(sum(b) AS DOUBLE) / count(*) AS mean,
               max(b) AS mx
        FROM ch GROUP BY doc_id
      )
      SELECT d.doc_id, octet_length(encode(d.text)) AS n_bytes,
             round(st.mean * 10000) / 10000 AS mean_byte,
             CAST(st.mx AS INTEGER) AS max_byte,
             CAST(d.n_chars % 640 AS INTEGER) AS width,
             CAST(d.n_chars % 480 AS INTEGER) AS height
      FROM documents d JOIN st USING (doc_id) ORDER BY doc_id""",

    "mm04_resize" -> """
      WITH m AS (
        SELECT doc_id,
               CAST(n_chars % 640 AS INTEGER) AS w,
               CAST(n_chars % 480 AS INTEGER) AS h,
               octet_length(encode(text)) AS len
        FROM documents WHERE doc_id % 3 = 0
      )
      SELECT doc_id, CAST(w // s AS INTEGER) AS width,
             CAST(h // s AS INTEGER) AS height,
             CAST((len - 1) // s + 1 AS BIGINT) AS n_bytes
      FROM (SELECT *, greatest(1, greatest(w, h) // 64) AS s FROM m)
      ORDER BY doc_id""",

    "mm02_frame_sample" -> """
      SELECT doc_id, CAST(f AS INTEGER) AS frame_idx
      FROM (
        SELECT doc_id, unnest(generate_series(0, CAST(octet_length(encode(text)) // 256 AS BIGINT) - 1, 2)) AS f
        FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) // 256 >= 1
      )
      ORDER BY doc_id, frame_idx""",

    "ex01_export_roundtrip" -> """
      SELECT 'csv_reread_rows' AS metric, CAST(count(DISTINCT l_returnflag) AS BIGINT) AS value FROM lineitem
      UNION ALL SELECT 'csv_rows', count(DISTINCT l_returnflag) FROM lineitem
      UNION ALL SELECT 'json_objects', count(DISTINCT l_returnflag) FROM lineitem
      UNION ALL SELECT 'xlsx_zip_entries', 5
      ORDER BY metric""",

    "st01_stream_windowed" -> """
      WITH first5k AS (
        SELECT * FROM events ORDER BY event_id LIMIT 5000
      )
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start, event_type,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM first5k GROUP BY 1, 2 ORDER BY window_start, event_type""",

    "mm05_ppm_decode" -> """
      WITH img AS (
        SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h
        FROM documents WHERE doc_id % 3 = 0
      ), px AS (
        -- constant series bound (max w=23, h=17 → 1173 bytes), filtered
        -- per image: DuckDB's generate_series takes no lateral columns
        SELECT doc_id, w, h, i, (doc_id * 31 + i) % 256 AS v
        FROM img, generate_series(0, 3 * 23 * 17 - 1) t(i)
        WHERE i < 3 * w * h
      )
      SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
             CAST(count(*) AS BIGINT) AS n_bytes,
             round(avg(CASE WHEN i % 3 = 0 THEN v END), 4) AS mean_r,
             round(avg(CASE WHEN i % 3 = 1 THEN v END), 4) AS mean_g,
             round(avg(CASE WHEN i % 3 = 2 THEN v END), 4) AS mean_b
      FROM px GROUP BY doc_id, w, h ORDER BY doc_id""",

    "st02_stream_dedup" -> """
      WITH first5k AS (
        SELECT * FROM events ORDER BY event_id LIMIT 5000
      )
      SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
             round(sum(value), 2) AS total_value
      FROM first5k GROUP BY event_type ORDER BY event_type""",

    "ct02_catalog_sql" -> """
      SELECT table_name, column_name, column_index, data_type, is_nullable
      FROM duckdb_columns()
      WHERE table_name IN ('region', 'nation')
      ORDER BY table_name, column_index""",

    "ct01_catalog_columns" -> """
      SELECT table_name, column_name, CAST(ordinal_position AS INTEGER) AS ordinal,
             data_type, true AS nullable
      FROM information_schema.columns
      WHERE table_name IN ('region','nation','customer','supplier','part',
                           'orders','lineitem','events','documents','embeddings')
      ORDER BY table_name, ordinal"""
  )
}
