package graft.queries

import graft.ingest.{IngestPipeline, SchemaInfer}
import graft.tasks.Tasks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-contract entries for the ingest pipeline and task engine.
  * in01 is fully oracle-checked: explicit `_id`/`_ts` make the ingested
  * table content deterministic, so DuckDB can assert the whole
  * schema-inference → create → append path value-by-value.
  */
object EngineOps {

  private val fixedNow = () => 1754992800000L // deterministic clock for oracles

  /** Temp dir that is removed on JVM exit — repeated gate/bench runs
    * must not leak scratch CSV/JSON/spool copies in the system temp
    * dir (deletion can't run earlier: the returned DataFrames read
    * these paths lazily). */
  private[queries] def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  /** Cheap per-sf corpus invariants, pinned: the golden entries
    * (sh01–sh05, png01, au01, the DashboardOracles constants) bind to
    * the driver corpus's CONTENT, so a regenerated corpus would surface
    * as N opaque hash mismatches. This guard fails FIRST with an
    * explicit "corpus changed — re-pin goldens" message instead. Keys:
    * sf-dir basename → (metric → pinned value). */
  private val corpusPins: Map[String, Map[String, String]] = Map(
    "sf0.001" -> Map(
      "count_customer" -> "150", "count_documents" -> "500",
      "count_embeddings" -> "500", "count_events" -> "1000",
      "count_nation" -> "25", "count_orders" -> "1500",
      "events_ts_min" -> "2024-01-01 00:09:58.778",
      "events_ts_max" -> "2024-01-30 23:26:16.220"),
    "sf0.01" -> Map(
      "count_customer" -> "1500", "count_documents" -> "500",
      "count_embeddings" -> "500", "count_events" -> "10000",
      "count_nation" -> "25", "count_orders" -> "15000",
      "events_ts_min" -> "2024-01-01 00:00:07.179",
      "events_ts_max" -> "2024-01-30 23:57:12.194"),
    "sf0.1" -> Map(
      "count_customer" -> "15000", "count_documents" -> "5000",
      "count_embeddings" -> "2000", "count_events" -> "100000",
      "count_nation" -> "25", "count_orders" -> "150000",
      "events_ts_min" -> "2024-01-01 00:00:11.172",
      "events_ts_max" -> "2024-01-30 23:59:25.261"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    "guard01_corpus_pin" -> ((s, d) => {
      // one pass per table (counts are metadata-only parquet reads) +
      // one min/max agg over events.ts formatted to the millisecond —
      // both engines floor sub-ms precision, so the strings agree
      import org.apache.spark.sql.functions._
      val counts = Seq("customer", "documents", "embeddings", "events",
        "nation", "orders").map(t => s"count_$t" -> graft.Tables.t(s, d, t).count().toString)
      val mm = graft.Tables.t(s, d, "events").agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSS")).head()
      val metrics = counts ++ Seq(
        "events_ts_max" -> mm.getString(1), "events_ts_min" -> mm.getString(0))
      corpusPins.get(new java.io.File(d).getName).foreach { pins =>
        val got = metrics.toMap
        pins.foreach { case (k, v) =>
          require(got.get(k).contains(v),
            s"CORPUS CHANGED: $k = ${got.getOrElse(k, "<missing>")}, pinned $v — " +
              "the driver test corpus was regenerated; re-pin the golden " +
              "constants (sh01–sh05, png01, au01, DashboardOracles) and " +
              "EngineOps.corpusPins before trusting other hash mismatches")
        }
      }
      import s.implicits._
      metrics.sortBy(_._1).toDF("metric", "value")
    }),

    "in01_ingest_e2e" -> ((s, d) => {
      // JSON batch → inferred schema (_id/_ts prepended, type vote:
      // DOUBLE/BOOLEAN/TIMESTAMP/VARCHAR/JSON) → table → append
      s.sql("DROP TABLE IF EXISTS ingest_demo")
      // the in-memory catalog forgets tables across JVM runs but the
      // warehouse directory survives — remove the stale location too
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "ingest_demo")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      IngestPipeline.processBatch(s, Seq(
        SchemaInfer.Message("ingest_demo",
          """{"_id": "a1", "_ts": "2024-01-01T10:00:00Z", "name": "alpha", "n": 1, "flag": true, "meta": {"k": "v"}}"""),
        SchemaInfer.Message("ingest_demo",
          """{"_id": "a2", "_ts": "2024-01-02T10:00:00Z", "name": "beta", "n": 2.5, "flag": false, "meta": {"k": "w"}}"""),
        SchemaInfer.Message("ingest_demo",
          """{"_id": "a3", "_ts": 1704274800, "name": "gamma", "n": 3, "flag": true, "meta": null}""")))
      // also exercise the db.table namespace path; a failure here fails
      // the whole entry (rows would be missing)
      s.sql("DROP TABLE IF EXISTS graftdemo.sub_t")
      val subLoc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graftdemo.db/sub_t")
      subLoc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(subLoc, true)
      IngestPipeline.processBatch(s, Seq(
        SchemaInfer.Message("graftdemo.sub_t", """{"_id": "s1", "_ts": "2024-01-01T00:00:00Z", "k": 1}""")))
      require(s.table("graftdemo.sub_t").count() == 1, "2-part namespace ingest failed")
      s.table("ingest_demo").orderBy("_id")
    }),

    "ev01_publish_ingest" -> ((s, d) => {
      // full event path: publish (obj + array fan-out) -> spool ->
      // Structured Streaming -> inferred table; explicit _id/_ts keep
      // the result deterministic for the oracle
      val spool = tempDir("graft-ev01")
      s.sql("DROP TABLE IF EXISTS ev01_out")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "ev01_out")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      graft.ingest.Events.publish(spool, "ev01_out",
        """{"_id": "e1", "_ts": "2024-02-01T00:00:00Z", "kind": "view", "amount": 1.5}""")
      graft.ingest.Events.publish(spool, "ev01_out",
        """[{"_id": "e2", "_ts": "2024-02-01T01:00:00Z", "kind": "click", "amount": 2.5},
            {"_id": "e3", "_ts": "2024-02-01T02:00:00Z", "kind": "buy", "amount": 3.5}]""")
      val q = graft.ingest.IngestStream.start(s, graft.ingest.Events.source(s, spool),
        triggerMillis = 100)
      q.processAllAvailable()
      q.stop()
      s.table("ev01_out").orderBy("_id")
    }),

    "src01_file_sources" -> ((s, d) => {
      // CSV and JSON sources with explicit schemas (at scale you never
      // schema-infer a 100 TB directory): write a deterministic slice
      // with the distributed writers, read each format back, aggregate —
      // proving parse parity across formats. Decimal-sum before the
      // final double cast keeps the checksum order-independent.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val slice = graft.Tables.t(s, d, "events")
        .filter(col("event_id") <= 1000)
        .select("event_id", "user_id", "event_type", "value")
      val tmp = tempDir("graft-src01")
      slice.write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
      slice.write.mode("overwrite").json(s"$tmp/json")
      slice.write.mode("overwrite").orc(s"$tmp/orc")
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      def summarize(df: DataFrame, fmt: String): DataFrame =
        df.agg(count(lit(1)).as("n_rows"), countDistinct("user_id").as("n_users"),
            round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
          .select(lit(fmt).as("format"), col("n_rows"), col("n_users"), col("sum_value"))
      summarize(s.read.schema(schema).option("header", "true").csv(s"$tmp/csv"), "csv")
        .unionByName(summarize(s.read.schema(schema).json(s"$tmp/json"), "json"))
        .unionByName(summarize(s.read.schema(schema).orc(s"$tmp/orc"), "orc"))
        .orderBy("format")
    }),

    "mac01_macro_dashboard" -> ((s, d) => {
      // CREATE TEMP MACRO execution through the dashboard interpreter:
      // nested macros + a := named/defaulted parameter, expanded textually
      // before Catalyst (so the plan is identical to hand-inlined SQL —
      // full pushdown/codegen, no UDF). Round-2 review item #1.
      val content =
        """CREATE TEMP MACRO clamp(x, hi := 1.0) AS least(greatest(x, 0.0), hi);
          |CREATE OR REPLACE TEMP MACRO disc_price(p, disc) AS p * (1 - clamp(disc, hi := 0.05));
          |SELECT l_returnflag AS flag,
          |  round(CAST(sum(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
          |FROM lineitem GROUP BY flag ORDER BY flag;""".stripMargin
      val r = graft.interp.Dashboard.run(s, content,
        graft.interp.Dashboard.RunConfig(prepare = ss => graft.Tables.registerAll(ss, d)))
      import s.implicits._
      r.sections.head.queries.head.rows
        .map(row => (String.valueOf(row(0)), row(1).toString.toDouble))
        .toDF("flag", "revenue").orderBy("flag")
    }),

    "bp01_boxplot_outliers" -> ((s, d) => {
      // BOXPLOT(val, outlier_info := …) — the reference macro's Tukey
      // branch (custom_types.go:104-119): whiskers at q1/q3 ∓ 1.5·IQR,
      // outliers exploded with their info for a value-level oracle.
      // This runs the SCALE form (Boxplot.tukey): exact quartiles via
      // partial-aggregable percentile + one broadcast join-back for
      // whiskers/outliers — no per-group value collection anywhere in
      // the plan (PlanSpec pins it); the UDAF stays for the ≤3000-row
      // dashboard SQL surface and BoxplotTukeySpec pins their
      // agreement.
      import org.apache.spark.sql.functions._
      graft.exprs.Boxplot.tukey(
        graft.Tables.t(s, d, "orders")
          .select(col("o_orderpriority").as("pri"), col("o_totalprice"),
            col("o_orderkey")),
        Seq("pri"), "o_totalprice",
        map(lit("k"), col("o_orderkey").cast("string")))
        .selectExpr("pri",
          "round(bp.q1, 4) AS q1", "round(bp.q2, 4) AS q2", "round(bp.q3, 4) AS q3",
          "round(bp.min, 4) AS wmin", "round(bp.max, 4) AS wmax",
          "inline_outer(transform(bp.outliers, o -> struct(round(o.value, 4) AS oval, o.info['k'] AS okey)))")
        .orderBy("pri", "oval")
    }),

    "tk01_task_execute" -> ((s, d) => {
      // task executor over the star schema: schedule extraction +
      // stop-on-false + result capture, flattened for the oracle
      val content =
        """SELECT (INTERVAL 1 HOUR)::SCHEDULE;
          |SELECT count(*) > 0 AS has_data FROM lineitem;
          |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag;""".stripMargin
      val r = Tasks.executeTask(s, content, fixedNow,
        prepare = ss => graft.Tables.registerAll(ss, d))
      import s.implicits._
      val flat = r.queries.zipWithIndex.flatMap { case (q, qi) =>
        q.resultRows.zipWithIndex.map { case (row, ri) =>
          (qi, ri, row.map(String.valueOf).mkString("|"))
        }
      }
      val header = Seq((-1, -1,
        s"success=${r.success};totalQueries=${r.totalQueries};nextRunAt=${r.nextRunAt};type=${r.scheduleType}"))
      (header ++ flat).toDF("query_idx", "row_idx", "data")
        .orderBy("query_idx", "row_idx")
    })
    ,

    "tk02_task_update_delete" -> ((s, d) => {
      // UPDATE/DELETE DML in tasks (reference default-allows them,
      // sql_validation.go:274): CTAS → UPDATE → DELETE over a managed
      // parquet table via rewrite-on-write, oracled on the final table
      // content. The affected-row Counts (DuckDB's DML result shape)
      // are asserted inline.
      s.sql("DROP TABLE IF EXISTS tk02_t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "tk02_t")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      val content =
        """SELECT (INTERVAL 1 HOUR)::SCHEDULE;
          |CREATE TABLE tk02_t AS
          |  SELECT n_nationkey AS k, n_name AS name, n_regionkey AS region FROM nation;
          |UPDATE tk02_t SET name = lower(name) WHERE region < 2;
          |DELETE FROM tk02_t WHERE k % 5 = 0;
          |SELECT count(*) > 0 FROM tk02_t;""".stripMargin
      val r = Tasks.executeTask(s, content, fixedNow,
        prepare = ss => graft.Tables.registerAll(ss, d))
      require(r.success, "tk02 task failed: " + r.queries.flatMap(_.error).mkString("; "))
      require(r.queries(1).resultRows == Seq(Seq(10L)),
        s"UPDATE count: ${r.queries(1).resultRows}")
      require(r.queries(2).resultRows == Seq(Seq(5L)),
        s"DELETE count: ${r.queries(2).resultRows}")
      s.table("tk02_t").orderBy("k")
    }),

    "tk03_task_schedules" -> ((s, d) => {
      // getNextTaskRun over the three reference schedule forms
      // (schedule_task.go:74-142 + getScheduleTime): interval → now +
      // delta with single-node type, timestamp → absolute time with
      // SCHEDULE_ALL's every-node type, 'init' → the -1 run-now
      // sentinel (surfaced as next_run_at = -1 here).
      import s.implicits._
      val forms = Seq(
        ("interval", "SELECT (INTERVAL 30 MINUTE)::SCHEDULE;\nSELECT 1 AS x;"),
        ("timestamp", "SELECT (TIMESTAMP '2026-01-01 00:00:00')::SCHEDULE_ALL;\nSELECT 1 AS x;"),
        ("init", "SELECT 'init'::SCHEDULE;\nSELECT 1 AS x;"))
      forms.map { case (form, content) =>
        val (at, tpe) = Tasks.getNextTaskRun(s, content, fixedNow)
        (form, at.getOrElse(-1L), tpe)
      }.toDF("form", "next_run_at", "schedule_type").orderBy("form")
    }),

    "tk04_work_queue" -> ((s, d) => {
      // work-queue distribution semantics through the driver gate
      // (schedule_task.go:215-340): two nodes share ONLY a claim
      // directory (FsWorkQueue — the JetStream WorkQueuePolicy analog);
      // a `single` run executes on exactly one of them, an `all` run on
      // both, and a re-fire of the same (task, runAt) on zero.
      val claims = tempDir("graft-tk04")
      val conf = s.sparkContext.hadoopConfiguration
      def node(id: String) = new graft.tasks.TaskNode(id, s,
        new graft.tasks.FsWorkQueue(claims, conf))
      val (n1, n2) = (node("n1"), node("n2"))
      val content = "SELECT 1 AS x;"
      def fired(results: Option[Tasks.TaskResult]*): Long =
        results.count(_.isDefined).toLong
      val singleRun = fired(
        n1.fire("t1", content, 1000L, "single"), n2.fire("t1", content, 1000L, "single"))
      val allRun = fired(
        n1.fire("t1", content, 2000L, "all"), n2.fire("t1", content, 2000L, "all"))
      val refire = fired(
        n1.fire("t1", content, 1000L, "single"), n2.fire("t1", content, 1000L, "single"))
      import s.implicits._
      Seq(("single", singleRun), ("all", allRun), ("refire", refire))
        .toDF("run_kind", "executions").orderBy("run_kind")
    })
  )

  val oracles: Map[String, String] = Map(
    "guard01_corpus_pin" -> """
      SELECT metric, value FROM (
        SELECT 'count_customer' AS metric, CAST(count(*) AS VARCHAR) AS value FROM customer
        UNION ALL SELECT 'count_documents', CAST(count(*) AS VARCHAR) FROM documents
        UNION ALL SELECT 'count_embeddings', CAST(count(*) AS VARCHAR) FROM embeddings
        UNION ALL SELECT 'count_events', CAST(count(*) AS VARCHAR) FROM events
        UNION ALL SELECT 'count_nation', CAST(count(*) AS VARCHAR) FROM nation
        UNION ALL SELECT 'count_orders', CAST(count(*) AS VARCHAR) FROM orders
        UNION ALL SELECT 'events_ts_max',
          strftime(max(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%g') FROM events
        UNION ALL SELECT 'events_ts_min',
          strftime(min(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%g') FROM events
      ) ORDER BY metric""",

    "in01_ingest_e2e" -> """
      SELECT * FROM (VALUES
        ('a1', TIMESTAMP '2024-01-01 10:00:00', 'alpha', 1.0, true, '{"k":"v"}'),
        ('a2', TIMESTAMP '2024-01-02 10:00:00', 'beta', 2.5, false, '{"k":"w"}'),
        ('a3', TIMESTAMP '2024-01-03 09:40:00', 'gamma', 3.0, true, NULL)
      ) t(_id, _ts, name, n, flag, meta)
      ORDER BY _id""",

    "ev01_publish_ingest" -> """
      SELECT * FROM (VALUES
        ('e1', TIMESTAMP '2024-02-01 00:00:00', 'view', 1.5),
        ('e2', TIMESTAMP '2024-02-01 01:00:00', 'click', 2.5),
        ('e3', TIMESTAMP '2024-02-01 02:00:00', 'buy', 3.5)
      ) t(_id, _ts, kind, amount)
      ORDER BY _id""",

    "src01_file_sources" -> """
      WITH sl AS (SELECT event_id, user_id, value FROM events WHERE event_id <= 1000)
      SELECT f.format, count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
      FROM sl, (VALUES ('csv'), ('json'), ('orc')) f(format)
      GROUP BY f.format ORDER BY f.format""",

    "mac01_macro_dashboard" -> """
      SELECT l_returnflag AS flag,
        round(CAST(sum(CAST(l_extendedprice * (1 - least(greatest(l_discount, 0.0), 0.05)) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      FROM lineitem GROUP BY flag ORDER BY flag""",

    "bp01_boxplot_outliers" -> """
      WITH q AS (
        SELECT o_orderpriority AS pri,
               quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.5) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders GROUP BY 1),
      w AS (
        SELECT o.o_orderpriority AS pri,
               min(o.o_totalprice) FILTER (WHERE o.o_totalprice >= q.q1 - 1.5 * (q.q3 - q.q1)) AS wmin,
               max(o.o_totalprice) FILTER (WHERE o.o_totalprice <= q.q3 + 1.5 * (q.q3 - q.q1)) AS wmax
        FROM orders o JOIN q ON o.o_orderpriority = q.pri GROUP BY 1),
      outl AS (
        SELECT o.o_orderpriority AS pri, o.o_totalprice AS oval,
               CAST(o.o_orderkey AS VARCHAR) AS okey
        FROM orders o JOIN q ON o.o_orderpriority = q.pri
        WHERE o.o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1)
           OR o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1))
      SELECT q.pri, round(q.q1, 4) AS q1, round(q.q2, 4) AS q2, round(q.q3, 4) AS q3,
             round(w.wmin, 4) AS wmin, round(w.wmax, 4) AS wmax,
             round(outl.oval, 4) AS oval, outl.okey
      FROM q JOIN w ON q.pri = w.pri LEFT JOIN outl ON q.pri = outl.pri
      ORDER BY q.pri, oval""",

    "tk02_task_update_delete" -> """
      SELECT n_nationkey AS k,
             CASE WHEN n_regionkey < 2 THEN lower(n_name) ELSE n_name END AS name,
             n_regionkey AS region
      FROM nation
      WHERE n_nationkey % 5 <> 0
      ORDER BY k""",

    "tk03_task_schedules" -> """
      SELECT * FROM (VALUES
        ('init', CAST(-1 AS BIGINT), 'init'),
        ('interval', CAST(1754994600000 AS BIGINT), 'single'),
        ('timestamp', CAST(1767225600000 AS BIGINT), 'all')
      ) t(form, next_run_at, schedule_type)
      ORDER BY form""",

    // exactly-one / every-node / duplicate-drop goldens for the shared
    // work queue (schedule_task.go:215-340 semantics)
    "tk04_work_queue" -> """
      SELECT * FROM (VALUES
        ('all', CAST(2 AS BIGINT)),
        ('refire', CAST(0 AS BIGINT)),
        ('single', CAST(1 AS BIGINT))
      ) t(run_kind, executions)
      ORDER BY run_kind""",

    "tk01_task_execute" -> """
      SELECT -1 AS query_idx, -1 AS row_idx,
             'success=true;totalQueries=2;nextRunAt=1754996400000;type=single' AS data
      UNION ALL
      SELECT 0, 0, 'true'
      UNION ALL
      SELECT 1, n - 1,
             l_returnflag || '|' || CAST(cnt AS VARCHAR)
      FROM (SELECT l_returnflag, count(*) AS cnt,
                   row_number() OVER (ORDER BY l_returnflag) AS n
            FROM lineitem GROUP BY l_returnflag)
      ORDER BY query_idx, row_idx"""
  )
}
