package graft

import graft.ingest.{Events, IngestStream}
import graft.snapshots.Snapshots
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Event publishing (core/events.go) + snapshots (snapshots/snapshots.go). */
class EventsSnapshotsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-es-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  private val runId = java.lang.Long.toString(System.nanoTime(), 36)

  test("publish -> spool -> streaming ingest end-to-end (events.go:33-95)") {
    val spool = java.nio.file.Files.createTempDirectory("graft-spool").toString
    val table = s"evt_${runId}_t1"
    assert(Events.publish(spool, table, """{"x": 1, "kind": "a"}""",
      msgId = Some("one-1")) == 1)
    // array payload fans out (handler/events.go:27-80)
    assert(Events.publish(spool, table, """[{"x": 2, "kind": "b"}, {"x": 3, "kind": "c"}]""") == 2)
    val q = IngestStream.start(spark, Events.source(spark, spool), triggerMillis = 100)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(table).orderBy("x").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Double]("x")).toSeq == Seq(1.0, 2.0, 3.0))
    // single publish: header msg-id became _id
    assert(rows(0).getAs[String]("_id") == "one-1")
    // array elements each get their own id (events.go:57-95), never shared
    assert(rows(1).getAs[String]("_id") != rows(2).getAs[String]("_id"))
    assert(rows(1).getAs[String]("_id").nonEmpty)
    // invalid payload rejected
    intercept[IllegalArgumentException](Events.publish(spool, table, "not json"))
  }

  test("snapshot and restore managed tables (snapshots.go:20-417)") {
    val snap = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val table = s"snap_${runId}_t"
    spark.sql(s"CREATE TABLE $table USING PARQUET AS SELECT id AS v FROM range(100)")
    val written = Snapshots.create(spark, snap, Some(Seq(table)))
    assert(written == Seq(table))
    // mutate, then restore
    spark.sql(s"INSERT INTO $table VALUES (999)")
    assert(spark.table(table).count() == 101)
    Snapshots.restore(spark, snap)
    assert(spark.table(table).count() == 100)
  }

  test("registerWarehouse: tables left by a previous process become visible again") {
    // simulate a reboot: parquet data sits in the warehouse but the
    // (in-memory) catalog has never heard of it — exactly what a fresh
    // serve JVM sees after a previous run's saveAsTable
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val orphan = s"reboot_${runId}_t"
    spark.range(40).selectExpr("id AS v")
      .write.parquet(new org.apache.hadoop.fs.Path(wh, orphan).toString)
    // infrastructure dirs must never register as tables
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(wh, "_graft_state"))
    assert(!spark.catalog.tableExists(orphan))
    val detected = Tables.registerWarehouse(spark)
    assert(detected.contains(orphan), detected)
    assert(!detected.exists(_.startsWith("_")))
    assert(spark.table(orphan).count() == 40)
    // idempotent: a second scan still reports the dir, registers nothing new
    assert(Tables.registerWarehouse(spark).contains(orphan))
    assert(spark.table(orphan).count() == 40)
    // the realistic post-reboot flow: ingest straight into the
    // re-registered (external) table — schema evolution DDL + append
    // must both work against it
    val appended = graft.ingest.IngestPipeline.processBatch(spark, Seq(
      graft.ingest.SchemaInfer.Message(orphan, """{"_id": "r1", "v": 99, "note": "post-reboot"}""")))
    assert(appended(orphan) == 1)
    assert(spark.table(orphan).count() == 41)
    val row = spark.table(orphan).where("note = 'post-reboot'").collect()
    assert(row.length == 1 && row.head.getAs[Long]("v") == 99L)
    // the daily snapshot must include the re-registered (EXTERNAL)
    // table — a managed-only filter would drop every pre-reboot table
    // from the disaster-recovery path
    val snap = java.nio.file.Files.createTempDirectory("graft-snap-ext").toString
    assert(Snapshots.create(spark, snap).contains(orphan))
  }

  test("restore drill: snapshot, destroy the warehouse, restore, dashboard renders green (snapshots/restore.go boot path)") {
    // the reference's restore-on-boot flow end-to-end: the snapshot is
    // the ONLY surviving copy — the table is dropped AND its files
    // deleted — and after restore a dashboard over the table renders
    // exactly as before the loss
    val snap = java.nio.file.Files.createTempDirectory("graft-drill").toString
    val table = s"drill_${runId}_events"
    spark.sql(s"CREATE TABLE $table USING PARQUET AS " +
      "SELECT concat('u', id % 7) AS user_id, " +
      "CASE WHEN id % 3 = 0 THEN 'click' ELSE 'view' END AS kind FROM range(60)")
    val content =
      s"""SELECT 'Drill'::LABEL;
         |SELECT kind, count(*) AS n FROM $table GROUP BY kind ORDER BY kind;""".stripMargin
    def render(): Seq[Seq[Any]] = graft.interp.Dashboard.run(spark, content,
      graft.interp.Dashboard.RunConfig(dashboardId = "drill"))
      .sections.flatMap(_.queries).flatMap(_.rows)
    val before = render()
    assert(before.nonEmpty)
    assert(Snapshots.create(spark, snap, Some(Seq(table))) == Seq(table))
    // destroy: drop from the catalog and remove the data files
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    spark.sql(s"DROP TABLE $table")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    intercept[Exception](spark.table(table).count())
    // restore from the snapshot and re-run the dashboard
    assert(Snapshots.restore(spark, snap).contains(table))
    assert(spark.table(table).count() == 60)
    assert(render() == before)
  }

  test("snapshot service: daily HH:mm schedule, one-node claim, timestamped dirs, restore latest (snapshots.go:56-192)") {
    import graft.snapshots.SnapshotService
    val base = java.nio.file.Files.createTempDirectory("graft-snapsvc").toString
    var now = java.time.Instant.parse("2026-08-12T10:00:00Z").toEpochMilli
    val queue = new graft.tasks.TaskWorkQueue
    val svc = new SnapshotService(spark, base, "10:30", queue, () => now)
    val svc2 = new SnapshotService(spark, base, "10:30", queue, () => now)
    try {
      // 10:00 → today 10:30; at 11:00 → tomorrow 10:30
      assert(svc.nextRunMillis() == java.time.Instant.parse("2026-08-12T10:30:00Z").toEpochMilli)
      assert(svc.nextRunMillis(java.time.Instant.parse("2026-08-12T11:00:00Z").toEpochMilli)
        == java.time.Instant.parse("2026-08-13T10:30:00Z").toEpochMilli)

      val table = s"snapsvc_${runId}_t"
      spark.sql(s"CREATE TABLE $table USING PARQUET AS SELECT id AS v FROM range(10)")
      // two nodes fire for the same time: exactly one performs the run
      val fireAt = svc.nextRunMillis()
      val r1 = svc.runOnce(fireAt)
      val r2 = svc2.runOnce(fireAt)
      assert(r1.isDefined ^ r2.isDefined)
      assert(r1.orElse(r2).get.endsWith("2026-08-12_10-30-00"))
      // a later fire time snapshots again; latest() picks it
      now = java.time.Instant.parse("2026-08-13T10:30:00Z").toEpochMilli
      spark.sql(s"INSERT INTO $table VALUES (999)")
      val r3 = svc.runOnce(now)
      assert(r3.isDefined)
      assert(svc.latest() == r3)
      // mutate then restore the latest snapshot (11 rows, incl. 999)
      spark.sql(s"INSERT INTO $table VALUES (1000)")
      assert(spark.table(table).count() == 12)
      assert(svc.restoreLatest().contains(table))
      assert(spark.table(table).count() == 11)
    } finally { svc.close(); svc2.close() }
  }

  test("snapshots cover non-default databases and restore re-creates them") {
    // ingest supports `db.table` targets; the daily snapshot must not
    // silently exclude those namespaces from the disaster-recovery copy
    val snap = java.nio.file.Files.createTempDirectory("graft-snap-db").toString
    val db = s"snapdb_$runId"
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(s"CREATE TABLE $db.t USING PARQUET AS SELECT id AS v FROM range(7)")
    try {
      val written = Snapshots.create(spark, snap)
      assert(written.contains(s"$db.t"), written)
      // destroy the whole namespace; restore must re-create db AND table
      spark.sql(s"DROP TABLE $db.t")
      spark.sql(s"DROP DATABASE $db")
      assert(Snapshots.restore(spark, snap).contains(s"$db.t"))
      assert(spark.table(s"$db.t").count() == 7)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $db.t")
      spark.sql(s"DROP DATABASE IF EXISTS $db")
    }
  }

  test("snapshot one-node claim holds across JVM-independent queues (FsWorkQueue)") {
    import graft.snapshots.SnapshotService
    val base = java.nio.file.Files.createTempDirectory("graft-snapfs").toString
    val claims = java.nio.file.Files.createTempDirectory("graft-snapfs-claims").toString
    val conf = spark.sparkContext.hadoopConfiguration
    val now = java.time.Instant.parse("2026-08-12T10:00:00Z").toEpochMilli
    // two services with SEPARATE FsWorkQueue instances — only the shared
    // claim directory coordinates them, as it would across real nodes
    val svcA = new SnapshotService(spark, base, "10:30",
      new graft.tasks.FsWorkQueue(claims, conf), () => now)
    val svcB = new SnapshotService(spark, base, "10:30",
      new graft.tasks.FsWorkQueue(claims, conf), () => now)
    try {
      val table = s"snapfs_${runId}_t"
      spark.sql(s"CREATE TABLE $table USING PARQUET AS SELECT id AS v FROM range(5)")
      val fireAt = svcA.nextRunMillis()
      val r1 = svcA.runOnce(fireAt)
      val r2 = svcB.runOnce(fireAt)
      assert(r1.isDefined ^ r2.isDefined)
      assert(svcA.latest() == r1.orElse(r2))
    } finally { svcA.close(); svcB.close() }
  }
}
