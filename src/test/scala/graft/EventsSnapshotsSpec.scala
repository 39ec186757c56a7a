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
}
