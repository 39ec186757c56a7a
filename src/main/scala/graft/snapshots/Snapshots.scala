package graft.snapshots

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table snapshots: copy every managed table to a snapshot directory as
  * parquet, restore on demand (ref: server/snapshots/snapshots.go:20-417
  * — the reference snapshots DuckDB+SQLite to S3 daily; on Spark the
  * tables are already parquet, so a snapshot is a consistent copy and a
  * restore is a re-register, each one distributed write/read job per
  * table).
  */
object Snapshots {

  /** Snapshot all (or the named) tables across EVERY database — ingest
    * supports `db.table` targets and a reboot re-registers those
    * namespaces, so scanning only the current database would silently
    * exclude them from the daily disaster-recovery copy. Returns the
    * (qualified) table names written; a non-default database qualifies
    * the snapshot directory name as `db.table`. Persistent tables only —
    * MANAGED and EXTERNAL both count (a reboot re-registers warehouse
    * tables as EXTERNAL, and a managed-only filter would silently drop
    * every pre-reboot table from the daily snapshots); temp views (the
    * gate's registerAll fixtures) are session state, never snapshotted. */
  def create(spark: SparkSession, snapshotDir: String,
      tables: Option[Seq[String]] = None): Seq[String] = {
    val names = tables.getOrElse(
      spark.catalog.listDatabases().collect().toSeq.map(_.name).sorted.flatMap { db =>
        spark.catalog.listTables(db).collect().toSeq
          .filter(t => !t.isTemporary)
          .map(t => if (db == "default") t.name else s"$db.${t.name}")
      })
    names.foreach { t =>
      spark.table(t).write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/$t")
    }
    names
  }

  /** Restore: re-create each snapshotted table from its parquet copy.
    * Dropping an EXTERNAL table (what a post-reboot re-registration
    * produces) leaves its files behind, and the managed re-create then
    * refuses the occupied location — restore's contract is "replace
    * with the snapshot copy", so the old location is cleared first. */
  def restore(spark: SparkSession, snapshotDir: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(snapshotDir).getFileSystem(conf)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(snapshotDir))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
    dirs.foreach { t =>
      // a `db.table` directory name is a non-default-namespace snapshot
      val (db, table) = t.split("\\.", 2) match {
        case Array(d, n) => (Some(d), n)
        case _ => (None, t)
      }
      db.foreach(d => spark.sql(s"CREATE DATABASE IF NOT EXISTS `$d`"))
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(table, db)
      val loc = if (spark.sessionState.catalog.tableExists(ident))
        Some(new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(ident).location)) else None
      val qualified = db.map(d => s"`$d`.`$table`").getOrElse(s"`$table`")
      spark.sql(s"DROP TABLE IF EXISTS $qualified")
      loc.foreach(p => p.getFileSystem(conf).delete(p, true)) // no-op if DROP removed it
      spark.read.parquet(s"$snapshotDir/$t")
        .write.mode(SaveMode.Overwrite).saveAsTable(qualified.replace("`", ""))
    }
    dirs
  }
}

/** Scheduled snapshot service (ref: server/snapshots/snapshots.go:56-192):
  * fires daily at a configured `HH:mm`, writes a timestamped snapshot
  * (the reference's `2006-01-02_15-04-05` layout), and routes each run
  * through the task work queue so exactly one node snapshots per fire
  * time even though every node schedules (the reference's
  * WorkQueuePolicy stream). The snapshot base dir is any Hadoop-FS
  * path — local, HDFS, or an object store, the reference's S3 target.
  */
final class SnapshotService(
    spark: org.apache.spark.sql.SparkSession,
    baseDir: String,
    scheduledTime: String, // "HH:mm", like the reference's config
    queue: graft.tasks.WorkQueue = new graft.tasks.TaskWorkQueue,
    nowMillis: () => Long = () => System.currentTimeMillis())
    extends AutoCloseable {

  private val exec = java.util.concurrent.Executors.newScheduledThreadPool(1)
  private val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm-ss")
    .withZone(java.time.ZoneOffset.UTC)

  /** Next fire time: today at HH:mm, or tomorrow if that already passed
    * (ref: scheduleNext, snapshots.go:123-144). */
  def nextRunMillis(fromMillis: Long = nowMillis()): Long = {
    val t = java.time.LocalTime.parse(scheduledTime)
    val now = java.time.Instant.ofEpochMilli(fromMillis).atZone(java.time.ZoneOffset.UTC)
    val todayRun = now.toLocalDate.atTime(t).atZone(java.time.ZoneOffset.UTC)
    val next = if (!todayRun.toInstant.isAfter(now.toInstant)) todayRun.plusDays(1) else todayRun
    next.toInstant.toEpochMilli
  }

  /** One snapshot run, work-queue-claimed by fire time; returns the
    * snapshot directory when this node performed it. */
  def runOnce(runAtMillis: Long = nowMillis()): Option[String] = {
    if (!queue.tryClaim("__snapshot__", runAtMillis)) return None
    val dir = s"$baseDir/${fmt.format(java.time.Instant.ofEpochMilli(runAtMillis))}"
    Snapshots.create(spark, dir)
    Some(dir)
  }

  /** Most recent snapshot directory under the base, if any. */
  def latest(): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else fs.listStatus(base).filter(_.isDirectory).map(_.getPath.getName)
      .sorted.lastOption.map(n => s"$baseDir/$n")
  }

  def restoreLatest(): Seq[String] =
    latest().map(Snapshots.restore(spark, _)).getOrElse(Nil)

  /** Start the daily timer; reschedules itself after each fire — also
    * after a FAILED fire (a transient FS error must not kill the chain;
    * the executor would otherwise swallow the throwable silently). */
  def start(): Unit = {
    val at = nextRunMillis()
    exec.schedule(new Runnable {
      def run(): Unit =
        try runOnce(at)
        catch { case e: Exception =>
          System.err.println(s"[snapshots] run at $at failed: ${e.getMessage}")
        } finally start()
    }, math.max(0L, at - nowMillis()), java.util.concurrent.TimeUnit.MILLISECONDS)
    ()
  }

  override def close(): Unit = exec.shutdownNow()
}
