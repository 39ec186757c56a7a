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

  /** Snapshot all (or the named) tables of the current database.
    * Returns the table names written. */
  def create(spark: SparkSession, snapshotDir: String,
      tables: Option[Seq[String]] = None): Seq[String] = {
    val names = tables.getOrElse(
      spark.catalog.listTables().collect().toSeq
        .filter(_.tableType.equalsIgnoreCase("MANAGED")).map(_.name))
    names.foreach { t =>
      spark.table(t).write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/$t")
    }
    names
  }

  /** Restore: re-create each snapshotted table from its parquet copy. */
  def restore(spark: SparkSession, snapshotDir: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(snapshotDir))
      .filter(_.isDirectory).map(_.getPath.getName).toSeq
    dirs.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      spark.read.parquet(s"$snapshotDir/$t")
        .write.mode(SaveMode.Overwrite).saveAsTable(t)
    }
    dirs
  }
}
