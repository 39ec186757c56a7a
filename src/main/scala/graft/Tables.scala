package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed access to the TESTDATA star schema (TESTDATA.md).
  *
  * Scale design: each table is a plain parquet scan, so Catalyst pushes
  * filters/projections into the reader (`PushedFilters`/`ReadSchema`) and
  * partition-parallelism follows `spark.sql.files.maxPartitionBytes` — on a
  * real cluster the same code fans out to one task per ~128MB split. Nothing
  * here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at any scale factor (dimension-like).
    * region/nation are fixed-size; part/supplier/customer grow with SF but
    * stay several orders of magnitude below the fact tables — at 100 TB the
    * facts are lineitem/orders/events, and these remain broadcast candidates
    * (Spark's own autoBroadcastJoinThreshold also guards this via AQE).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  // file schemas rarely change within a run: infer once per (path,
  // file-state signature), then pass the schema explicitly — renders
  // open a fresh session per dashboard and would otherwise re-infer all
  // ten tables every time. The signature (mtime + length, children for
  // directories) invalidates the entry when a path is rewritten with a
  // different schema, so a refreshed warehouse dir never reads through
  // a stale explicit schema (silent nulls). One stat RPC per read vs a
  // footer parse + listing is still the win.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def pathSignature(spark: SparkSession, path: String): String = {
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val children = fs.listStatus(p)
        var acc = 0L
        children.foreach(c => acc ^= c.getModificationTime * 31 + c.getLen)
        s"${children.length}:$acc"
      } else s"${st.getModificationTime}:${st.getLen}"
    } catch { case _: Exception => "absent:" + System.nanoTime() }
  }

  /** Drop cached schemas under a path — for writers that rewrite a
    * table location in place. Scheme-insensitive: `file:/x/t.parquet`
    * and `/x/t.parquet` refer to the same files, and callers hold
    * whichever form their API produced (catalog locations are
    * scheme-qualified URIs; reads use raw paths). */
  def invalidate(pathPrefix: String): Unit = {
    def bare(p: String): String =
      try new org.apache.hadoop.fs.Path(p).toUri.getPath match {
        case null | "" => p
        case x => x
      } catch { case _: Exception => p }
    val prefix = bare(pathPrefix)
    schemaCache.keySet.removeIf(k => bare(k.takeWhile(_ != '@')).startsWith(prefix))
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Timestamp columns arrive in whatever encoding the corpus writer of
    // the day used. Two generations seen so far:
    //   - TIMESTAMP(NANOS): Spark refuses it by default — read as long
    //     via the legacy flag, then integer-divide to micros (`div`
    //     stays in Long; a Double round-trip would lose precision at
    //     1e18-ns magnitudes). DuckDB truncates ns→µs identically.
    //   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark surfaces it
    //     as TIMESTAMP_NTZ, on which epoch arithmetic (cast to long,
    //     unix_millis, range frames over epoch) is undefined. Every
    //     session here runs in UTC, where NTZ→LTZ is the identity
    //     wall-clock mapping DuckDB applies to its own naive TIMESTAMP,
    //     so normalize to TimestampType — in the READ SCHEMA, not a
    //     post-read cast, which would wrap the column and break parquet
    //     filter pushdown on it.
    val path = s"$dir/$name.parquet"
    if (name == "events") spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val key = path + "@" + pathSignature(spark, path)
    val cached = schemaCache.get(key)
    val norm =
      if (cached != null) cached
      else {
        val discovered = spark.read.parquet(path).schema
        val n = org.apache.spark.sql.types.StructType(discovered.map {
          case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
            f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          case f => f
        })
        // superseded signatures for this path are dead — evict them so
        // repeated rewrites keep exactly one live entry per path
        schemaCache.keySet.removeIf(k => k.startsWith(path + "@") && k != key)
        schemaCache.put(key, n)
        n
      }
    val df = spark.read.schema(norm).parquet(relayout(spark, path, key, norm))
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  // Relayout cache: the corpus writer of the day can emit SINGLE
  // row-group files, and a parquet row group is the unit of scan
  // parallelism — one hostile file serializes not just its own decode
  // but every operator Spark fuses into the scan stage (shingle
  // explodes, per-row feature extraction), turning a 32-core run into
  // a 1-core run. Compacting/splitting repeatedly-read inputs to the
  // cluster's parallelism is standard warehouse practice (what
  // Delta/Iceberg compaction does); here it is a one-time local
  // rewrite into tmpdir, keyed by the same (path, signature) as the
  // schema cache so a driver-side regeneration invalidates it, and
  // published by atomic rename so concurrent JVMs cannot observe a
  // partial copy. Only fires when the layout is actually hostile
  // (fewer row groups than min(cores, 8)) and the table is big enough
  // to matter (≥ 2000 rows); dimension tables read as-is. Strictly an
  // optimization: any failure falls back to the source path.
  private val relayoutPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def relayout(spark: SparkSession, srcPath: String, key: String,
      schema: org.apache.spark.sql.types.StructType): String =
    relayoutPaths.computeIfAbsent(key, { _ =>
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(srcPath)
        val fs = p.getFileSystem(conf)
        if (!fs.getFileStatus(p).isFile) srcPath // directory datasets keep their layout
        else {
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
          val (rowGroups, rows) =
            try (reader.getRowGroups.size, reader.getRecordCount)
            finally reader.close()
          val bytesPerRow = fs.getFileStatus(p).getLen / math.max(rows, 1L)
          val cores = spark.sparkContext.defaultParallelism
          // Who benefits from splitting, and how much — r7 re-ran the
          // calibration with run-ORDER controls (alternating configs;
          // the first sweep after any idle period measures ~1.5x slow
          // regardless of config, which is exactly the drift that
          // produced r6's "cap 8 starves d05" watch item):
          //   - Wide rows (≥64 B/row compressed: documents, embeddings)
          //     are the map-heavy class — their scans fuse with shingle
          //     explodes, feature extraction, vector math. At sf0.1 the
          //     rows/floor bound binds (documents 8-way, embeddings
          //     3-way) so cap 8 vs 16 vs 32 measured IDENTICAL once
          //     drift was controlled. At sf1 (50k docs, cap binds) the
          //     ordering is monotone AGAINST wider splits: 6-entry
          //     subset w8 20.2 s / w16 27.7 s / w32 31.4 s, d05 alone
          //     13.9/20.1/23.5 s — more concurrent map tasks cost more
          //     in memory pressure than they buy in parallelism here.
          //     Cap stays 8; the r6 watch item closes as drift.
          //   - Narrow fact tables go scan→shuffle→parallel compute,
          //     so splitting them is net task overhead. Calibrated r7
          //     (8-entry fact subset): off 3.35 s, 4-way 3.54 s, 8-way
          //     3.80 s — bp01's percentile scans DO gain from 4-way
          //     (1.10→0.93 s) but st01/q70/d07 pay more than that
          //     combined, so narrow stays OFF (width 0 = leave the
          //     source layout untouched).
          // Env overrides (cap per class, per-partition row floor)
          // exist so the next corpus regen can re-run this calibration
          // without a code edit.
          val wideW = sys.env.get("SPARK_GRAFT_RELAYOUT_WIDE").map(_.toInt)
            .getOrElse(math.min(cores, 8))
          val narrowW = sys.env.get("SPARK_GRAFT_RELAYOUT_NARROW").map(_.toInt)
            .getOrElse(0)
          val floor = sys.env.get("SPARK_GRAFT_RELAYOUT_FLOOR").map(_.toLong)
            .getOrElse(625L)
          val widthCap = if (bytesPerRow >= 64) wideW else narrowW
          val target = math.max(2L, math.min(widthCap.toLong, rows / floor)).toInt
          if (widthCap < 2 || rowGroups >= target || rows < 2000) srcPath
          else {
            val safe = key.replaceAll("[^A-Za-z0-9._-]", "_")
            // width in the directory name: a policy/calibration change
            // must invalidate layouts cached under the old width
            val out = new java.io.File(sys.props("java.io.tmpdir"),
              s"graft-relayout-$safe-w$target").toPath
            if (!out.resolve("_SUCCESS").toFile.exists()) {
              // stale relayouts of older signatures for this source are
              // dead weight — drop them best-effort before publishing
              val prefix = "graft-relayout-" +
                (srcPath + "@").replaceAll("[^A-Za-z0-9._-]", "_")
              Option(out.getParent.toFile.listFiles()).getOrElse(Array.empty)
                .filter(f => f.getName.startsWith(prefix) && f.getName != out.getFileName.toString)
                .foreach(f => try org.apache.commons.io.FileUtils.deleteDirectory(f)
                  catch { case _: Exception => () })
              val tmp = out.resolveSibling(
                out.getFileName.toString + ".tmp-" + ProcessHandle.current().pid())
              spark.read.schema(schema).parquet(srcPath)
                .repartition(target)
                .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
                .parquet(tmp.toString)
              try java.nio.file.Files.move(tmp, out,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch {
                // another JVM published first; identical content
                case _: java.nio.file.FileAlreadyExistsException |
                    _: java.nio.file.AccessDeniedException |
                    _: java.nio.file.DirectoryNotEmptyException =>
                  org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
              }
            }
            out.toString
          }
        }
      } catch { case _: Exception => srcPath }
    })

  /** Register every table as a temp view so `spark.sql` queries can use
    * bare table names (mirrors how the DuckDB oracle sees them). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Re-register parquet tables a PREVIOUS process left in the
    * warehouse: the default in-memory catalog forgets every managed
    * table at JVM exit while the data stays on disk, so without this a
    * serve reboot makes all ingested/task-created tables invisible
    * (the reference's DuckDB file database persists naturally; the
    * Spark analog must rescan). Returns the table-directory names
    * DETECTED (whether or not registration succeeded) — the caller's
    * restore-on-boot check needs "does the warehouse hold tables", not
    * "did every create succeed". Underscore/dot-prefixed directories
    * are infrastructure (_graft_state, snapshots), never tables.
    *
    * Documented divergence: re-registration creates EXTERNAL tables,
    * so a table dropped AFTER a reboot leaves its files behind (and
    * would resurrect at the next boot) where the reference's DROP
    * removes it from the database file. Visibility across reboots is
    * the contract worth keeping; clean up dropped-table directories
    * out-of-band if that edge matters. */
  def registerWarehouse(spark: SparkSession): Seq[String] = {
    val fsConf = spark.sparkContext.hadoopConfiguration

    def directParquet(fs: org.apache.hadoop.fs.FileSystem,
        dir: org.apache.hadoop.fs.Path): Boolean =
      try fs.listStatus(dir).exists(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      catch { case _: java.io.IOException => false }

    // parquet ANYWHERE below — a partitioned table (key=val subdirs)
    // must still count as DETECTED so the restore-on-boot gate doesn't
    // read "warehouse empty" and overwrite it, even though
    // registration below is flat-layout only
    def anyParquetBelow(fs: org.apache.hadoop.fs.FileSystem,
        dir: org.apache.hadoop.fs.Path, depth: Int = 0): Boolean =
      directParquet(fs, dir) || (depth < 3 && {
        try fs.listStatus(dir).exists(st =>
          st.isDirectory && anyParquetBelow(fs, st.getPath, depth + 1))
        catch { case _: java.io.IOException => false }
      })

    def register(tableName: String, dir: org.apache.hadoop.fs.Path,
        fs: org.apache.hadoop.fs.FileSystem): Option[String] =
      if (directParquet(fs, dir)) {
        try {
          if (!spark.catalog.tableExists(tableName))
            spark.catalog.createTable(tableName, dir.toString, "parquet")
        } catch {
          case e: Exception =>
            System.err.println(s"[tables] could not re-register '$tableName': ${e.getMessage}")
        }
        Some(tableName)
      } else if (anyParquetBelow(fs, dir)) {
        // partitioned or otherwise nested layout: count it (the data
        // exists!) but leave registration to the operator — an
        // unpartitioned external mapping would silently drop the
        // partition columns
        System.err.println(s"[tables] '$tableName' has a nested/partitioned " +
          "layout; detected but not auto-registered")
        Some(tableName)
      } else None

    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(fsConf)
    if (!fs.exists(wh)) return Nil
    fs.listStatus(wh).toSeq
      .filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .flatMap { st =>
        val name = st.getPath.getName
        if (name.endsWith(".db")) {
          // non-default database (ingest's db.table support lands at
          // warehouse/<db>.db/<table>/) — recreate the namespace and
          // register each table under it
          val db = name.stripSuffix(".db")
          try spark.sql(s"CREATE DATABASE IF NOT EXISTS `${db.replace("`", "``")}`")
          catch { case _: Exception => () }
          try fs.listStatus(st.getPath).toSeq
            .filter(t => t.isDirectory && !t.getPath.getName.startsWith("_"))
            .flatMap(t => register(s"$db.${t.getPath.getName}", t.getPath, fs))
          catch { case _: java.io.IOException => Nil }
        } else register(name, st.getPath, fs)
      }
  }
}
