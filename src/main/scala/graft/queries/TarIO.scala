package graft.queries

/** Shared tar-shard writer core for the WebDataset-style sinks
  * (sink04's text shards, mm15's multimodal shards): streams
  * (shard, members) rows — already sorted by shard, with every shard
  * wholly inside one partition — into `shard-%05d.tar` files under
  * `dir` via Hadoop FS (cloud-path-safe). Determinism contract:
  * callers pass members in a deterministic order; entries get epoch
  * mtimes and default modes, so a rerun produces BYTE-IDENTICAL shard
  * files (pinned by the sink04 spec). Nothing buffers a shard in
  * memory — members stream straight to the archive.
  *
  * The sorted-by-shard contract is ENFORCED, not just documented: a
  * shard revisited after another shard began would silently replace
  * the earlier file, so out-of-order arrival fails loudly instead.
  *
  * Commit protocol (speculative-execution safe): each shard streams
  * to an attempt-scoped dotfile (`.tmp-shard-%05d.tar-<attempt>`) and
  * is atomically renamed over the final path on completion. Two
  * racing attempts of the same partition (speculation, or a retried
  * task whose first attempt is still running) each write their own
  * temp file and each rename-overwrite the SAME final path — the
  * writer is deterministic, so both renames install identical bytes
  * and no reader ever sees a torn shard. The readers' `*.tar` glob
  * never matches an in-flight temp file. */
private[graft] object TarIO {
  import org.apache.commons.compress.archivers.tar.{
    TarArchiveEntry, TarArchiveOutputStream}
  import org.apache.hadoop.fs.{FileContext, Options, Path}

  /** Fallback attempt discriminator for writes outside a Spark task
    * (specs, driver-side drills) — inside a task the unique
    * taskAttemptId scopes the temp file instead. */
  private val localAttempt = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The shard number encoded in a [[writeGrouped]] file name.
    * Matches the BASENAME only — a parent directory crafted to look
    * like `shard-N.tar` (an st11 gen dir, a user-named corpus root)
    * must not hijack the shard number. */
  def shardOf(path: String): Long = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    "^shard-(\\d+)\\.tar$".r.findFirstMatchIn(base)
      .getOrElse(sys.error(s"unexpected shard file name: $path"))
      .group(1).toLong
  }

  /** Walks a whole-shard byte array back into (member name, body)
    * pairs — the single read-side twin both audits build on
    * (PipelineOps.tarShardMembers, MediaCatalogOps.mediaTarAudit), so
    * format handling lives once. */
  def members(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val in = new TarArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
    Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
      // getSize.toInt would overflow negative past 2 GiB and mis-size
      // the body buffer — this reader holds a member in one array, so
      // oversized members fail loudly instead
      require(e.getSize >= 0 && e.getSize <= Int.MaxValue,
        s"tar member ${e.getName} size ${e.getSize} exceeds reader limit")
      val body = new Array[Byte](e.getSize.toInt)
      var off = 0
      while (off < body.length) {
        val n = in.read(body, off, body.length - off)
        require(n > 0, s"truncated tar member ${e.getName}")
        off += n
      }
      e.getName -> body
    }.toVector
  }

  def writeGrouped(dir: String,
      rows: Iterator[(Long, Seq[(String, Array[Byte])])]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => s"a${tc.taskAttemptId}")
      .getOrElse(s"l${localAttempt.incrementAndGet()}")
    var cur = -1L
    var out: TarArchiveOutputStream = null
    var tmp: Path = null
    var dst: Path = null
    def commit(): Unit =
      if (out != null) {
        out.finish(); out.close(); out = null
        // atomic rename-overwrite: identical to the plain overwriting
        // create for the single-attempt case, but a racing duplicate
        // attempt can never leave a half-written final file
        FileContext.getFileContext(tmp.toUri, conf)
          .rename(tmp, dst, Options.Rename.OVERWRITE)
      }
    def open(shard: Long): Unit = {
      commit()
      val name = f"shard-$shard%05d.tar"
      dst = new Path(dir, name)
      tmp = new Path(dir, s".tmp-$name-$attempt")
      out = new TarArchiveOutputStream(tmp.getFileSystem(conf).create(tmp, true))
      out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    }
    try {
      rows.foreach { case (shard, members) =>
        if (shard != cur) {
          require(shard > cur,
            s"rows not sorted by shard: $shard after $cur — a revisit " +
              "would replace the earlier shard file")
          open(shard); cur = shard
        }
        members.foreach { case (name, bytes) =>
          val e = new TarArchiveEntry(name)
          e.setSize(bytes.length.toLong)
          e.setModTime(0L) // epoch mtime -> byte-identical reruns
          out.putArchiveEntry(e)
          out.write(bytes)
          out.closeArchiveEntry()
        }
      }
      commit()
    } finally {
      if (out != null) { // abandon a failed attempt, keep the dir clean
        // close() on an archive holding an unclosed entry (failure
        // mid-member-body) itself throws "unclosed entries" — swallow
        // it so the ORIGINAL cause propagates and the temp delete
        // below still runs (r10 self-review: the masked-exception +
        // leaked-.tmp path)
        try out.close()
        catch { case _: java.io.IOException => () }
        val fs = tmp.getFileSystem(conf)
        if (fs.exists(tmp)) { fs.delete(tmp, false); () }
      }
    }
  }
}
