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
  * shard revisited after another shard began would silently truncate
  * the earlier file (fs.create overwrites), so out-of-order arrival
  * fails loudly instead. Writes go to final paths with no task-commit
  * protocol — correct under Spark's default one-attempt-per-partition
  * execution; with speculative execution a production deployment
  * writes to an attempt-id temp path and renames on task commit (the
  * snapshots module's write-then-rename discipline). */
private[graft] object TarIO {
  import org.apache.commons.compress.archivers.tar.{
    TarArchiveEntry, TarArchiveOutputStream}

  /** The shard number encoded in a [[writeGrouped]] file name. */
  def shardOf(path: String): Long =
    "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
      .getOrElse(sys.error(s"unexpected shard file name: $path"))
      .group(1).toLong

  /** Walks a whole-shard byte array back into (member name, body)
    * pairs — the single read-side twin both audits build on
    * (PipelineOps.tarShardMembers, MediaCatalogOps.mediaTarAudit), so
    * format handling lives once. */
  def members(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val in = new TarArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
    Iterator.continually(in.getNextEntry).takeWhile(_ != null).map { e =>
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
    var cur = -1L
    var out: TarArchiveOutputStream = null
    def close(): Unit =
      if (out != null) { out.finish(); out.close(); out = null }
    def open(shard: Long): Unit = {
      close()
      val p = new org.apache.hadoop.fs.Path(dir, f"shard-$shard%05d.tar")
      out = new TarArchiveOutputStream(p.getFileSystem(conf).create(p, true))
      out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    }
    try {
      rows.foreach { case (shard, members) =>
        if (shard != cur) {
          require(shard > cur,
            s"rows not sorted by shard: $shard after $cur — a revisit " +
              "would truncate the earlier shard file")
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
    } finally close()
  }
}
