package graft.queries

/** Shared tar-shard writer core for the WebDataset-style sinks
  * (sink04's text shards, mm15's multimodal shards): streams
  * (shard, members) rows — already sorted by shard, with every shard
  * wholly inside one partition — into `shard-%05d.tar` files under
  * `dir` via Hadoop FS (cloud-path-safe). Determinism contract:
  * callers pass members in a deterministic order; entries get epoch
  * mtimes and default modes, so a rerun produces BYTE-IDENTICAL shard
  * files (pinned by the sink04 spec). Nothing buffers a shard in
  * memory — members stream straight to the archive. */
private[graft] object TarIO {
  import org.apache.commons.compress.archivers.tar.{
    TarArchiveEntry, TarArchiveOutputStream}

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
        if (shard != cur) { open(shard); cur = shard }
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
