package graft

import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("st12 interval join: crafted fixture — stream equals batch, window boundary exact, late replay dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // user 1: view at 00:00; purchases at +239 min (in), +240 min (in,
    // boundary inclusive), +241 min (out). user 2: purchase with no
    // prior view (no attribution). user 3: purchase BEFORE its view
    // (no attribution — the interval is one-directional).
    val views = Seq(
      Event(10, ts("2024-01-01T00:00:00Z"), 1, "view", 0.0),
      Event(11, ts("2024-01-01T08:00:00Z"), 3, "view", 0.0))
    val buys = Seq(
      Event(20, ts("2024-01-01T03:59:00Z"), 1, "purchase", 5.0),
      Event(21, ts("2024-01-01T04:00:00Z"), 1, "purchase", 6.0),
      Event(22, ts("2024-01-01T04:01:00Z"), 1, "purchase", 7.0),
      Event(23, ts("2024-01-01T05:00:00Z"), 2, "purchase", 8.0),
      Event(24, ts("2024-01-01T07:00:00Z"), 3, "purchase", 9.0))
    val vIn = MemoryStream[Event]
    val bIn = MemoryStream[Event]
    val joined = Streams.attributionJoin(vIn.toDF(), bIn.toDF(),
      windowMinutes = 240, delay = "1 hour")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("st12_spec").start()
    vIn.addData(views)
    bIn.addData(buys)
    q.processAllAvailable()
    val got = spark.table("st12_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == Set(
      (20L, 10L, 1L, 14340L, 5.0),
      (21L, 10L, 1L, 14400L, 6.0)),
      s"interval-join fixture diverged: $got")
    // late replay: watermark sits near 07:00 (max event-time minus 1h
    // delay); re-publishing the matched day-old pair must add NOTHING —
    // the watermark drops the rows and the evicted state cannot re-match
    vIn.addData(Seq(views.head))
    bIn.addData(Seq(buys.head))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("st12_spec").count() == 2L,
      "late replay re-emitted attribution pairs — watermark state discipline broken")
  }

  test("st13 outer interval join: unmatched purchase emits ONLY after the watermark horizon, exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // user 1: view + in-window purchase (matched pair — emits as soon
    // as both sides arrive). user 2: purchase with NO view — the
    // null-view row may NOT emit until the watermark proves no
    // matching view can still arrive, and then exactly once.
    val vIn = MemoryStream[Event]
    val bIn = MemoryStream[Event]
    val joined = Streams.attributionJoinOuter(vIn.toDF(), bIn.toDF(),
      windowMinutes = 240, delay = "1 hour")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("st13_spec").start()
    vIn.addData(Seq(Event(10, ts("2024-01-01T00:00:00Z"), 1, "view", 0.0)))
    bIn.addData(Seq(
      Event(20, ts("2024-01-01T01:00:00Z"), 1, "purchase", 5.0),
      Event(21, ts("2024-01-01T01:00:00Z"), 2, "purchase", 8.0)))
    q.processAllAvailable()
    def rows() = spark.table("st13_spec").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSeq
    assert(rows().toSet == Set((20L, Some(10L), 1L)),
      s"before the horizon only the matched pair may emit: ${rows()}")
    // watermark sits at 01:00 - 1h delay = 00:00; purchase 21's window
    // ([21.pts - 240min, 21.pts]) is still open — push event time past
    // pts + delay so the join state can close, then one more batch to
    // run the eviction (st03's two-sentinel discipline)
    Seq("2024-01-02T00:00:00Z", "2024-01-02T01:00:00Z").zipWithIndex
      .foreach { case (t, i) =>
        vIn.addData(Seq(Event(-101L - i, ts(t), -1, "view", 0.0)))
        bIn.addData(Seq(Event(-102L - i, ts(t), -1, "purchase", 0.0)))
        q.processAllAvailable()
      }
    val real = rows().filter(_._3 >= 0)
    assert(real.count(_ == ((21L, None, 2L))) == 1,
      s"unmatched purchase must emit exactly once with a null view: $real")
    assert(real.toSet == Set((20L, Some(10L), 1L), (21L, None, 2L)),
      s"outer join emitted unexpected rows: $real")
    // a further watermark push must not re-emit the evicted row
    vIn.addData(Seq(Event(-110L, ts("2024-01-02T03:00:00Z"), -1, "view", 0.0)))
    bIn.addData(Seq(Event(-111L, ts("2024-01-02T03:00:00Z"), -1, "purchase", 0.0)))
    q.processAllAvailable()
    q.stop()
    assert(rows().filter(_._3 >= 0).count(_ == ((21L, None, 2L))) == 1,
      "watermark advance re-emitted an already-flushed unmatched purchase")
  }

  test("st12 entry: stream-stream interval join equals the batch interval join on the corpus slice") {
    val dir = "/root/testdata/sf0.01"
    val stream = SparkEntry.queries("st12_stream_interval_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(stream.size == 55, s"expected 55 attributed pairs, got ${stream.size}")
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, dir, "events")
      .orderBy("event_id").limit(5000)
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("vts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("bu"), col("event_id").as("buy_id"),
        col("ts").as("pts"), col("value"))
    val batch = v.join(p, col("user_id") === col("bu") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr("INTERVAL 240 MINUTES"))
      .select(col("buy_id"), col("view_id"), col("user_id"),
        (col("pts").cast("long") - col("vts").cast("long")).as("lag_seconds"),
        round(col("value"), 2).as("value"))
      .orderBy("buy_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(stream == batch, "stream-stream join diverged from the batch interval join")
  }

  test("windowed counts with watermark (complete mode over memory sink)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = Streams.windowedCounts(input.toDF(), "5 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wc_out").start()
    input.addData(
      Event(1, ts("2024-01-01T00:01:00Z"), 1, "click", 1.0),
      Event(2, ts("2024-01-01T00:02:00Z"), 1, "click", 2.0),
      Event(3, ts("2024-01-01T00:07:00Z"), 2, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    input.addData(Event(9, ts("2024-01-01T01:00:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wc_out").collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2024-01-01T00:00:00Z", "click", 2L)))
    assert(rows.contains(("2024-01-01T00:05:00Z", "view", 1L)))
  }

  test("streaming dedup drops repeated ids within the watermark window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = Streams.dedupeByKey(input.toDF(), "ts", "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()
    input.addData(
      Event(1, ts("2024-01-01T00:01:00Z"), 1, "click", 1.0),
      Event(1, ts("2024-01-01T00:01:00Z"), 1, "click", 1.0), // same batch dup
      Event(2, ts("2024-01-01T00:02:00Z"), 1, "view", 2.0))
    q.processAllAvailable()
    // republish id 1 in a later batch, still inside the window
    input.addData(Event(1, ts("2024-01-01T00:03:00Z"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd_out").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("streamed decontamination gate agrees with the batch dec01 verdict") {
    // the streamed st04 keeps exactly the corpus docs dec01 does NOT
    // flag — same tokenization kernel, so the agreement must be exact
    val dir = "/root/testdata/sf0.01"
    val flagged = SparkEntry.queries("dec01_decontaminate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val corpus = Tables.t(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expectClean = corpus.filterNot { case (id, _) => flagged(id) }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val streamed = SparkEntry.queries("st04_stream_decontaminate")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == expectClean,
      s"streamed gate diverges from batch dec01: $streamed vs $expectClean")
    // and the gate discriminates on this corpus (some flagged, some clean)
    assert(flagged.nonEmpty && streamed.values.sum > 0)
  }

  test("stateful sessionization emits closed sessions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = Streams.sessionize(input.toDS(), gapSeconds = 600)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    // user 1: two events 2 min apart (one session), then 30 min silence
    input.addData(
      Event(1, ts("2024-01-01T00:00:00Z"), 1, "click", 1.0),
      Event(2, ts("2024-01-01T00:02:00Z"), 1, "view", 1.0))
    q.processAllAvailable()
    // a much later event advances the watermark past the session timeout
    input.addData(Event(3, ts("2024-01-01T02:00:00Z"), 2, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(4, ts("2024-01-01T04:00:00Z"), 2, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    assert(rows.contains((1L, 2))) // user 1's 2-event session closed
  }

  test("streamed drift gate equals the batch guard02 verdict exactly") {
    // st07 appends per-batch partial cell masses; the merged read-back
    // must reproduce guard02's shares bit-for-bit (integer sums merge
    // losslessly across micro-batches)
    val dir = "/root/testdata/sf0.01"
    def key(name: String) = SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val streamed = key("st07_stream_drift")
    val batch = key("guard02_distribution_drift")
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("st11 idempotent tar sink: a replayed micro-batch leaves the shard tree identical") {
    // same at-least-once argument as st10, for the tar sink: the
    // gen=<batchId> CLEAR-then-write must make a replay a no-op at
    // the BYTE level (tar bytes are deterministic), and the audit
    // over the generation tree must equal a single batch build's
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.t(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-st11-replay")
      .toString + "/tars"
    graft.queries.PipelineOps.tarShardWriteGen(
      docs.filter(col("doc_id") % 7 =!= 3), base, batchId = -1L, shards = 8)
    val batch = docs.filter(col("doc_id") % 7 === 3)
    val (b1, b2) = (batch.filter(col("doc_id") % 2 === 0),
      batch.filter(col("doc_id") % 2 =!= 0))
    graft.queries.PipelineOps.tarShardWriteGen(b1, base, batchId = 0L, shards = 8)
    graft.queries.PipelineOps.tarShardWriteGen(b2, base, batchId = 1L, shards = 8)
    def fileMd5s(): Map[String, String] = {
      val root = new java.io.File(base)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".tar")).map { f =>
        val d = java.security.MessageDigest.getInstance("MD5")
        f.getPath.stripPrefix(base) ->
          d.digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map(b => f"$b%02x").mkString
      }.toMap
    }
    def audit() = graft.queries.PipelineOps.tarShardAudit(spark, base)
      .collect().map(_.toString).toSeq
    val (before, auditBefore) = (fileMd5s(), audit())
    // the REPLAY: batch 1 runs again with the same batchId
    graft.queries.PipelineOps.tarShardWriteGen(b2, base, batchId = 1L, shards = 8)
    assert(fileMd5s() == before,
      "replayed batch changed the shard tree — tar sink is not idempotent")
    assert(audit() == auditBefore && auditBefore.nonEmpty)
    // the generation tree audits exactly like one single-build shard set
    val single = java.nio.file.Files.createTempDirectory("graft-st11-single")
      .toString + "/tars"
    graft.queries.PipelineOps.tarShardWrite(docs, single, shards = 8)
    val singleAudit = graft.queries.PipelineOps.tarShardAudit(spark, single)
      .collect().map(_.toString).toSeq
    assert(audit() == singleAudit,
      "streaming-assembled tree diverges from the single batch build")
  }

  test("st10 idempotent sink: a replayed micro-batch leaves the index row-identical") {
    // foreachBatch delivery is at-least-once: a failed-and-retried
    // micro-batch re-runs with the SAME batchId. The gen=<batchId>
    // overwrite sink must make that replay a no-op — the r8 verdict's
    // missing exactly-once form (the old append sink double-appended).
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-st10-replay")
      .toString + "/index"
    graft.queries.PipelineOps.positionalIndexWriteGen(
      docs.filter(col("doc_id") % 7 =!= 3), base, batchId = -1L)
    val batch = docs.filter(col("doc_id") % 7 === 3)
    val (b1, b2) = (batch.filter(col("doc_id") % 2 === 0),
      batch.filter(col("doc_id") % 2 =!= 0))
    graft.queries.PipelineOps.positionalIndexWriteGen(b1, base, batchId = 0L)
    graft.queries.PipelineOps.positionalIndexWriteGen(b2, base, batchId = 1L)
    def snapshot() = spark.read.parquet(base)
      .select("doc_id", "pos", "term", "bucket", "gen").collect()
      .map(_.toString).sorted.toSeq
    def serve() = graft.queries.PipelineOps.phraseSearchOf(
      spark.read.parquet(base), Seq("slow", "hash", "batch")).collect()
      .map(_.toString).toSeq
    val (before, servedBefore) = (snapshot(), serve())
    // the REPLAY: batch 1 runs again with the same batchId
    graft.queries.PipelineOps.positionalIndexWriteGen(b2, base, batchId = 1L)
    assert(snapshot() == before,
      "replayed batch changed the index — sink is not idempotent")
    assert(serve() == servedBefore && servedBefore.nonEmpty)
    // serve pruning unchanged by the gen level: the probe still
    // carries each term's literal bucket as a PartitionFilter
    val plan = graft.queries.PipelineOps.phraseSearchOf(
      spark.read.parquet(base), Seq("slow", "hash", "batch"))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal no longer prunes under the gen layout:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed under the gen layout:\n$plan")
  }

  test("st14 upsert: latest revision wins across generations, no duplicate postings, replayed batch is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.queries.PipelineOps.{positionalIndexWriteGen,
      tombstoneWriteGen, genPartitionedViewOf, proximitySearchOf}
    val base = java.nio.file.Files.createTempDirectory("graft-st14-spec")
      .toString
    val (idx, tomb) = (s"$base/index", s"$base/tomb")
    // base doc + two successive revisions of doc 1: only the NEWEST
    // text may serve, and the middle generation must be as invisible
    // as the base one
    positionalIndexWriteGen(
      Seq((1L, "alpha beta"), (2L, "alpha beta")).toDF("doc_id", "text"),
      idx, batchId = -1L)
    val r1 = Seq((1L, "gamma alpha beta")).toDF("doc_id", "text")
    positionalIndexWriteGen(r1, idx, 0L)
    tombstoneWriteGen(r1.select("doc_id"), tomb, 0L)
    val r2 = Seq((1L, "delta alpha beta")).toDF("doc_id", "text")
    positionalIndexWriteGen(r2, idx, 1L)
    tombstoneWriteGen(r2.select("doc_id"), tomb, 1L)
    def view() = genPartitionedViewOf(spark, idx, tomb)
    def hits(ts: Seq[String], w: Int) = proximitySearchOf(view(), ts, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hits(Seq("gamma", "beta"), 5).isEmpty,
      "the overwritten middle revision still serves")
    assert(hits(Seq("delta", "beta"), 5) == Seq((1L, 2L)),
      "the newest revision does not serve")
    // no duplicate postings: the doc revised twice carries exactly one
    // live copy of each token
    assert(view().count() == 3 + 2,
      "latest-wins collapse failed: a doc serves more than one generation")
    // replay: re-running batch 1 (same batchId) changes nothing
    val before = view().collect().map(_.toString).sorted.toSeq
    positionalIndexWriteGen(r2, idx, 1L)
    tombstoneWriteGen(r2.select("doc_id"), tomb, 1L)
    assert(view().collect().map(_.toString).sorted.toSeq == before,
      "replayed upsert batch changed the served view")
    // real-corpus entry: the rerevised docs answer from generation 2
    // only (the 'final revised' prefix puts the probe at span 1)
    val rows = SparkEntry.queries("st14_stream_index_upsert")(
      spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rere = rows.filter(_._1 == "rerevised")
    assert(rere.nonEmpty && rere.forall(x => x._2 % 18 == 4 && x._3 == 1L),
      "rerevised probe hit a non-rerevised doc or a stale generation")
  }
}
