package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream shape
  * (event_id, ts, user_id, event_type, value) — the engine's streaming
  * surface beyond ingest (SURVEY.md §1.1 maps shaper's NATS event
  * stream to readStream; these are the analytic transforms on top).
  *
  * Scale design: watermarks bound state, window aggregation is
  * hash-partitioned on (window, key) with partial aggregation, and the
  * sessionizer keeps one small state object per active user that the
  * watermark timeout reaps.
  */
object Streams {

  /** Tumbling-window event counts with a watermark bounding late data
    * and state size. */
  def windowedCounts(events: DataFrame, window: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(functions.window(col("ts"), window).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  private object functions {
    def window(c: org.apache.spark.sql.Column, w: String): org.apache.spark.sql.Column =
      org.apache.spark.sql.functions.window(c, w)
  }

  /** st12's dataflow — stream-stream INTERVAL join, the ad-attribution
    * shape (impression stream ⋈ conversion stream): each purchase
    * joins the views of the SAME user whose timestamp falls within
    * [view_ts, view_ts + windowMinutes]. Both sides carry event-time
    * watermarks and the join condition bounds the time range in BOTH
    * directions, which is what lets Spark EVICT state: at scale the
    * per-user join state holds only rows inside the interval + delay
    * horizon — without the two-sided time bound, stream-stream join
    * state grows with the stream and the job dies by memory, not by
    * logic. Inner join: matches emit as soon as both sides have
    * arrived (no watermark wait); rows older than the watermark are
    * dropped on arrival (spec-drilled). Returns
    * (buy_id, view_id, user_id, lag_seconds, value). */
  def attributionJoin(views: DataFrame, buys: DataFrame,
      windowMinutes: Int, delay: String): DataFrame = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1, got $windowMinutes")
    val v = views.select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("vts"))
      .withWatermark("vts", delay)
    val b = buys.select(col("user_id").as("buyer_id"),
        col("event_id").as("buy_id"), col("ts").as("pts"), col("value"))
      .withWatermark("pts", delay)
    v.join(b, col("user_id") === col("buyer_id") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("buy_id"), col("view_id"), col("user_id"),
        (col("pts").cast("long") - col("vts").cast("long")).as("lag_seconds"),
        round(col("value"), 2).as("value"))
  }

  /** st13's dataflow — the LEFT-OUTER form of [[attributionJoin]]:
    * every purchase emits, attributed to its in-window views when they
    * exist, or ONCE with null view columns after the watermark closes
    * the join window (the part of stream-stream joins that actually
    * exercises watermark-driven emission: an unmatched purchase cannot
    * emit until Spark has PROVEN no matching view can still arrive —
    * i.e. the watermark passed `pts`'s window bound). Same two-sided
    * time bound, so state stays evictable; the left side is the
    * purchase stream (the side that must always emit). Returns
    * (buy_id, view_id?, user_id, lag_seconds?, value). */
  def attributionJoinOuter(views: DataFrame, buys: DataFrame,
      windowMinutes: Int, delay: String): DataFrame = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1, got $windowMinutes")
    val v = views.select(col("user_id").as("viewer_id"),
        col("event_id").as("view_id"), col("ts").as("vts"))
      .withWatermark("vts", delay)
    val b = buys.select(col("user_id"),
        col("event_id").as("buy_id"), col("ts").as("pts"), col("value"))
      .withWatermark("pts", delay)
    b.join(v, col("user_id") === col("viewer_id") &&
        col("pts") >= col("vts") &&
        col("pts") <= col("vts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        "leftOuter")
      .select(col("buy_id"), col("view_id"), col("user_id"),
        (col("pts").cast("long") - col("vts").cast("long")).as("lag_seconds"),
        round(col("value"), 2).as("value"))
  }

  /** Streaming exactly-once-per-id dedup: drops rows whose `idCols`
    * were already seen, with state bounded by the watermark (the
    * streaming analog of the ingest path's Nats-Msg-Id window —
    * JetStream's duplicate window made declarative). At scale the state
    * store holds only ids newer than the watermark horizon. */
  def dedupeByKey(events: DataFrame, watermarkCol: String, watermark: String,
      idCols: Seq[String]): DataFrame =
    events
      .withWatermark(watermarkCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, nEvents: Int)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  /** Document shape for streaming curation (st04). */
  case class Doc(doc_id: Long, text: String, lang: String)

  /** Document shape carrying provenance, for the streaming tar-shard
    * sink (st11). */
  case class SrcDoc(doc_id: Long, text: String, lang: String, source: String)

  /** Ingest-time decontamination: drop every streamed document sharing
    * a word 3-gram with the (broadcast) benchmark gram set. The gate is
    * a pure map-side filter — the per-doc shingle set is computed by
    * the same single-pass kernel the batch entries use (byte-identical
    * tokenization, `Shingles3.compute`), tested against the broadcast
    * hash set in place. At 100 TB-scale ingest the broadcast is the
    * d13-style Bloom bit table; here the exact set keeps the streamed
    * decision identical to the dec01 batch gate — including null text,
    * which the batch kernel's null-intolerant expression drops from the
    * gram stream (zero grams → clean). */
  def filterContaminated(docs: Dataset[Doc],
      benchGrams: org.apache.spark.broadcast.Broadcast[Set[String]]): Dataset[Doc] =
    docs.filter { d =>
      d.text == null || {
        val grams = graft.exprs.Shingles3.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(d.text))
        var i = 0
        var clean = true
        while (clean && i < grams.numElements()) {
          if (benchGrams.value.contains(grams.getUTF8String(i).toString)) clean = false
          i += 1
        }
        clean
      }
    }

  /** Gap-based sessionization with explicit state: a session closes
    * after `gapSeconds` of inactivity (event-time via the state
    * timeout). The streaming analog of q56's batch sessionization. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = math.max(s.last, t), nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId,
                    new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
        })
  }
}
