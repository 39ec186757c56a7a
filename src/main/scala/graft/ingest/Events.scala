package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Event publishing: the HTTP → bus → ingest path (ref:
  * server/core/events.go:33-95, web/handler/events.go:27-80). The
  * reference publishes JSON to NATS subjects `shaper.ingest.<table>`
  * with a `Nats-Msg-Id` header; the Spark-idiomatic transport is an
  * append-only spool directory consumed by a Structured Streaming file
  * source — durable, replayable, at-least-once, exactly like JetStream
  * from the consumer's point of view.
  *
  * Spool row format (one JSON line per event):
  * {"table": ..., "json": <payload as string>, "header_id": ..., "meta_ts": epoch-ms}
  */
object Events {

  /** Publish one event (a JSON object) for `table`. Accepts objects or
    * arrays (arrays fan out to one event per element, like the HTTP
    * handler). Returns the number of events written. */
  def publish(spoolDir: String, table: String, json: String,
      msgId: Option[String] = None,
      nowMillis: () => Long = () => System.currentTimeMillis()): Int = {
    val trimmed = json.trim
    def explicitId(o: SchemaInfer.JObject): Option[String] = o.map.get("_id") match {
      case Some(SchemaInfer.JString(s)) if s.nonEmpty => Some(s)
      case _ => None
    }
    // per-element message id, like the reference: array elements each get
    // their own id (payload _id or a fresh one, events.go:57-95) — they
    // never share one, so the consumer's Nats-Msg-Id dedup only drops
    // true republishes. A caller-supplied msgId applies to single-object
    // publishes only (the NATS-client-set-header case).
    val payloads: Seq[(String, String)] = // (payload json, header id)
      if (trimmed.startsWith("[")) {
        SchemaInfer.parseOrdered(s"""{"a":$trimmed}""").fields.head._2 match {
          case SchemaInfer.JArray(items) => items.map {
            case o: SchemaInfer.JObject =>
              (SchemaInfer.toJsonString(o),
                explicitId(o).getOrElse(IngestPipeline.generateId()))
            case other => throw new IllegalArgumentException(
              s"event array elements must be objects, got ${other.getClass.getSimpleName}")
          }
          case _ => Seq((trimmed, msgId.getOrElse(IngestPipeline.generateId())))
        }
      } else if (trimmed.startsWith("{")) {
        SchemaInfer.parseOrdered(trimmed) // validate
        Seq((trimmed, msgId.getOrElse(IngestPipeline.generateId())))
      } else throw new IllegalArgumentException("event payload must be a JSON object or array")

    Files.createDirectories(Paths.get(spoolDir))
    val m = graft.render.Model
    val lines = payloads.map { case (p, headerId) =>
      Seq(
        "\"table\":" + m.jsonValue(table),
        "\"json\":" + m.jsonValue(p),
        "\"header_id\":" + m.jsonValue(headerId),
        "\"meta_ts\":" + nowMillis()).mkString("{", ",", "}")
    }
    val file = Paths.get(spoolDir, s"events-${System.nanoTime()}.jsonl")
    Files.write(file, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    payloads.length
  }

  private val spoolSchema = StructType(Seq(
    StructField("table", StringType),
    StructField("json", StringType),
    StructField("header_id", StringType),
    StructField("meta_ts", LongType)))

  /** Streaming source over the spool dir, shaped for IngestStream. */
  def source(spark: SparkSession, spoolDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream.schema(spoolSchema).json(spoolDir)
      .withColumn("meta_ts", timestamp_millis(col("meta_ts")))
  }
}
