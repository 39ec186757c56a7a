package graft.state

import graft.ingest.SchemaInfer
import graft.ingest.SchemaInfer.{JArray, JNumber, JObject, JString}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.collection.mutable

/** Journal replication over HTTP for nodes WITHOUT shared storage —
  * the engine-side answer to the reference's NATS transport
  * (server/comms/comms.go: every node publishes state events to the
  * broker and every node's consumer applies them). Here each node
  * keeps its OWN local journal for its own submits, serves it at
  * `GET /api/journal/events?after=<seq>` (token-gated, the comms-token
  * analog), and pulls every configured peer's journal on a timer,
  * applying fetched events through the same idempotent MetaStore
  * handlers the local replay uses.
  *
  * Design points, mirrored from the journal's own philosophy:
  *   - Origin-local persistence: fetched peer events are applied to
  *     the in-memory store but NOT re-appended to the local journal —
  *     re-publishing would echo events around the mesh forever and
  *     destroy the per-origin seq ordering. Consequence: a freshly
  *     booting node re-pulls every peer FROM SEQ 0 (cursors are
  *     in-memory only), exactly like local boot replays the full
  *     journal; handlers are idempotent so re-application converges.
  *   - Availability trade-off, stated: if an origin node is
  *     permanently lost, events that lived only in its journal are
  *     unavailable to NEWLY BOOTING nodes (running nodes keep their
  *     applied state). The reference's JetStream broker persists
  *     events centrally; a durability-equivalent deployment here
  *     points GRAFT_STATE_DIR at shared/replicated storage instead —
  *     this transport exists for when that is impossible (README
  *     "Deployment envelope").
  *   - Full mesh: peers do not relay third-party events, so every
  *     node lists every other node in GRAFT_PEERS (at human-driven
  *     metadata rates an N² poll mesh is trivially cheap).
  *
  * Within one origin, events apply in seq order (the per-request batch
  * is ordered and the cursor only moves forward), so the per-writer
  * program order the churn drill pins holds across the mesh.
  *
  * Why cursor RESUME is sound here when the shared-FS poller must
  * full-replay: a served journal has exactly ONE writer (its own
  * node, whose `append` is JVM-monitor-serialized and publishes via
  * atomic rename), so a listing can never observe seq N+1 without N
  * and no event can land below an advanced cursor. That invariant
  * breaks if two processes share one GRAFT_STATE_DIR *and* peers pull
  * it over HTTP — deploy one or the other transport per journal, not
  * both.
  */
final class PeerSync(app: StateJournal.StateApp, peers: Seq[String],
    token: String, intervalMillis: Long = 2000,
    onApplied: Int => Unit = _ => (),
    // single source of truth with the serving side: the "keep pulling
    // while batches come back full" heuristic in pollOnce silently
    // degrades to one-batch-per-poll if the server cap drops below
    // the client's — so the default IS the server cap, not a copy
    batchLimit: Int = graft.api.HttpApi.SyncBatchLimit)
    extends AutoCloseable {

  private val cursors = mutable.Map.empty[String, Long]
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()
  // one log line per peer per availability TRANSITION, not per failed
  // poll — a down peer would otherwise spam the log every interval
  private val down = mutable.Set.empty[String]

  private def fetch(peer: String, after: Long): Option[Seq[StateJournal.Event]] = {
    val uri = URI.create(peer.stripSuffix("/") + s"/api/journal/events?after=$after")
    val req = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(10))
      .header("Authorization", "Bearer " + token)
      .GET().build()
    try {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) {
        if (down.add(peer))
          System.err.println(s"[peersync] $peer responded ${resp.statusCode()}")
        None
      } else {
        if (down.remove(peer)) System.err.println(s"[peersync] $peer recovered")
        val o = SchemaInfer.parseOrdered(resp.body())
        Some(o.map.get("events") match {
          case Some(JArray(xs)) => xs.collect { case e: JObject =>
            val seq = e.map.get("seq").collect { case JNumber(n) => n.toLong }.getOrElse(0L)
            val ev = e.map.get("event").collect { case JString(s) => s }.getOrElse("")
            val payload = e.map.get("payload").collect { case p: JObject => p }
              .getOrElse(JObject(Vector.empty))
            StateJournal.Event(seq, ev, payload)
          }
          case _ => Nil
        })
      }
    } catch {
      case e: Exception =>
        if (down.add(peer))
          System.err.println(s"[peersync] $peer unreachable: ${e.getMessage}")
        None
    }
  }

  /** One pull round over every peer; returns how many events were
    * newly fetched and applied. Synchronous — the unit tests drive
    * this directly; Serve runs it on the daemon timer via start(). */
  def pollOnce(): Int = synchronized {
    var applied = 0
    peers.foreach { peer =>
      var continue = true
      while (continue) {
        fetch(peer, cursors.getOrElse(peer, 0L)) match {
          case Some(events) if events.nonEmpty =>
            events.sortBy(_.seq).foreach { e =>
              app.store.apply(e.event, e.payload)
              cursors(peer) = math.max(cursors.getOrElse(peer, 0L), e.seq)
              applied += 1
            }
            // a full batch means the server truncated — keep pulling
            continue = events.size >= batchLimit
          case _ => continue = false
        }
      }
    }
    applied
  }

  private val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-peer-sync"); t.setDaemon(true); t
  })

  def start(): Unit = {
    exec.scheduleWithFixedDelay(new Runnable {
      def run(): Unit =
        // a transient network fault must not kill the poll chain
        try { val n = pollOnce(); if (n > 0) onApplied(n) }
        catch { case _: Exception => () }
    }, intervalMillis, intervalMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  override def close(): Unit = { exec.shutdownNow(); () }
}
