package graft.state

import graft.ingest.SchemaInfer
import graft.ingest.SchemaInfer.{JArray, JNumber, JObject, JString}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
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
  *     destroy the per-origin seq ordering. Instead, when `mirrorDir`
  *     is set (Serve points it under GRAFT_STATE_DIR), fetched events
  *     are MIRRORED to a per-peer local directory using the journal's
  *     own segment-per-event + write-then-rename discipline, and boot
  *     replays the mirror before the first pull. Reboot network cost
  *     is O(delta since last run), not O(peer history). A bare cursor
  *     file WITHOUT the mirror would be unsound: the materialized view
  *     is in-memory, so resuming at a persisted cursor N on a fresh
  *     process would silently skip every peer event <= N — the mirror
  *     is what makes cursor resume legal (same reasoning as
  *     StateApp.boot's full-replay-vs-checkpoint note). The mirror
  *     invariant persist-or-stop below keeps each peer's mirror a
  *     gapless prefix of that peer's journal, so cursor = mirror max
  *     seq never skips an unmirrored event. Without `mirrorDir`
  *     (unit-test construction), cursors are in-memory and a fresh
  *     node re-pulls from seq 0, exactly like local boot replays the
  *     full journal; handlers are idempotent so re-application
  *     converges either way.
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
    batchLimit: Int = graft.api.HttpApi.SyncBatchLimit,
    // local mirror of fetched peer events (see the class doc): None =
    // in-memory cursors only (re-pull from 0 each boot)
    mirrorDir: Option[String] = None)
    extends AutoCloseable {

  private val cursors = mutable.Map.empty[String, Long]
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5)).build()
  // one log line per peer per availability TRANSITION, not per failed
  // poll — a down peer would otherwise spam the log every interval
  private val down = mutable.Set.empty[String]

  // ---- peer-journal mirror ---------------------------------------
  private val mirrorFs: Option[(org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path)] =
    mirrorDir.map { d =>
      val base = new org.apache.hadoop.fs.Path(d)
      val fs = base.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.mkdirs(base)
      (fs, base)
    }

  /** Peer URL -> stable directory name: a readable sanitized prefix
    * plus an md5 suffix so distinct URLs that sanitize identically
    * ("http://a:1" vs "http://a:2" do not, but be safe) cannot share
    * a mirror. */
  private def peerDirName(peer: String): String = {
    val safe = peer.replaceAll("[^A-Za-z0-9.-]+", "_").take(48)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(peer.getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    s"$safe-$h"
  }

  private def segName(seq: Long, event: String): String = {
    // event names travel over the wire; filesystem-sanitize them (a
    // legit journal event name is [a-z_]+ and passes through unchanged)
    val safe = event.replaceAll("[^A-Za-z0-9_.-]+", "_")
    f"$seq%012d-$safe.json"
  }

  /** Persist one fetched event into the peer's mirror (write-then-
    * rename, same publish discipline as Journal.append). Returns false
    * on any I/O fault — the caller must then STOP the batch for this
    * peer: applying past an unmirrored event would let the cursor (=
    * mirror max seq at next boot) skip it forever. */
  private def mirrorWrite(peer: String, e: StateJournal.Event): Boolean =
    mirrorFs match {
      case None => true
      case Some((fs, base)) =>
        val dir = new org.apache.hadoop.fs.Path(base, peerDirName(peer))
        val dest = new org.apache.hadoop.fs.Path(dir, segName(e.seq, e.event))
        val tmp = new org.apache.hadoop.fs.Path(dir, segName(e.seq, e.event) + ".w")
        try {
          if (fs.exists(dest)) true // idempotent re-fetch after a crash mid-batch
          else {
            fs.mkdirs(dir)
            val out = fs.create(tmp, true)
            try out.write(SchemaInfer.toJsonString(e.payload)
              .getBytes(StandardCharsets.UTF_8))
            finally out.close()
            fs.rename(tmp, dest)
          }
        } catch {
          case ex: java.io.IOException =>
            System.err.println(s"[peersync] mirror write failed for $peer seq ${e.seq}: ${ex.getMessage}")
            try { fs.delete(tmp, false); () } catch { case _: java.io.IOException => }
            false
        }
    }

  /** Replay every mirrored peer directory into the store (oldest seq
    * first within each peer — cross-peer order is immaterial, exactly
    * as live mesh application interleaves arbitrarily) and seed the
    * cursors of CONFIGURED peers from their mirror heads. Directories
    * of peers no longer configured still replay: a running node keeps
    * state it applied from a since-removed peer, so a rebooted one
    * must too. Returns events applied. */
  private def bootFromMirror(): Int = mirrorFs match {
    case None => 0
    case Some((fs, base)) =>
      val byName = peers.map(p => peerDirName(p) -> p).toMap
      var applied = 0
      val dirs =
        try fs.listStatus(base).toSeq.filter(_.isDirectory)
        catch { case _: java.io.IOException => Nil }
      dirs.foreach { d =>
        val events = fs.listStatus(d.getPath).toSeq
          .map(_.getPath).filter(_.getName.endsWith(".json"))
          .map { p =>
            val name = p.getName.stripSuffix(".json")
            (name.takeWhile(_.isDigit).toLong,
              name.dropWhile(_.isDigit).stripPrefix("-"), p)
          }
          .sortBy(_._1)
        var maxSeq = 0L
        events.foreach { case (seq, event, p) =>
          val in = fs.open(p)
          val body =
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](8192)
              var n = in.read(chunk)
              while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
              new String(buf.toByteArray, StandardCharsets.UTF_8)
            } finally in.close()
          val payload = SchemaInfer.parseOrdered(body)
          app.store.apply(event, payload)
          maxSeq = math.max(maxSeq, seq)
          applied += 1
        }
        byName.get(d.getPath.getName).foreach { peer =>
          if (maxSeq > 0) cursors(peer) = maxSeq
        }
      }
      applied
  }

  /** Peer events restored from the local mirror at construction —
    * Serve logs it next to the local journal's replay count. */
  val mirrorReplayed: Int = bootFromMirror()

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
            // persist-or-stop: an event that cannot be mirrored halts
            // this peer's batch BEFORE being applied (and before the
            // cursor moves), so the mirror stays a gapless prefix and
            // the next poll re-fetches from the stall point — in-memory
            // application is idempotent, so the retry converges
            var ok = true
            events.sortBy(_.seq).foreach { e =>
              if (ok && mirrorWrite(peer, e)) {
                app.store.apply(e.event, e.payload)
                cursors(peer) = math.max(cursors.getOrElse(peer, 0L), e.seq)
                applied += 1
              } else ok = false
            }
            // a full batch means the server truncated — keep pulling
            continue = ok && events.size >= batchLimit
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
