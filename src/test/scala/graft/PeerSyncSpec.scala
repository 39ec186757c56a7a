package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.HttpApi
import graft.state.{PeerSync, StateJournal}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** PeerSync: journal replication over HTTP for nodes WITHOUT shared
  * storage (the reference's NATS comms analog). Two real StateApps
  * with SEPARATE journal dirs, each serving its journal through a real
  * HttpApi on an ephemeral port; convergence, auth, re-pull-from-zero,
  * bidirectional sync, and origin-local journal persistence are all
  * pinned. */
class PeerSyncSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val token = "cluster-sync-token"

  private def node(): (StateJournal.StateApp, HttpApi, Int) = {
    val dir = Files.createTempDirectory("graft-peersync").toString
    val app = new StateJournal.StateApp(dir)
    app.boot()
    val api = new HttpApi(spark, app.store, "peer-secret",
      submit = app.submit,
      config = HttpApi.Config(syncToken = token), journal = app.journal)
    val port = api.start()
    (app, api, port)
  }

  private def dash(id: String, n: Int): String =
    s"""{"id":"$id","name":"D$id","content":"SELECT $n AS x;","timestamp":$n}"""

  test("B converges to A's journal over HTTP, incrementally and idempotently") {
    val (a, apiA, portA) = node()
    val (b, apiB, _) = node()
    try {
      (1 to 5).foreach(i => assert(a.submit("create_dashboard", dash(s"pa$i", i))))
      val sync = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), token)
      assert(sync.pollOnce() == 5)
      assert(b.store.getDashboard("pa3").map(_.content).contains("SELECT 3 AS x;"))
      // cursor advanced: nothing new on the second pull
      assert(sync.pollOnce() == 0)
      // live append on A arrives on the next pull; update order holds
      assert(a.submit("update_dashboard_content",
        """{"id":"pa3","content":"SELECT 33 AS x;","timestamp":9}"""))
      assert(a.submit("delete_dashboard", """{"id":"pa5"}"""))
      assert(sync.pollOnce() == 2)
      assert(b.store.getDashboard("pa3").map(_.content).contains("SELECT 33 AS x;"))
      assert(b.store.getDashboard("pa5").isEmpty)
      // a FRESH sync (rebooted node: in-memory cursors) re-pulls from
      // seq 0 and idempotently converges to the same state
      val fresh = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), token)
      assert(fresh.pollOnce() == 7)
      assert(b.store.getDashboard("pa3").map(_.content).contains("SELECT 33 AS x;"))
      assert(b.store.getDashboard("pa5").isEmpty)
    } finally { apiA.stop(); apiB.stop() }
  }

  test("sync is token-gated: wrong token is 401, no token endpoint is 404") {
    val (a, apiA, portA) = node()
    val (b, apiB, _) = node()
    try {
      assert(a.submit("create_dashboard", dash("sec1", 1)))
      val bad = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), "wrong-token")
      assert(bad.pollOnce() == 0)
      assert(b.store.getDashboard("sec1").isEmpty)
      // an endpoint with sync DISABLED 404s even with the right token
      val off = new HttpApi(spark, a.store, "peer-secret", journal = a.journal)
      val offPort = off.start()
      try {
        val resp = HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$offPort/api/journal/events?after=0"))
            .header("Authorization", "Bearer " + token).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 404)
      } finally off.stop()
    } finally { apiA.stop(); apiB.stop() }
  }

  test("bidirectional mesh converges both ways; journals stay origin-local") {
    val (a, apiA, portA) = node()
    val (b, apiB, portB) = node()
    try {
      (1 to 3).foreach(i => assert(a.submit("create_dashboard", dash(s"ma$i", i))))
      (1 to 4).foreach(i => assert(b.submit("create_dashboard", dash(s"mb$i", i))))
      val aSeq = a.journal.lastSeq()
      val bSeq = b.journal.lastSeq()
      val syncA = new PeerSync(a, Seq(s"http://127.0.0.1:$portB"), token)
      val syncB = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), token)
      assert(syncA.pollOnce() == 4)
      assert(syncB.pollOnce() == 3)
      def ids(app: StateJournal.StateApp): Set[String] =
        app.store.synchronized(app.store.dashboards.keySet.toSet)
      assert(ids(a) == ids(b))
      assert(ids(a) == (1 to 3).map(i => s"ma$i").toSet ++ (1 to 4).map(i => s"mb$i"))
      // origin-local persistence: syncing must NOT re-append peer
      // events into the local journal (echo loops / seq collisions)
      assert(a.journal.lastSeq() == aSeq, "sync re-appended into A's journal")
      assert(b.journal.lastSeq() == bSeq, "sync re-appended into B's journal")
      // and repeated cross-pulls stay quiescent
      assert(syncA.pollOnce() == 0 && syncB.pollOnce() == 0)
    } finally { apiA.stop(); apiB.stop() }
  }

  test("churn: concurrent writers on both nodes converge through live pull threads") {
    // the HTTP analog of RebootSpec's journal churn drill: both nodes
    // submit mixed create/update/delete at full speed on writer
    // threads while both PeerSync pollers run on their own timers; the
    // expected fixpoint is simulated independently (each writer only
    // touches its own id prefix, so it is deterministic under any
    // interleaving)
    // inline node construction (vs node()): the post-churn reboot
    // below needs the journal dirs to boot fresh StateApps over them
    val dirA = Files.createTempDirectory("graft-churn-a").toString
    val dirB = Files.createTempDirectory("graft-churn-b").toString
    val a = new StateJournal.StateApp(dirA); a.boot()
    val b = new StateJournal.StateApp(dirB); b.boot()
    val apiA = new HttpApi(spark, a.store, "peer-secret", submit = a.submit,
      config = HttpApi.Config(syncToken = token), journal = a.journal)
    val apiB = new HttpApi(spark, b.store, "peer-secret", submit = b.submit,
      config = HttpApi.Config(syncToken = token), journal = b.journal)
    val portA = apiA.start()
    val portB = apiB.start()
    // churn runs WITH mirrors on: concurrent pull threads hammer the
    // mirror write path, and the post-churn reboot below proves the
    // mirrors captured the full peer history
    val mirrorA = Files.createTempDirectory("graft-churn-mirror-a").toString
    val mirrorB = Files.createTempDirectory("graft-churn-mirror-b").toString
    val syncA = new PeerSync(a, Seq(s"http://127.0.0.1:$portB"), token, intervalMillis = 50,
      mirrorDir = Some(mirrorA))
    val syncB = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), token, intervalMillis = 50,
      mirrorDir = Some(mirrorB))
    try {
      syncA.start(); syncB.start()
      def churn(app: StateJournal.StateApp, prefix: String): Thread = {
        val t = new Thread(() => {
          (1 to 40).foreach { i =>
            app.submit("create_dashboard", dash(s"${prefix}_$i", i))
            if (i % 3 == 0)
              app.submit("update_dashboard_content",
                s"""{"id":"${prefix}_${i - 2}","content":"SELECT ${i * 1000} AS x;","timestamp":${i + 1}}""")
            if (i % 5 == 0)
              app.submit("delete_dashboard", s"""{"id":"${prefix}_${i - 4}"}""")
          }
        })
        t.start(); t
      }
      val ta = churn(a, "hA")
      val tb = churn(b, "hB")
      ta.join(30000); tb.join(30000)
      assert(!ta.isAlive && !tb.isAlive, "writer thread hung")
      val expected = {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
        for (prefix <- Seq("hA", "hB"); i <- 1 to 40) {
          m(s"${prefix}_$i") = s"SELECT $i AS x;"
          if (i % 3 == 0 && m.contains(s"${prefix}_${i - 2}"))
            m(s"${prefix}_${i - 2}") = s"SELECT ${i * 1000} AS x;"
          if (i % 5 == 0) m.remove(s"${prefix}_${i - 4}")
        }
        m.toSeq.map { case (id, c) => s"$id=$c" }.sorted.mkString(";")
      }
      def summary(app: StateJournal.StateApp): String = app.store.synchronized {
        app.store.dashboards.toSeq
          .map { case (id, d) => s"$id=${d.content}" }.sorted.mkString(";")
      }
      val deadline = System.currentTimeMillis() + 30000
      while ((summary(a) != expected || summary(b) != expected) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(summary(a) == expected, s"A did not converge:\n${summary(a).take(500)}")
      assert(summary(b) == expected, s"B did not converge:\n${summary(b).take(500)}")
      // reboot both nodes AFTER churn, peers' APIs already stopped:
      // local journal replay + mirror replay alone must reconstruct
      // the converged state — the mirrors captured every peer event
      // despite the concurrent writer/puller interleaving
      syncA.close(); syncB.close(); apiA.stop(); apiB.stop()
      val a2 = new StateJournal.StateApp(dirA); a2.boot()
      val b2 = new StateJournal.StateApp(dirB); b2.boot()
      val sA2 = new PeerSync(a2, Seq(s"http://127.0.0.1:$portB"), token, mirrorDir = Some(mirrorA))
      val sB2 = new PeerSync(b2, Seq(s"http://127.0.0.1:$portA"), token, mirrorDir = Some(mirrorB))
      try {
        assert(summary(a2) == expected, s"A reboot diverged:\n${summary(a2).take(500)}")
        assert(summary(b2) == expected, s"B reboot diverged:\n${summary(b2).take(500)}")
      } finally { sA2.close(); sB2.close() }
    } finally { syncA.close(); syncB.close(); apiA.stop(); apiB.stop() }
  }

  test("mirror: reboot replays peer events from disk and resumes the cursor (no re-fetch from 0)") {
    val (a, apiA, portA) = node()
    val dirB = Files.createTempDirectory("graft-peersync-b").toString
    val mirror = Files.createTempDirectory("graft-peersync-mirror").toString
    val peerUrl = s"http://127.0.0.1:$portA"
    try {
      val b1 = new StateJournal.StateApp(dirB); b1.boot()
      (1 to 5).foreach(i => assert(a.submit("create_dashboard", dash(s"mr$i", i))))
      assert(a.submit("update_dashboard_content",
        """{"id":"mr2","content":"SELECT 22 AS x;","timestamp":8}"""))
      assert(a.submit("delete_dashboard", """{"id":"mr5"}"""))
      val s1 = new PeerSync(b1, Seq(peerUrl), token, mirrorDir = Some(mirror))
      assert(s1.mirrorReplayed == 0) // first boot: empty mirror
      assert(s1.pollOnce() == 7)
      s1.close()

      // reboot 1 (peer still up): mirror replay restores the peer
      // state AND the cursor — the fresh-sync-re-pulls-7 behavior the
      // no-mirror test pins must NOT happen here
      val b2 = new StateJournal.StateApp(dirB); b2.boot()
      val s2 = new PeerSync(b2, Seq(peerUrl), token, mirrorDir = Some(mirror))
      assert(s2.mirrorReplayed == 7)
      assert(b2.store.getDashboard("mr2").map(_.content).contains("SELECT 22 AS x;"))
      assert(b2.store.getDashboard("mr5").isEmpty) // delete replayed after create
      assert(s2.pollOnce() == 0, "rebooted cursor re-fetched already-mirrored history")
      // only the delta travels after a live append
      assert(a.submit("create_dashboard", dash("mr9", 9)))
      assert(s2.pollOnce() == 1)
      s2.close()

      // reboot 2 with the peer DOWN: state survives entirely from the
      // local mirror — the availability gap the in-memory cursors had
      apiA.stop()
      val b3 = new StateJournal.StateApp(dirB); b3.boot()
      val s3 = new PeerSync(b3, Seq(peerUrl), token, mirrorDir = Some(mirror))
      assert(s3.mirrorReplayed == 8)
      assert(b3.store.synchronized(b3.store.dashboards.keySet.toSet) ==
        Set("mr1", "mr2", "mr3", "mr4", "mr9"))
      assert(s3.pollOnce() == 0) // peer unreachable; nothing lost
      s3.close()
    } finally apiA.stop()
  }

  test("batch cap: a history longer than one batch pulls completely via re-polls") {
    val (a, apiA, portA) = node()
    val (b, apiB, _) = node()
    try {
      (1 to 25).foreach(i => assert(a.submit("create_dashboard", dash(s"bt$i", i))))
      // tiny client-side batch limit exercises the truncation re-poll
      // loop (the server cap is 1000; the client treats any full batch
      // as truncated, so a small client limit simulates a long history)
      val sync = new PeerSync(b, Seq(s"http://127.0.0.1:$portA"), token, batchLimit = 10)
      assert(sync.pollOnce() == 25)
      assert(b.store.synchronized(b.store.dashboards.size) == 25)
    } finally { apiA.stop(); apiB.stop() }
  }
}
