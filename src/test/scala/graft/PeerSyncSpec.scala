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
