package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.api.HttpApi
import graft.auth.{Auth, Tokens}
import graft.state.StateJournal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `graft.Dev` watch workflow — metadata stamping semantics mirror the
  * reference's dev/watch_test.go cases; the end-to-end case drives a
  * real Watcher + HttpPusher against a live HttpApi and observes the
  * save→deploy round trip through `/api/apps`, the reference's
  * file-save → dashboard-version flow (watch.go:70-260). */
class DevSpec extends AnyFunSuite {

  // --- metadata extraction (watch_test.go TestHasLeadingShaperIDComment)

  test("extractAppMeta: id comment detection matches the reference matrix") {
    def hasId(c: String): Boolean = Dev.extractAppMeta(c).id.nonEmpty
    assert(!hasId("select 1"))
    assert(hasId("-- shaperid:ckb0example12345678901234\nselect 1"))
    assert(hasId("-- shaperid:ckb0example12345678901234"))
    // trailing spaces / extra text invalidate the id
    assert(!hasId("-- shaperid:ckb0example12345678901234   \nselect 1"))
    assert(!hasId("-- shaperid:ckb0example12345678901234 extra\nselect 1"))
    // scan stops at the first non-empty non-metadata line
    assert(!hasId("select 1\n-- shaperid:ckb0example12345678901234"))
  }

  test("prependAppMeta matches the reference formatting matrix") {
    assert(Dev.prependAppMeta("testid", None, "select 1") ==
      "-- shaperid:testid\n\nselect 1")
    assert(Dev.prependAppMeta("testid", None, "\nselect 1") ==
      "-- shaperid:testid\n\nselect 1")
    assert(Dev.prependAppMeta("testid", None, "") == "-- shaperid:testid\n\n")
    // sync timestamp rides along on its own line
    assert(Dev.prependAppMeta("testid", Some("2026-01-01T00:00:00Z"), "select 1") ==
      "-- shaperid:testid\n-- shapersync:2026-01-01T00:00:00Z\n\nselect 1")
  }

  test("ensureIdForFile stamps once and is idempotent (watch_test.go)") {
    val tmp = Files.createTempDirectory("graft-dev")
    try {
      val p = tmp.resolve("sample.dashboard.sql")
      Files.write(p, "select 1".getBytes(UTF_8))
      val (content, updated, id) = Dev.ensureIdForFile(p)
      assert(updated && id.nonEmpty)
      assert(content.startsWith("-- shaperid:" + id))
      assert(new String(Files.readAllBytes(p), UTF_8) == content)
      val (_, updatedAgain, idAgain) = Dev.ensureIdForFile(p)
      assert(!updatedAgain && idAgain == id)
      // blank files are left alone
      val blank = tmp.resolve("blank.dashboard.sql")
      Files.write(blank, "  \n".getBytes(UTF_8))
      val (_, blankUpdated, blankId) = Dev.ensureIdForFile(blank)
      assert(!blankUpdated && blankId.isEmpty)
    } finally deleteTree(tmp)
  }

  test("ensureIdsForDir walks nested dirs and counts app files") {
    val tmp = Files.createTempDirectory("graft-dev")
    try {
      val nested = Files.createDirectories(tmp.resolve("nested"))
      Files.write(tmp.resolve("with.dashboard.sql"),
        "-- shaperid:test123\nselect 1".getBytes(UTF_8))
      Files.write(nested.resolve("without.dashboard.sql"), "select 2".getBytes(UTF_8))
      Files.write(nested.resolve("job.task.sql"), "select 3".getBytes(UTF_8))
      Files.write(tmp.resolve("stray.sql"), "select 4".getBytes(UTF_8))
      var warned = false
      val n = Dev.ensureIdsForDir(tmp, m => if (m.contains("stray.sql")) warned = true)
      assert(n == 3 && warned)
      val ensured = new String(Files.readAllBytes(nested.resolve("without.dashboard.sql")), UTF_8)
      assert(ensured.startsWith("-- shaperid:"))
      // stray .sql untouched
      assert(new String(Files.readAllBytes(tmp.resolve("stray.sql")), UTF_8) == "select 4")
    } finally deleteTree(tmp)
  }

  test("throttle parks (not drops) burst saves; moved-in directories are adopted") {
    val tmp = Files.createTempDirectory("graft-dev-throttle")
    val pushed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pusher = new Dev.AppPusher {
      def push(tpe: String, id: String, name: String, folderPath: String,
          content: String): Either[String, String] = {
        pushed.add(folderPath + name); Right("updated")
      }
    }
    // the live-reload hook fires once per successful dashboard push
    val deployed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val w = new Dev.Watcher(tmp, pusher, throttleMillis = 400,
      onDeployed = deployed.add(_))
    try {
      w.start()
      def await(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 15000
        while (!cond) {
          if (System.currentTimeMillis() > deadline) fail(s"timed out: $what (pushed=$pushed)")
          Thread.sleep(50)
        }
      }
      // save-all: two files land inside one throttle window — the
      // reference drops the second; here it parks and flushes
      Files.write(tmp.resolve("one.dashboard.sql"), "SELECT 1;".getBytes(UTF_8))
      Files.write(tmp.resolve("two.dashboard.sql"), "SELECT 2;".getBytes(UTF_8))
      await("both burst saves deployed")(
        pushed.contains("/one") && pushed.contains("/two"))
      // a directory moved INTO the watch tree arrives as one CREATE
      // event with no per-file events — its dashboards must deploy
      val staging = Files.createTempDirectory("graft-dev-staging")
      Files.write(staging.resolve("three.dashboard.sql"), "SELECT 3;".getBytes(UTF_8))
      Thread.sleep(600) // let the throttle window clear
      Files.move(staging, tmp.resolve("bulk"))
      await("moved-in directory adopted")(pushed.contains("/bulk/three"))
      // every successful push also reached the live-reload hook, with
      // the stamped dashboard ids (3 distinct files -> 3 distinct ids)
      await("deploy hook saw all three ids")(deployed.size == 3)
      import scala.jdk.CollectionConverters._
      assert(deployed.asScala.forall(_.matches("[a-z][a-z0-9]{23}")), deployed)
    } finally {
      w.close()
      deleteTree(tmp)
    }
  }

  // --- end-to-end: save → deploy → /api/apps version change

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("watcher pushes dashboard saves to /api/deploy; /api/apps shows the change") {
    val store = new StateJournal.MetaStore()
    val secret = "dev-spec-secret"
    val (_, apiKey) = store.tokens.createApiKey("dev-key",
      Seq(Tokens.Permission.Deploy), Tokens.Actor(Tokens.ActorType.User, "u1"))
    val api = new HttpApi(spark, store, secret)
    val port = api.start()
    val tmp = Files.createTempDirectory("graft-dev-e2e")
    val watcher = new Dev.Watcher(tmp, new Dev.HttpPusher(s"http://127.0.0.1:$port", apiKey),
      throttleMillis = 0)
    try {
      watcher.start()
      val userJwt = Auth.sign(Auth.Claims(None, Map.empty, isPublic = false,
        longLived = false, exp = System.currentTimeMillis() / 1000 + 900), secret)
      def apps(): String = {
        val b = HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/api/apps?recursive=true&include_content=true"))
          .header("Authorization", s"Bearer $userJwt")
        HttpClient.newHttpClient()
          .send(b.GET().build(), HttpResponse.BodyHandlers.ofString()).body()
      }
      def await(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 15000
        while (!cond) {
          if (System.currentTimeMillis() > deadline) fail(s"timed out waiting for $what")
          Thread.sleep(100)
        }
      }
      // create: file appears → dashboard deployed under its stamped id
      val f = tmp.resolve("sales.dashboard.sql")
      Files.write(f, "SELECT 'v1'::LABEL;".getBytes(UTF_8))
      await("create deploy")(apps().contains("\"name\":\"sales\""))
      val id = Dev.extractAppMeta(new String(Files.readAllBytes(f), UTF_8)).id.get
      assert(store.dashboards.contains(id))
      assert(store.dashboards(id).content.contains("'v1'"))
      // the server stores the metadata-STRIPPED body (deploy.go parity;
      // deploy/pull comparisons depend on it)
      assert(!store.dashboards(id).content.contains("shaperid"))
      // update: same id, new content version visible through /api/apps
      Files.write(f, (new String(Files.readAllBytes(f), UTF_8))
        .replace("'v1'", "'v2'").getBytes(UTF_8))
      await("update deploy")(apps().contains("v2"))
      assert(store.dashboards(id).content.contains("'v2'"))
      assert(store.dashboards.count(_._2.name == "sales") == 1)
      // nested dir → folder path; task file → id stamped, NOT deployed
      val sub = Files.createDirectories(tmp.resolve("team"))
      // watcher registers new dirs asynchronously; write after a beat
      Thread.sleep(300)
      val nestedFile = sub.resolve("ops.dashboard.sql")
      Files.write(nestedFile, "SELECT 'nested'::LABEL;".getBytes(UTF_8))
      await("nested deploy")(apps().contains("\"name\":\"ops\""))
      val nestedId = Dev.extractAppMeta(
        new String(Files.readAllBytes(nestedFile), UTF_8)).id.get
      val folderId = store.dashboards(nestedId).folderId
      assert(folderId.nonEmpty && store.folders(folderId.get).name == "team")
      val task = tmp.resolve("job.task.sql")
      Files.write(task, "SELECT 1;".getBytes(UTF_8))
      await("task id stamp")(new String(Files.readAllBytes(task), UTF_8)
        .startsWith("-- shaperid:"))
      assert(store.tasks.isEmpty)
    } finally {
      watcher.close()
      api.stop()
      deleteTree(tmp)
    }
  }

  test("stripAppMeta removes the prefix and its blank separator only") {
    assert(Dev.stripAppMeta("-- shaperid:x\n\nselect 1") == "select 1")
    assert(Dev.stripAppMeta("-- shaperid:x\n-- shapersync:2026-01-01T00:00:00Z\n\nselect 1")
      == "select 1")
    // no metadata: untouched, including leading blank lines
    assert(Dev.stripAppMeta("\nselect 1") == "\nselect 1")
    assert(Dev.stripAppMeta("select 1") == "select 1")
    // blank separator is only eaten when metadata was stripped
    assert(Dev.stripAppMeta("-- shaperid:x\nselect 1") == "select 1")
    // metadata separated by blank lines is still metadata —
    // extractAppMeta scans past blanks, so strip must agree, or a
    // deploy would keep the sync line in the body and restampSync
    // would prepend a second one
    assert(Dev.stripAppMeta("-- shaperid:x\n\n-- shapersync:2026-01-01T00:00:00Z\n\nselect 1")
      == "select 1")
    assert(Dev.extractAppMeta(
      "-- shaperid:x\n\n-- shapersync:2026-01-01T00:00:00Z\n\nselect 1").sync.nonEmpty)
  }

  test("deploy/pull round trip: create, update, stale guard, delete, move") {
    val store = new StateJournal.MetaStore()
    val (_, apiKey) = store.tokens.createApiKey("dp-key",
      Seq(Tokens.Permission.Deploy), Tokens.Actor(Tokens.ActorType.User, "u1"))
    val api = new HttpApi(spark, store, "dp-secret")
    val port = api.start()
    val dir = Files.createTempDirectory("graft-dev-deploy")
    val pullDir = Files.createTempDirectory("graft-dev-pull")
    val client = new Dev.AppsClient(s"http://127.0.0.1:$port", apiKey)
    try {
      // local tree: root dashboard + nested task
      Files.write(dir.resolve("alpha.dashboard.sql"),
        "-- shaperid:appalpha0000000000000001\n\nSELECT 'a'::LABEL;".getBytes(UTF_8))
      val sub = Files.createDirectories(dir.resolve("jobs"))
      Files.write(sub.resolve("nightly.task.sql"),
        "-- shaperid:apptask00000000000000001\n\nSELECT 'init'::SCHEDULE;\nSELECT 1;".getBytes(UTF_8))
      // deploy #1: both created, sync stamps written back
      val r1 = Dev.deploy(dir, client)
      assert(r1.isRight, r1)
      assert(store.dashboards.contains("appalpha0000000000000001"))
      assert(store.tasks.contains("apptask00000000000000001"))
      val stamped = new String(Files.readAllBytes(dir.resolve("alpha.dashboard.sql")), UTF_8)
      assert(stamped.contains("-- shapersync:"), stamped)
      // deploy #2 with no changes: no ops, still Right
      assert(Dev.deploy(dir, client).isRight)
      // validate-only: reports the change set, applies nothing
      Files.write(dir.resolve("extra.dashboard.sql"),
        "-- shaperid:appextra0000000000000001\n\nSELECT 'x'::LABEL;".getBytes(UTF_8))
      val dry = Dev.deploy(dir, client, validateOnly = true)
      assert(dry.exists(_.contains("validate-only")), dry)
      assert(!store.dashboards.contains("appextra0000000000000001"))
      Files.delete(dir.resolve("extra.dashboard.sql"))
      // local edit → update flows (sync stamp keeps the guard green)
      Files.write(dir.resolve("alpha.dashboard.sql"),
        stamped.replace("'a'", "'a2'").getBytes(UTF_8))
      assert(Dev.deploy(dir, client).isRight)
      assert(store.dashboards("appalpha0000000000000001").content.contains("'a2'"))
      // out-of-band prod edit in the FUTURE vs our stamp → stale guard
      store.synchronized {
        val d = store.dashboards("appalpha0000000000000001")
        store.dashboards(d.id) = d.copy(content = "SELECT 'prod-edit'::LABEL;",
          updatedAtMillis = System.currentTimeMillis() + 120000)
      }
      Files.write(dir.resolve("alpha.dashboard.sql"),
        stamped.replace("'a'", "'a3'").getBytes(UTF_8))
      val stale = Dev.deploy(dir, client)
      assert(stale.isLeft && stale.left.exists(_.contains("pull")), stale)
      // pull into a fresh dir: files land at path-derived locations
      val pulled = Dev.pull(pullDir, client)
      assert(pulled.isRight, pulled)
      val pulledAlpha = pullDir.resolve("alpha.dashboard.sql")
      assert(Files.exists(pulledAlpha))
      assert(Files.exists(pullDir.resolve("jobs/nightly.task.sql")))
      val pulledContent = new String(Files.readAllBytes(pulledAlpha), UTF_8)
      assert(pulledContent.contains("prod-edit") && pulledContent.contains("-- shapersync:"))
      // pull again: converged, nothing written
      assert(Dev.pull(pullDir, client) == Right(0))
      // deploy from the pulled dir with a local deletion → remote delete
      Files.delete(pullDir.resolve("jobs/nightly.task.sql"))
      assert(Dev.deploy(pullDir, client).isRight)
      assert(!store.tasks.contains("apptask00000000000000001"))
      // move remotely (new folder path) → pull relocates the local file
      store.synchronized {
        val d = store.dashboards("appalpha0000000000000001")
        store.folders("fmove") = StateJournal.FolderMeta("fmove", "moved", None)
        store.dashboards(d.id) = d.copy(folderId = Some("fmove"),
          updatedAtMillis = System.currentTimeMillis() + 240000)
      }
      assert(Dev.pull(pullDir, client).exists(_ >= 1))
      assert(!Files.exists(pulledAlpha))
      assert(Files.exists(pullDir.resolve("moved/alpha.dashboard.sql")))
    } finally {
      api.stop()
      deleteTree(dir)
      deleteTree(pullDir)
    }
  }

  test("login: wrong password, credential mint, auth-file cache, already-logged-in") {
    import graft.auth.Passwords
    val store = new StateJournal.MetaStore()
    store.tokens.putUser(Tokens.UserRecord("u9", "dev@example.com", "Dev",
      Some(Passwords.hash("hunter2"))))
    val api = new HttpApi(spark, store, "lg-secret")
    val port = api.start()
    val tmp = Files.createTempDirectory("graft-dev-login")
    val authFile = tmp.resolve("sub").resolve(".graft-auth")
    val base = s"http://127.0.0.1:$port"
    try {
      assert(Dev.login(base, authFile, Some(("dev@example.com", "nope"))).isLeft)
      assert(!Files.exists(authFile))
      val r = Dev.login(base, authFile, Some(("dev@example.com", "hunter2")))
      assert(r.isRight, r)
      val tok = Dev.readAuthToken(authFile)
      assert(tok == r.toOption.filter(_.nonEmpty), s"auth file $tok vs $r")
      // reference file format: token + trailing newline, owner-only
      val raw = new String(Files.readAllBytes(authFile), UTF_8)
      assert(raw == tok.get + "\n")
      assert(java.nio.file.Files.getPosixFilePermissions(authFile).asScala ==
        Set(java.nio.file.attribute.PosixFilePermission.OWNER_READ,
          java.nio.file.attribute.PosixFilePermission.OWNER_WRITE))
      // second login short-circuits on the cached session
      val logs = scala.collection.mutable.Buffer.empty[String]
      assert(Dev.login(base, authFile, None, logs += _) == r)
      assert(logs.exists(_.contains("Already logged in")), logs)
      // and the cached session authenticates the other commands
      assert(new Dev.AppsClient(base, tok.get).fetchApps().isRight)
    } finally {
      api.stop()
      deleteTree(tmp)
    }
  }

  test("login callback handshake: UI posts the token back, single-use, saved to the auth file") {
    import graft.auth.Passwords
    val store = new StateJournal.MetaStore()
    store.tokens.putUser(Tokens.UserRecord("u9", "dev@example.com", "Dev",
      Some(Passwords.hash("hunter2"))))
    val api = new HttpApi(spark, store, "cb-secret")
    val port = api.start()
    val tmp = Files.createTempDirectory("graft-dev-cb")
    val authFile = tmp.resolve(".graft-auth")
    val base = s"http://127.0.0.1:$port"
    try {
      // a real session to hand back through the callback
      val session = Passwords.login(store.tokens,
        id => store.tokens.getUser(id).flatMap(_.passwordHash),
        email => store.tokens.userByEmail(email).map(_.id),
        "dev@example.com", "hunter2").toOption.get
      val logs = new java.util.concurrent.LinkedBlockingQueue[String]()
      import scala.concurrent.ExecutionContext.Implicits.global
      val fut = scala.concurrent.Future(
        Dev.login(base, authFile, None, logs.put, handshakeTimeoutMillis = 30000))
      // the login flow prints the callback port; play the UI's part
      val portRe = """callback listening on port (\d+)""".r
      var cbPort = 0
      val deadline = System.currentTimeMillis() + 15000
      while (cbPort == 0 && System.currentTimeMillis() < deadline)
        Option(logs.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS))
          .flatMap(portRe.findFirstMatchIn(_)).foreach(m => cbPort = m.group(1).toInt)
      assert(cbPort != 0, "callback port never printed")
      val http = HttpClient.newHttpClient()
      def post(body: String): HttpResponse[String] = http.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$cbPort/token"))
          .header("Origin", base).header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post("""{"token":""}""").statusCode() == 400) // blank refused
      val ok = post(s"""{"token":"$session"}""")
      assert(ok.statusCode() == 200 && ok.body().contains("ok"), ok.body())
      val r = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(30, "s"))
      assert(r == Right(session), r)
      assert(Dev.readAuthToken(authFile).contains(session))
      // single-use semantics, driven directly (the login flow above
      // closes its server on return, so a late post there just refuses)
      val cb = new Dev.TokenCallback("")
      try {
        def postCb(body: String): HttpResponse[String] = http.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${cb.port}/token"))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(postCb("""{"token":"one"}""").statusCode() == 200)
        assert(postCb("""{"token":"two"}""").statusCode() == 410)
        assert(cb.await(1000).contains("one"))
      } finally cb.close()
    } finally {
      api.stop()
      deleteTree(tmp)
    }
  }

  test("pull never overwrites un-synced local drafts: conflict surfaced, write skipped") {
    val store = new StateJournal.MetaStore()
    val (_, apiKey) = store.tokens.createApiKey("pc-key",
      Seq(Tokens.Permission.Deploy), Tokens.Actor(Tokens.ActorType.User, "u1"))
    val api = new HttpApi(spark, store, "pc-secret")
    val port = api.start()
    val dir = Files.createTempDirectory("graft-dev-conflict")
    val client = new Dev.AppsClient(s"http://127.0.0.1:$port", apiKey)
    try {
      store.dashboards("conflict0000000000000001") = StateJournal.DashboardMeta(
        "conflict0000000000000001", "alpha", "SELECT 'remote'::LABEL;",
        None, None, System.currentTimeMillis(), "u1")
      // same id locally, no sync stamp, diverged body: an un-deployed
      // local draft — pull must leave it alone and say so
      val draft = dir.resolve("alpha.dashboard.sql")
      Files.write(draft,
        "-- shaperid:conflict0000000000000001\n\nSELECT 'local-draft';".getBytes(UTF_8))
      val logs = scala.collection.mutable.Buffer.empty[String]
      val r = Dev.pull(dir, client, logs += _)
      assert(r.isRight, r)
      val body = new String(Files.readAllBytes(draft), UTF_8)
      assert(body.contains("local-draft") && !body.contains("remote"), body)
      assert(logs.exists(_.startsWith("CONFLICT")), logs)
      // identical body is NOT a conflict: pull just adds the sync stamp
      Files.write(draft,
        "-- shaperid:conflict0000000000000001\n\nSELECT 'remote'::LABEL;".getBytes(UTF_8))
      assert(Dev.pull(dir, client).exists(_ >= 1))
      val stamped = new String(Files.readAllBytes(draft), UTF_8)
      assert(stamped.contains("-- shapersync:") && stamped.contains("'remote'"), stamped)
    } finally {
      api.stop()
      deleteTree(dir)
    }
  }

  test("pull safety: traversal refusal, tasks-disabled survival, reused-name no self-delete") {
    val store = new StateJournal.MetaStore()
    val (_, apiKey) = store.tokens.createApiKey("ps-key",
      Seq(Tokens.Permission.Deploy), Tokens.Actor(Tokens.ActorType.User, "u1"))
    // tasks disabled: the listing hides tasks; pull must not read that
    // as "every task was deleted remotely"
    val api = new HttpApi(spark, store, "ps-secret",
      config = HttpApi.Config(tasksEnabled = false))
    val port = api.start()
    val dir = Files.createTempDirectory("graft-dev-safety")
    val client = new Dev.AppsClient(s"http://127.0.0.1:$port", apiKey)
    try {
      // a synced local task file + a synced local dashboard whose id no
      // longer exists remotely but whose NAME a new remote app reuses
      Files.write(dir.resolve("job.task.sql"),
        "-- shaperid:tasklocal000000000000001\n-- shapersync:2026-01-01T00:00:00Z\n\nSELECT 1;".getBytes(UTF_8))
      Files.write(dir.resolve("alpha.dashboard.sql"),
        "-- shaperid:deadapp00000000000000001\n-- shapersync:2026-01-01T00:00:00Z\n\nSELECT 'old';".getBytes(UTF_8))
      store.dashboards("newapp000000000000000001") = StateJournal.DashboardMeta(
        "newapp000000000000000001", "alpha", "SELECT 'new'::LABEL;",
        None, None, System.currentTimeMillis(), "u1")
      val r = Dev.pull(dir, client)
      assert(r.isRight, r)
      // task survived (tasks disabled ≠ deleted); dead dashboard's file
      // now carries the NEW app — it must not be deleted post-write
      assert(Files.exists(dir.resolve("job.task.sql")))
      val alpha = new String(Files.readAllBytes(dir.resolve("alpha.dashboard.sql")), UTF_8)
      assert(alpha.contains("newapp000000000000000001") && alpha.contains("'new'"), alpha)
      // converged on the second run
      assert(Dev.pull(dir, client) == Right(0))
      // a folder named '..' (injected past the API's validation, as a
      // malicious server could) must refuse, not write outside dir
      store.folders("evil") = StateJournal.FolderMeta("evil", "..", None)
      store.dashboards("evilapp00000000000000001") = StateJournal.DashboardMeta(
        "evilapp00000000000000001", "pwn", "SELECT 1;",
        Some("evil"), None, System.currentTimeMillis(), "u1")
      val evil = Dev.pull(dir, client)
      assert(evil.isLeft && evil.left.exists(_.contains("outside")), evil)
      assert(!Files.exists(dir.getParent.resolve("pwn.dashboard.sql")))
      // the API itself rejects such folder names outright
      val resp = java.net.http.HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/deploy"))
          .header("Authorization", s"Bearer $apiKey")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"apps":[{"operation":"create","type":"dashboard",
               "data":{"id":"x1","name":"n","path":"/../","content":"SELECT 1;"}}]}"""))
          .build(), HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 400 && resp.body().contains("invalid folder name"), resp.body())
    } finally {
      api.stop()
      deleteTree(dir)
    }
  }

  test("validate command: per-file server-side validation under a deploy key") {
    val store = new StateJournal.MetaStore()
    val (_, apiKey) = store.tokens.createApiKey("v-key",
      Seq(Tokens.Permission.Deploy), Tokens.Actor(Tokens.ActorType.User, "u1"))
    val api = new HttpApi(spark, store, "v-secret")
    val port = api.start()
    val dir = Files.createTempDirectory("graft-dev-validate")
    try {
      Files.write(dir.resolve("good.dashboard.sql"),
        "-- shaperid:goodapp00000000000000001\n\nSELECT 1 AS one;".getBytes(UTF_8))
      Files.write(dir.resolve("bad.dashboard.sql"),
        "-- shaperid:badapp000000000000000001\n\nSELECT * FROM table_that_is_missing;".getBytes(UTF_8))
      Files.write(dir.resolve("skip.task.sql"), "SELECT 1;".getBytes(UTF_8))
      val r = Dev.validate(dir, new Dev.AppsClient(s"http://127.0.0.1:$port", apiKey))
      assert(r.isRight, r)
      val bad = r.toOption.get
      assert(bad.map(_._1.getFileName.toString) == Seq("bad.dashboard.sql"))
      assert(bad.head._2.nonEmpty) // server's error message surfaced
    } finally {
      api.stop()
      deleteTree(dir)
    }
  }

  test("preview command: one file becomes a temporary dashboard, URL printed (preview.go:13-69)") {
    val store = new StateJournal.MetaStore()
    val secret = "preview-secret"
    // preview needs only the query-data permission — it never writes
    // a journaled dashboard (routes.go:187 + handler/dashboard.go:69)
    val (_, apiKey) = store.tokens.createApiKey("p-key",
      Seq(Tokens.Permission.QueryData), Tokens.Actor(Tokens.ActorType.User, "u1"))
    val api = new HttpApi(spark, store, secret)
    val port = api.start()
    val base = s"http://127.0.0.1:$port"
    val dir = Files.createTempDirectory("graft-dev-preview")
    try {
      val f = dir.resolve("my-board.dashboard.sql")
      Files.write(f, "SELECT 41 + 1 AS answer;".getBytes(UTF_8))
      // suffix guard mirrors the reference's first check
      assert(Dev.preview(dir.resolve("notes.txt"),
        new Dev.AppsClient(base, apiKey), base).isLeft)
      val logs = scala.collection.mutable.Buffer.empty[String]
      val r = Dev.preview(f, new Dev.AppsClient(base, apiKey), base, logs += _)
      assert(r.isRight, r)
      val url = r.toOption.get
      assert(url.startsWith(s"$base/dashboards/" + graft.api.HttpApi.TmpDashboardPrefix))
      assert(url.endsWith("?preview=true"))
      assert(logs.exists(_.startsWith("Preview created: ")))
      // the preview renders server-side and never touched the journal
      val id = url.stripPrefix(s"$base/dashboards/").stripSuffix("?preview=true")
      val userJwt = Auth.sign(Auth.Claims(None, Map.empty, isPublic = false,
        longLived = false, exp = System.currentTimeMillis() / 1000 + 900), secret)
      val b = HttpRequest.newBuilder(URI.create(s"$base/api/dashboards/$id"))
        .header("Authorization", s"Bearer $userJwt")
      val resp = HttpClient.newHttpClient()
        .send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200 && resp.body().contains("\"answer\""), resp.body())
      assert(store.dashboards.isEmpty)
      // name derives from the file name before the suffix
      assert(resp.body().contains("\"name\":\"my-board\""))
      // noOpen=false routes the preview URL through the opener
      // (preview.go:61-66); an opener failure is advisory — the URL
      // still comes back and the warning lands in the log
      var opened = ""
      val logs2 = scala.collection.mutable.Buffer.empty[String]
      val r2 = Dev.preview(f, new Dev.AppsClient(base, apiKey), base,
        logs2 += _, noOpen = false, opener = u => { opened = u; Right(Seq("stub", u)) })
      assert(r2.isRight && opened == r2.toOption.get)
      assert(logs2.exists(_.startsWith("Opening ")), logs2.mkString("|"))
      val r3 = Dev.preview(f, new Dev.AppsClient(base, apiKey), base,
        logs2 += _, noOpen = false, opener = _ => Left("no display"))
      assert(r3.isRight, r3)
      assert(logs2.exists(_.contains("Failed to open browser: no display")))
    } finally {
      api.stop()
      deleteTree(dir)
    }
  }

  test("openUrl: browser.go platform dispatch, arg padding quirk, advisory failure") {
    def record(url: String, os: String, kernel: String = "6.1.0") = {
      var got: Seq[String] = Nil
      val r = Dev.openUrl(url, os, kernel, cmd => got = cmd)
      assert(r == Right(got)); got
    }
    // multi-arg commands get "" inserted at args[1] (browser.go:34-37):
    // a URL opening with a quote must not become the start window title
    assert(record("http://x/d?p=1", "Windows 11") ==
      Seq("rundll32", "url.dll,FileProtocolHandler", "", "http://x/d?p=1"))
    assert(record("http://x", "Mac OS X") == Seq("open", "http://x"))
    assert(record("http://x", "Linux", kernel = "5.15.0-microsoft-standard-WSL2") ==
      Seq("cmd.exe", "/c", "", "start", "http://x"))
    assert(record("http://x", "Linux") == Seq("xdg-open", "http://x"))
    // launch failure is advisory: Left with the cause, never a throw
    val failed = Dev.openUrl("http://x", "Linux", "6.1.0",
      _ => throw new java.io.IOException("no xdg-open"))
    assert(failed.isLeft && failed.left.exists(_.contains("no xdg-open")))
  }

  test("live reload: real websocket handshake, reload broadcast, empty-channel signal") {
    val logs = new java.util.concurrent.LinkedBlockingQueue[String]()
    val lr = new LiveReload(logs.put)
    try {
      // nobody listening: notify signals "open a browser" (watch.go:416-423)
      assert(!lr.notify("dash1"))
      // two real JDK websocket clients on dash1, one on dash2
      val received = new java.util.concurrent.LinkedBlockingQueue[String]()
      def connect(id: String): java.net.http.WebSocket = {
        val listener = new java.net.http.WebSocket.Listener {
          override def onText(ws: java.net.http.WebSocket, data: CharSequence,
              last: Boolean): java.util.concurrent.CompletionStage[_] = {
            received.put(data.toString); ws.request(1); null
          }
        }
        HttpClient.newHttpClient().newWebSocketBuilder()
          .buildAsync(URI.create(s"ws://127.0.0.1:${lr.port}/ws?dashboardId=$id"),
            listener).join()
      }
      val c1 = connect("dash1"); val c2 = connect("dash1"); val c3 = connect("dash2")
      val deadline = System.currentTimeMillis() + 5000
      while (lr.connections("dash1") < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(lr.connections("dash1") == 2 && lr.connections("dash2") == 1)
      // broadcast goes to dash1's two connections only, exact payload
      assert(lr.notify("dash1"))
      val m1 = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      val m2 = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(Seq(m1, m2).forall(_ == """{"type":"reload","dashboardId":"dash1"}"""))
      assert(received.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null,
        "dash2 must not receive dash1's reload")
      // client close cleans its registration; the channel empties
      c1.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
      c2.sendClose(java.net.http.WebSocket.NORMAL_CLOSURE, "done").join()
      val d2 = System.currentTimeMillis() + 5000
      while (lr.connections("dash1") > 0 && System.currentTimeMillis() < d2)
        Thread.sleep(20)
      assert(lr.connections("dash1") == 0 && !lr.notify("dash1"))
      assert(lr.notify("dash2"))
      c3.abort()
      // a plain-HTTP request without the upgrade gets a 400, and a
      // missing dashboardId is rejected like watch.go:353-356
      val http = HttpClient.newHttpClient()
      val r = http.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${lr.port}/ws")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 400 && r.body().contains("dashboardId"))
    } finally lr.close()
  }

  test("canonicalBody makes leading-blank content converge") {
    // "\nselect 1" can't round-trip prepend/strip (reference-shared
    // asymmetry) — canonical comparison must treat the forms as equal
    assert(Dev.canonicalBody("\nselect 1") == Dev.canonicalBody("select 1"))
    assert(Dev.canonicalBody("select 1\n\nselect 2")
      == "select 1\n\nselect 2") // interior blanks preserved
  }

  private def deleteTree(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(f =>
      try Files.deleteIfExists(f) catch { case _: Exception => () })
  }
}
