package graft

import graft.ingest.SchemaInfer
import graft.state.StateJournal
import graft.state.StateJournal.{MetaStore, StateApp}
import org.scalatest.funsuite.AnyFunSuite

/** Event-sourced state journal (op #44, state.go:29-163): idempotent
  * handlers, journal-first writes, checkpointed replay on boot. */
class StateSpec extends AnyFunSuite {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-state").toString

  test("submit applies and journals; handlers are idempotent (apply twice = same state)") {
    val app = new StateApp(freshDir())
    assert(app.submit("create_dashboard",
      """{"id": "d1", "name": "Sales", "content": "SELECT 1;", "timestamp": "2026-01-01T00:00:00Z", "createdBy": "user:u1"}"""))
    assert(app.submit("create_dashboard",
      """{"id": "d1", "name": "OTHER", "content": "SELECT 2;"}""")) // republish: ignored
    assert(app.store.dashboards("d1").name == "Sales")
    assert(app.submit("update_dashboard_content",
      """{"id": "d1", "content": "SELECT 42;"}"""))
    assert(app.store.dashboards("d1").content == "SELECT 42;")
    assert(app.store.dashboards.size == 1)
  }

  test("boot rebuilds a fresh store by replaying the FULL journal (restart)") {
    val dir = freshDir()
    val a = new StateApp(dir)
    a.submit("create_dashboard", """{"id": "d1", "name": "A", "content": "SELECT 1;"}""")
    a.submit("create_task", """{"id": "t1", "name": "T", "content": "SELECT 'init'::SCHEDULE;"}""")
    a.submit("update_dashboard_name", """{"id": "d1", "name": "B"}""")
    a.submit("delete_task", """{"id": "t1"}""")

    // restart: fresh in-memory store, same journal — the advanced
    // checkpoint must NOT suppress the replay (the state the cursor
    // refers to died with the old process)
    val b = new StateApp(dir)
    assert(b.boot() == 4)
    assert(b.store.dashboards("d1").name == "B")
    assert(b.store.tasks.isEmpty)
  }

  test("boot replay is idempotent over an already-warm store") {
    val dir = freshDir()
    val a = new StateApp(dir)
    a.submit("create_folder", """{"id": "f1", "name": "Ops"}""")
    a.submit("create_dashboard", """{"id": "d1", "name": "A", "content": "x"}""")
    // booting the SAME app again re-applies everything onto the warm
    // store; INSERT OR IGNORE / last-write handlers converge
    assert(a.boot() == 2)
    assert(a.store.folders.size == 1 && a.store.dashboards.size == 1)
    assert(a.store.dashboards("d1").name == "A")
  }

  test("concurrent checkpoints from two apps never throw and leave a parseable cursor") {
    // the two-JVM convergence drill caught this: a writer's submit and
    // a peer's tail poll checkpoint the same consumer concurrently, and
    // a SHARED temp-file name let one process rename the other's temp
    // away mid-flight (FileNotFoundException). Hammer the same shape
    // in-process: two apps, interleaved submits and polls.
    val dir = freshDir()
    val a = new StateApp(dir)
    val b = new StateApp(dir)
    b.boot()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try (1 to 100).foreach(i => a.submit("create_folder", s"""{"id": "cf$i", "name": "F$i"}"""))
      catch { case e: Throwable => errs.add(e); () })
    val t2 = new Thread(() =>
      try (1 to 300).foreach(_ => b.pollOnce())
      catch { case e: Throwable => errs.add(e); () })
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(errs.isEmpty, s"concurrent checkpointing threw: ${errs.peek()}")
    b.pollOnce()
    assert(b.store.folders.size == 100)
  }

  test("pollOnce: peer appends converge live; local submits don't re-trigger") {
    val dir = freshDir()
    val a = new StateApp(dir)
    val b = new StateApp(dir)
    b.boot()
    // idle poll: one listing, no change
    assert(b.pollOnce() == 0)
    // a local submit must NOT make b's own poll see itself as a peer
    assert(b.submit("create_folder", """{"id": "f0", "name": "Mine"}"""))
    assert(b.pollOnce() == 0)
    // peer appends: the next poll observes and applies them
    a.boot()
    a.submit("create_dashboard", """{"id": "dp1", "name": "Peer", "content": "SELECT 1;"}""")
    a.submit("update_dashboard_name", """{"id": "dp1", "name": "Peer2"}""")
    assert(b.pollOnce() == 2)
    assert(b.store.dashboards("dp1").name == "Peer2")
    assert(b.pollOnce() == 0) // converged
    // and the peer sees b's earlier folder on ITS next poll
    assert(a.pollOnce() > 0 || a.store.folders.contains("f0"))
    assert(a.store.folders("f0").name == "Mine")
  }

  test("pollOnce detects a stalled writer's append landing BELOW the observed head") {
    val dir = freshDir()
    val a = new StateApp(dir)
    a.submit("create_dashboard", """{"id": "d1", "name": "A", "content": "x"}""") // seq 1
    val b = new StateApp(dir)
    b.boot()
    // a "stalled writer" claimed seq 2 long ago and lands it only now,
    // AFTER b observes seq 3 — max seq alone would miss it; the event
    // count in headState must catch it
    a.submit("create_dashboard", """{"id": "d3", "name": "C", "content": "x"}""") // seq 2
    assert(b.pollOnce() == 1)
    val events = new java.io.File(dir, "events")
    // relabel: simulate the stall by moving seq 2's file away and back
    val f2 = events.listFiles().find(_.getName.startsWith("000000000002")).get
    val hidden = new java.io.File(dir, f2.getName)
    assert(f2.renameTo(hidden))
    val c = new StateApp(dir)
    c.boot() // c observes only seq 1 — head (1, 1)
    assert(c.pollOnce() == 0)
    assert(hidden.renameTo(f2)) // the stalled append lands: head (2, 2)
    assert(c.pollOnce() == 1)
    assert(c.store.dashboards.contains("d3"))
    // now the subtler case: seq 2 hidden while seq 3 exists — count
    // changes, max does not
    val d = new StateApp(dir)
    assert(f2.renameTo(hidden))
    a.pollOnce() // resync a after the rename games
    a.submit("create_dashboard", """{"id": "d4", "name": "D", "content": "x"}""") // seq 3
    d.boot() // d observes seqs {1, 3}: head (3, 2)
    assert(d.pollOnce() == 0)
    assert(hidden.renameTo(f2)) // stalled seq 2 lands below head: (3, 3)
    assert(d.pollOnce() == 1)
    assert(d.store.dashboards.contains("d3"))
  }

  test("move_items re-parents apps and folders (folder.go:397-404)") {
    val app = new StateApp(freshDir())
    app.submit("create_folder", """{"id": "f1", "name": "Ops"}""")
    app.submit("create_folder", """{"id": "f2", "name": "Sub"}""")
    app.submit("create_dashboard", """{"id": "d1", "name": "A", "content": "x"}""")
    app.submit("move_items", """{"apps": ["d1"], "folders": ["f2"], "toFolderId": "f1"}""")
    assert(app.store.dashboards("d1").folderId.contains("f1"))
    assert(app.store.folders("f2").parentId.contains("f1"))
    app.submit("rename_folder", """{"id": "f1", "name": "Ops2"}""")
    assert(app.store.folders("f1").name == "Ops2")
  }

  test("api key and session events route into the auth store") {
    val app = new StateApp(freshDir())
    app.submit("create_user", """{"id": "u1", "email": "a@b.c", "name": "Alice"}""")
    app.submit("create_api_key",
      """{"id": "k1", "name": "ci", "hash": "h", "salt": "s", "permissions": ["jwt", "data:query"], "timestamp": "2026-01-01T00:00:00Z", "createdBy": "user:u1"}""")
    assert(app.store.tokens.getApiKey("k1").get.permissions.contains(Seq("jwt", "data:query")))
    app.submit("update_api_key_permissions", """{"id": "k1", "permissions": ["metrics"]}""")
    assert(app.store.tokens.getApiKey("k1").get.permissions.contains(Seq("metrics")))
    app.submit("delete_api_key", """{"id": "k1"}""")
    assert(app.store.tokens.getApiKey("k1").isEmpty)
  }

  test("password hashing: salted, self-describing, constant-time verify (users.go:63 contract)") {
    import graft.auth.Passwords
    val rnd = new java.security.SecureRandom(Array[Byte](42))
    val h1 = Passwords.hash("s3cret", rnd, cost = 4)
    val h2 = Passwords.hash("s3cret", rnd, cost = 4)
    assert(h1 != h2) // per-hash salt
    assert(h1.startsWith("$2b$04$") && h1.length == 60)
    assert(Passwords.verify("s3cret", h1) && Passwords.verify("s3cret", h2))
    assert(!Passwords.verify("wrong", h1))
    assert(!Passwords.verify("s3cret", "garbage"))
    assert(!Passwords.verify("s3cret", "bcrypt$unsupported$x"))
    // hashes minted before the bcrypt port still verify
    val legacy = "pbkdf2-sha256$1000$" +
      java.util.Base64.getEncoder.encodeToString(Array.fill[Byte](16)(1)) + "$" + {
        val spec = new javax.crypto.spec.PBEKeySpec(
          "s3cret".toCharArray, Array.fill[Byte](16)(1), 1000, 256)
        java.util.Base64.getEncoder.encodeToString(
          javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
            .generateSecret(spec).getEncoded)
      }
    assert(Passwords.verify("s3cret", legacy) && !Passwords.verify("wrong", legacy))
  }

  test("login: email folding, wrong password, session mint (auth.go:215-237)") {
    import graft.auth.{Passwords, Tokens}
    val store = new Tokens.TokenStore(random = new java.util.Random(7))
    store.putUser(Tokens.UserRecord("u1", "a@b.c", "Alice"))
    val hash = Passwords.hash("pw-1", cost = 4)
    val emails = Map("a@b.c" -> "u1")
    val hashes = Map("u1" -> hash)
    val ok = Passwords.login(store, hashes.get, emails.get, "  A@B.C ", "pw-1")
    assert(ok.isRight)
    assert(store.validToken(ok.toOption.get).isUser)
    assert(Passwords.login(store, hashes.get, emails.get, "a@b.c", "nope") ==
      Left("invalid password"))
    assert(Passwords.login(store, hashes.get, emails.get, "x@y.z", "pw-1").isLeft)
  }

  test("dashboard passwords + public auth decision (edit_dashboard.go:242-280, handler/auth.go:234-300)") {
    import graft.auth.{Auth, Passwords}
    val app = new StateApp(freshDir())
    app.submit("create_dashboard", """{"id": "d1", "name": "A", "content": "x"}""")
    // private (no visibility) → not found
    assert(app.store.publicAuth("d1", None, "sec") == Left("not found"))
    app.submit("update_dashboard_visibility", """{"id": "d1", "visibility": "public"}""")
    val tok = app.store.publicAuth("d1", None, "sec", nowSeconds = 1000).toOption.get
    assert(Auth.verify(tok, "sec", 1000).toOption.get.publicVisibility.contains("public"))
    // password-protected: requires a verified password
    val h = Passwords.hash("letmein", cost = 4)
    app.submit("update_dashboard_visibility", """{"id": "d1", "visibility": "password-protected"}""")
    app.submit("update_dashboard_password", s"""{"id": "d1", "passwordHash": "$h"}""")
    assert(app.store.publicAuth("d1", None, "sec") == Left("Password required"))
    assert(app.store.publicAuth("d1", Some("wrong"), "sec") == Left("Invalid password"))
    val tok2 = app.store.publicAuth("d1", Some("letmein"), "sec", nowSeconds = 1000).toOption.get
    assert(Auth.verify(tok2, "sec", 1000).toOption.get.publicVisibility.contains("password-protected"))
    // sharing kill switches
    assert(app.store.publicAuth("d1", Some("letmein"), "sec", noPasswordSharing = true) == Left("not found"))
    app.submit("update_dashboard_visibility", """{"id": "d1", "visibility": "public"}""")
    assert(app.store.publicAuth("d1", None, "sec", noPublicSharing = true) == Left("not found"))
  }

  test("invite lifecycle: create, claim (validations, user mint, burn), delete (users.go:479-700)") {
    import graft.auth.Passwords
    val app = new StateApp(freshDir())
    var now = 1000L
    app.submit("create_invite",
      """{"code": "inv-1", "email": "new@x.y", "timestamp": 500, "createdBy": "user:u0"}""")
    assert(app.store.invites.contains("inv-1"))
    // republish ignored (INSERT OR IGNORE)
    app.submit("create_invite", """{"code": "inv-1", "email": "OTHER@x.y"}""")
    assert(app.store.invites("inv-1").email == "new@x.y")
    assert(StateJournal.claimInvite(app.store, app.submit, "nope", "N", "pw",
      nowMillis = () => now) == Left("invalid invite code"))
    // expiry
    assert(StateJournal.claimInvite(app.store, app.submit, "inv-1", "N", "pw",
      inviteExpMillis = 100, nowMillis = () => now) == Left("invite has expired"))
    // happy path: user exists with working password, invite burned
    val userId = StateJournal.claimInvite(app.store, app.submit, "inv-1", "Newbie",
      "pw-9", nowMillis = () => now).toOption.get
    assert(app.store.invites.isEmpty)
    val u = app.store.tokens.getUser(userId).get
    assert(u.email == "new@x.y" && u.name == "Newbie")
    assert(Passwords.verify("pw-9", u.passwordHash.get))
    // duplicate email rejected on a fresh invite
    app.submit("create_invite", """{"code": "inv-2", "email": "new@x.y", "timestamp": 900}""")
    assert(StateJournal.claimInvite(app.store, app.submit, "inv-2", "Dup", "pw",
      nowMillis = () => now) == Left("email is already registered"))
    app.submit("delete_invite", """{"code": "inv-2"}""")
    assert(app.store.invites.isEmpty)
  }

  test("password update invalidates other sessions, keeps the excluded one (users_test.go:15-107)") {
    import graft.auth.Passwords
    val app = new StateApp(freshDir())
    val oldHash = Passwords.hash("old-password", cost = 4)
    app.submit("create_user",
      s"""{"id": "user-1", "email": "test@example.com", "name": "Test User", "passwordHash": "$oldHash"}""")
    val tokens = app.store.tokens
    val keepToken = tokens.createSessionForUser("user-1")
    val dropToken = tokens.createSessionForUser("user-1")
    assert(tokens.sessionCountForUser("user-1") == 2)
    val keepId = keepToken.stripPrefix("shapersession.").split("\\.")(0)
    // command side: wrong current password rejected
    assert(Passwords.updateUserPassword(tokens, app.submit, "user-1",
      "WRONG", "new-password", keepId) == Left("invalid current password"))
    // correct current password: hash rotates, other session dies
    assert(Passwords.updateUserPassword(tokens, app.submit, "user-1",
      "old-password", "new-password", keepId).isRight)
    assert(Passwords.verify("new-password", tokens.getUser("user-1").get.passwordHash.get))
    assert(tokens.sessionCountForUser("user-1") == 1)
    assert(tokens.validateSessionToken(keepToken))
    assert(!tokens.validateSessionToken(dropToken))
  }

  test("user rename and soft delete (users_test.go:109-160, users.go:402-440)") {
    val app = new StateApp(freshDir())
    app.submit("create_user", """{"id": "u1", "email": "a@b.c", "name": "Old Name"}""")
    app.submit("update_user_name", """{"id": "u1", "name": "New Name"}""")
    assert(app.store.tokens.getUser("u1").get.name == "New Name")
    val token = app.store.tokens.createSessionForUser("u1")
    assert(app.store.tokens.validToken(token).valid)
    app.submit("delete_user", """{"id": "u1", "timestamp": "2026-01-02T00:00:00Z"}""")
    // sessions hard-deleted; user soft-deleted: row remains, auth dead
    assert(app.store.tokens.sessionCountForUser("u1") == 0)
    assert(!app.store.tokens.validToken(token).valid)
    assert(app.store.tokens.getUser("u1").exists(_.deletedAtMillis.isDefined))
    assert(app.store.tokens.userByEmail("a@b.c").isEmpty)
  }

  test("task run results flow through their own journal consumer and survive restart") {
    val dir = freshDir()
    val log = new StateJournal.TaskRunLog(dir)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val queue = new graft.tasks.TaskWorkQueue
    val node = new graft.tasks.TaskNode("n1", spark, queue, runLog = Some(log))
    val r = node.fire("t1", "SELECT 1 AS x;", 1000L, "single")
    assert(r.isDefined)
    assert(log.lastRun("t1").exists(_.success))
    // a losing node publishes nothing
    val node2 = new graft.tasks.TaskNode("n2", spark, queue, runLog = Some(log))
    assert(node2.fire("t1", "SELECT 1 AS x;", 1000L, "single").isEmpty)
    // restart: a fresh log over the same journal replays the FULL
    // history — the runs map is in-memory, so resuming from the old
    // cursor would silently start empty
    val log2 = new StateJournal.TaskRunLog(dir)
    assert(log2.boot() == 1)
    assert(log2.lastRun("t1").exists(m => m.success && m.nextRunType == "single"))
  }

  test("MetaStore survives concurrent writers and full-scan readers") {
    // regression guard for the round-4 synchronization: apply() and the
    // listing-style scans (folderSegments + values walks) take the same
    // monitor, so hammering both concurrently must neither throw
    // (ConcurrentModificationException) nor corrupt the maps
    val store = new StateJournal.MetaStore()
    val m = graft.render.Model
    val errors = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def run(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body catch { case e: Throwable => errors.compareAndSet(null, e); () })
      t.start(); t
    }
    val writers = (0 until 4).map { w =>
      run {
        (0 until 300).foreach { i =>
          val id = s"cc-$w-$i"
          store.apply("create_dashboard", SchemaInfer.parseOrdered(
            s"""{"id":${m.jsonValue(id)},"name":"N","content":"","timestamp":${1000 + i}}"""))
          store.apply("create_folder", SchemaInfer.parseOrdered(
            s"""{"id":${m.jsonValue("f" + id)},"name":${m.jsonValue("f" + i)}}"""))
          if (i % 3 == 0)
            store.apply("delete_dashboard",
              SchemaInfer.parseOrdered(s"""{"id":${m.jsonValue(id)}}"""))
        }
      }
    }
    val readers = (0 until 4).map { _ =>
      run {
        (0 until 300).foreach { _ =>
          val snapshot = store.synchronized {
            store.dashboards.values.map(d =>
              (d.id, store.folderSegments(d.folderId))).toVector
          }
          assert(snapshot.forall(_._1.nonEmpty))
          store.folderSegments(Some("missing")) // point walk off-monitor
        }
      }
    }
    (writers ++ readers).foreach(_.join(30000))
    assert(errors.get() == null, s"concurrent access failed: ${errors.get()}")
    // 4 writers x 300 creates, every 3rd deleted
    assert(store.dashboards.size == 4 * 200, store.dashboards.size)
    assert(store.folders.size == 4 * 300)
  }

  test("unknown event is not acked (state.go:37-40)") {
    val app = new StateApp(freshDir())
    assert(!app.submit("explode_everything", """{"id": "x"}"""))
    // the event is journaled (journal-first) but the checkpoint did not advance
    assert(app.journal.lastSeq() == 1)
    assert(app.journal.consumerSeq(StateJournal.ConsumerName) == 0)
  }
}
