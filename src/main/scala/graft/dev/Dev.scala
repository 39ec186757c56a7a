package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileVisitResult, Files, Path, Paths, SimpleFileVisitor, StandardWatchEventKinds, WatchEvent, WatchKey, WatchService}
import java.nio.file.attribute.BasicFileAttributes

import graft.render.Model

/** `graft.Dev` — the reference's `shaper dev` watch workflow (ref:
  * server/dev/dev.go:10-67, watch.go:70-260, deploy.go): watch a
  * directory for `*.dashboard.sql` / `*.task.sql` files, stamp each
  * with a stable `-- shaperid:` identity comment, and push changes to
  * a running server so saving a file IS deploying it. The reference
  * pairs this with a websocket live-reload channel into its React UI
  * (watch.go:321-443) — UI surface, out of scope here; the engine-side
  * analog is the deploy push itself, observable through `/api/apps`.
  *
  * Pushes go through the batch deploy route (`POST /api/deploy`,
  * HttpApi.handleDeploy) with the file's stamped id, so create vs
  * update is keyed by identity, not by name — renaming a file keeps
  * the same dashboard, exactly like the reference's id-comment scheme.
  */
object Dev {

  val DashboardSuffix = ".dashboard.sql"
  val TaskSuffix = ".task.sql"
  // on-disk metadata prefixes kept byte-identical to the reference
  // (watch.go:26-29) so a directory of dashboard files is portable
  // between the two engines
  private val IdPrefix = "-- shaperid:"
  private val SyncPrefix = "-- shapersync:"

  /** Leading-comment metadata of an app file (watch.go:444-473):
    * scanned only until the first non-empty, non-metadata line; an id
    * containing spaces/tabs/CR (e.g. trailing whitespace) is invalid. */
  final case class AppMeta(id: Option[String], sync: Option[String])

  def extractAppMeta(content: String): AppMeta = {
    var id: Option[String] = None
    var sync: Option[String] = None
    val lines = content.split("\n", -1)
    var i = 0
    var done = false
    while (i < lines.length && !done) {
      val line = lines(i)
      if (line.startsWith(IdPrefix)) {
        val v = line.substring(IdPrefix.length)
        if (v.nonEmpty && !v.exists(c => c == ' ' || c == '\t' || c == '\r'))
          id = Some(v)
      } else if (line.startsWith(SyncPrefix)) {
        val t = line.substring(SyncPrefix.length).trim
        if (scala.util.Try(java.time.OffsetDateTime.parse(t)).isSuccess)
          sync = Some(t)
      } else if (line.trim.nonEmpty) done = true
      i += 1
    }
    AppMeta(id, sync)
  }

  /** watch.go:479-501: id line, optional sync line, then the content —
    * inserting a blank separator line unless one is already there. */
  def prependAppMeta(id: String, sync: Option[String], content: String): String = {
    val sb = new StringBuilder
    sb.append(IdPrefix).append(id).append('\n')
    sync.foreach(s => sb.append(SyncPrefix).append(s).append('\n'))
    if (content.nonEmpty) {
      if (content.head != '\n' && content.head != '\r') sb.append('\n')
      sb.append(content)
    } else sb.append('\n')
    sb.toString
  }

  /** cuid2-shaped id (lowercase letter + 23 alnum), the same shape
    * Tokens.newId mints server-side — ids embed in SQL comments and
    * URLs, so the alphabet stays conservative. */
  def genId(): String = {
    val random = new java.security.SecureRandom()
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    val sb = new StringBuilder
    sb.append(letters.charAt(random.nextInt(letters.length)))
    (0 until 23).foreach(_ => sb.append(alnum.charAt(random.nextInt(alnum.length))))
    sb.toString
  }

  /** Read the file, stamp a fresh id if it has none (blank files are
    * left alone); returns (content, updated, id) like
    * ensureShaperIDForFile (watch.go:502-528). */
  def ensureIdForFile(path: Path, newId: () => String = () => genId()): (String, Boolean, String) = {
    val content = new String(Files.readAllBytes(path), UTF_8)
    val meta = extractAppMeta(content)
    if (meta.id.nonEmpty || content.trim.isEmpty)
      (content, false, meta.id.getOrElse(""))
    else {
      val id = newId()
      val updated = prependAppMeta(id, meta.sync, content)
      Files.write(path, updated.getBytes(UTF_8))
      (updated, true, id)
    }
  }

  /** Walk the tree stamping ids; returns how many app files were seen
    * (watch.go:530-571). Non-app `.sql` files get the same warning. */
  def ensureIdsForDir(dir: Path, log: String => Unit = _ => ()): Int = {
    var count = 0
    Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
      override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
        val name = p.getFileName.toString
        if (name.endsWith(DashboardSuffix) || name.endsWith(TaskSuffix)) {
          count += 1
          val (_, updated, id) = ensureIdForFile(p)
          if (updated) log(s"Set id '$id' for file '$p'")
        } else if (name.endsWith(".sql"))
          log(s"WARNING: $p ends with .sql but not with $DashboardSuffix or $TaskSuffix; ignoring")
        FileVisitResult.CONTINUE
      }
    })
    count
  }

  /** Where watched changes go. Separated from the watcher so tests can
    * observe pushes directly and the CLI can swap transports. */
  trait AppPusher {
    /** Create-or-update `id`; Right(status) on success. */
    def push(tpe: String, id: String, name: String, folderPath: String,
        content: String): Either[String, String]
  }

  /** HTTP client of `POST /api/deploy` (the server side HttpApi already
    * gates): update-first keyed on the stamped id, falling back to
    * create when the server has never seen it — the watch.go:225-250
    * expired-dashboard recreate path, folded into deploy semantics.
    * One transport: delegates to [[AppsClient.deployBatch]]. */
  final class HttpPusher(baseUrl: String, token: String) extends AppPusher {
    private val client = new AppsClient(baseUrl, token)

    def push(tpe: String, id: String, name: String, folderPath: String,
        content: String): Either[String, String] = {
      val data = Seq("id" -> id, "name" -> name, "path" -> folderPath,
        "content" -> content)
      client.deployBatch(Seq(("update", tpe, data))) match {
        case Right(_) => Right("updated")
        case Left(err) if err.contains("not found") =>
          client.deployBatch(Seq(("create", tpe, data)))
            .map(_ => "created")
            .left.map(e => s"create failed: $e")
        case Left(err) => Left(s"update failed: $err")
      }
    }
  }

  /** Recursive directory watcher (watch.go:70-197): stamps ids on
    * start, then pushes every dashboard save; task files only get their
    * id stamped, matching the reference ("for tasks, we just ensure the
    * ID... do not preview", watch.go:215-218). One global 500 ms
    * throttle window absorbs editor double-writes and branch switches
    * (watch.go:152-177) — including the MODIFY event our own id-stamp
    * write triggers. Divergence from the reference, deliberate: where
    * watch.go DROPS events inside the window (a second file saved
    * within 500 ms is never deployed until touched again), throttled
    * events here are parked and flushed when the window closes, so a
    * save-all or branch switch converges instead of losing files. */
  final class Watcher(watchDir: Path, pusher: AppPusher,
      throttleMillis: Long = 500, log: String => Unit = _ => (),
      onDeployed: String => Unit = _ => ()) extends AutoCloseable {
    private val root = watchDir.toAbsolutePath.normalize
    private val ws: WatchService = root.getFileSystem.newWatchService()
    private val keys = scala.collection.mutable.Map.empty[WatchKey, Path]
    private var lastEventMillis = 0L
    private val pending = scala.collection.mutable.LinkedHashSet.empty[Path]
    private val flusher = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-dev-flush"); t.setDaemon(true); t
    })
    @volatile private var running = true
    private var thread: Thread = _

    private def register(dir: Path): Unit = {
      Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
        override def preVisitDirectory(d: Path, attrs: BasicFileAttributes): FileVisitResult = {
          val k = d.register(ws, StandardWatchEventKinds.ENTRY_CREATE,
            StandardWatchEventKinds.ENTRY_MODIFY)
          keys.synchronized { keys(k) = d }
          FileVisitResult.CONTINUE
        }
      })
    }

    def start(): Int = {
      val n = ensureIdsForDir(root, log)
      register(root)
      thread = new Thread(() => loop(), "graft-dev-watch")
      thread.setDaemon(true)
      thread.start()
      n
    }

    private def loop(): Unit = {
      while (running) {
        val key = try ws.take() catch { case _: Exception => return }
        val dir = keys.synchronized { keys.get(key) }
        key.pollEvents().forEach { ev =>
          (dir, ev.context()) match {
            case (Some(d), rel: Path) if ev.kind() != StandardWatchEventKinds.OVERFLOW =>
              val p = d.resolve(rel)
              if (Files.isDirectory(p)) {
                // new subdirectory: watch it AND process the app files
                // already inside — a moved-in folder (git checkout, mv)
                // arrives as one directory CREATE with no per-file
                // events, so registration alone would silently skip its
                // dashboards
                try {
                  register(p)
                  Files.walkFileTree(p, new SimpleFileVisitor[Path] {
                    override def visitFile(f: Path, attrs: BasicFileAttributes): FileVisitResult = {
                      // same serialization rule as throttled(): all
                      // handleAppFile runs happen on the flusher thread
                      flusher.execute(new Runnable { def run(): Unit = handleAppFile(f) })
                      FileVisitResult.CONTINUE
                    }
                  })
                } catch { case _: Exception => () }
              } else throttled(p)
            case _ => ()
          }
        }
        if (!key.reset()) keys.synchronized { keys.remove(key) }
      }
    }

    private def throttled(p: Path): Unit = {
      val now = System.currentTimeMillis()
      val runNow = synchronized {
        if (lastEventMillis != 0 && now - lastEventMillis < throttleMillis) {
          pending += p // park, don't drop — flushed after the window
          false
        } else { lastEventMillis = now; true }
      }
      // direct runs go through the same single-thread flusher executor
      // as parked flushes: handleAppFile does a read-modify-write id
      // stamp, and two threads racing it on a not-yet-stamped file
      // would mint two ids and push a duplicate dashboard
      if (runNow) flusher.execute(new Runnable { def run(): Unit = handleAppFile(p) })
      else flusher.schedule(new Runnable { def run(): Unit = flushPending() },
        throttleMillis + 10, java.util.concurrent.TimeUnit.MILLISECONDS)
    }

    private def flushPending(): Unit = {
      val (parked, retryIn) = synchronized {
        if (pending.isEmpty) (Nil: List[Path], -1L)
        else {
          val elapsed = System.currentTimeMillis() - lastEventMillis
          if (elapsed < throttleMillis) {
            // window refreshed since this flush was scheduled (possibly
            // by a direct-run event that schedules no flush of its own)
            // — retry after the remaining window instead of stranding
            // the parked files
            (Nil: List[Path], throttleMillis - elapsed + 10)
          } else {
            val s = pending.toList
            pending.clear()
            lastEventMillis = System.currentTimeMillis()
            (s, -1L)
          }
        }
      }
      if (retryIn > 0 && running)
        flusher.schedule(new Runnable { def run(): Unit = flushPending() },
          retryIn, java.util.concurrent.TimeUnit.MILLISECONDS)
      parked.foreach(handleAppFile)
    }

    /** Visible for tests: the full per-file pipeline, minus the
      * throttle. */
    private[graft] def handleAppFile(p: Path): Unit = {
      val fileName = p.getFileName.toString
      val isDashboard = fileName.endsWith(DashboardSuffix)
      val isTask = fileName.endsWith(TaskSuffix)
      if (!isDashboard && !isTask) {
        if (fileName.endsWith(".sql"))
          log(s"WARNING: $p ends with .sql but not with $DashboardSuffix or $TaskSuffix; ignoring")
        return
      }
      if (!Files.exists(p)) return
      val suffix = if (isTask) TaskSuffix else DashboardSuffix
      val name = fileName.stripSuffix(suffix)
      // folder path relative to the watch root, in the '/a/b/' form the
      // deploy route's ensureFolderPath consumes (root files → "/")
      val relDir = root.relativize(p.toAbsolutePath.normalize.getParent)
      val fPath = "/" + Option(relDir.toString).filter(_.nonEmpty)
        .map(_.replace(java.io.File.separatorChar, '/') + "/").getOrElse("")
      val (content, updated, id) = try ensureIdForFile(p) catch {
        case e: Exception => log(s"ERROR: failed ensuring id for '$p': ${e.getMessage}"); return
      }
      if (updated) log(s"Set id '$id' for file '$p'")
      if (isTask) return // id stamped; tasks deploy via `graft deploy`, not on save
      if (id.isEmpty) return // blank file — nothing to deploy yet
      // push the metadata-STRIPPED body: the server never stores the id
      // comment (deploy.go strips it the same way), and deploy/pull
      // compare stripped local against raw remote — an unstripped watch
      // push would make every dashboard look permanently divergent
      pusher.push("dashboard", id, name, fPath, stripAppMeta(content)) match {
        case Right(status) =>
          log(s"${status.capitalize} $fPath$name$DashboardSuffix")
          // live-reload hook (watch.go:260-290): the CLI notifies the
          // websocket channel and opens a browser when nobody listens
          onDeployed(id)
        case Left(err) => log(s"ERROR: failed pushing '$p': $err")
      }
    }

    override def close(): Unit = {
      running = false
      flusher.shutdownNow()
      try ws.close() catch { case _: Exception => () }
      if (thread != null) thread.interrupt()
    }
  }

  // ---- deploy / pull (ref: server/dev/deploy.go, pull.go) -------------

  /** One app as the server lists it (`GET /api/apps`). */
  final case class RemoteApp(id: String, name: String, tpe: String,
      path: String, content: String, updatedAt: String)

  /** One app as a local file carries it. `content` keeps the metadata
    * prefix; [[stripAppMeta]] removes it for comparison/deploy. */
  final case class LocalApp(id: String, name: String, tpe: String,
      path: String, content: String, filePath: Path, sync: Option[String])

  /** Remove the id/sync comment lines and the blank separator that
    * follows them (deploy.go stripAppMetadata:266-288) — the server
    * never stores the metadata prefix. */
  def stripAppMeta(content: String): String = {
    val lines = content.split("\n", -1)
    val out = Vector.newBuilder[String]
    // blank lines seen while still inside the leading metadata block are
    // held back, not emitted: extractAppMeta scans PAST blanks for more
    // metadata lines, so a `-- shapersync:` separated from the id by a
    // blank line is still metadata and must be stripped here too (else
    // restampSync prepends a second sync line on every deploy)
    val held = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    var inMeta = true
    var hadMeta = false
    for ((line, i) <- lines.zipWithIndex) {
      val trimmed = line.trim
      if (inMeta && (trimmed.startsWith(IdPrefix) || trimmed.startsWith(SyncPrefix))) {
        hadMeta = true
        held.clear() // blanks BETWEEN metadata lines belong to the block
      } else if (inMeta && trimmed.isEmpty) {
        held += ((line, i))
      } else {
        if (inMeta) {
          inMeta = false
          // drop the single blank separator right after stripped metadata
          val keep = if (hadMeta && held.nonEmpty) held.tail else held.toSeq
          keep.foreach(out += _._1)
          held.clear()
        }
        out += line
      }
    }
    // file ended inside the block: keep only a trailing last-line blank
    // (the split artifact of a final newline) when metadata was present
    (if (hadMeta) held.filter(_._2 == lines.length - 1) else held)
      .foreach(out += _._1)
    out.result().mkString("\n")
  }

  /** Fixed point of a write/strip cycle: prependAppMeta turns a body
    * starting with '\n' into metadata + that newline as the separator,
    * and stripAppMeta then eats it — so `"\nselect 1"` never survives a
    * round trip (the reference shares this asymmetry, watch_test.go's
    * "content with leading newline keeps newline" case). Comparing
    * canonical forms makes deploy/pull convergence structural instead
    * of content-dependent. */
  def canonicalBody(content: String): String =
    stripAppMeta(prependAppMeta("z", None, content))

  /** Path-traversal-safe file name (pull.go:428-433). */
  def sanitizeFileName(name: String): String =
    name.replace('/', '_').replace('\\', '_')

  /** Relative dir → the `/a/b/` path form the server uses
    * (deploy.go normalizeDashboardPath:252-264). */
  def normalizeAppPath(relDir: String): String = relDir match {
    case "" | "." => "/"
    case s =>
      val fwd = s.replace(java.io.File.separatorChar, '/')
      val lead = if (fwd.startsWith("/")) fwd else "/" + fwd
      if (lead.endsWith("/")) lead else lead + "/"
  }

  /** Walk the tree into id-keyed apps; Left on a file missing its id
    * comment or on a duplicate id (deploy.go loadLocalApps:189-250). */
  def loadLocalApps(dir: Path): Either[String, Map[String, LocalApp]] = {
    val apps = scala.collection.mutable.LinkedHashMap.empty[String, LocalApp]
    var err: Option[String] = None
    Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
      override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
        if (err.nonEmpty) return FileVisitResult.TERMINATE
        val fn = p.getFileName.toString
        val tpe = if (fn.endsWith(DashboardSuffix)) "dashboard"
          else if (fn.endsWith(TaskSuffix)) "task" else ""
        if (tpe.nonEmpty) {
          val content = new String(Files.readAllBytes(p), UTF_8)
          val meta = extractAppMeta(content)
          meta.id match {
            case None =>
              err = Some(s"$p is missing a shaper id comment (run `graft.Dev ids` to generate)")
            case Some(id) if apps.contains(id) =>
              err = Some(s"duplicate app id $id found in ${apps(id).filePath} and $p")
            case Some(id) =>
              val suffix = if (tpe == "task") TaskSuffix else DashboardSuffix
              val rel = dir.toAbsolutePath.normalize
                .relativize(p.toAbsolutePath.normalize.getParent).toString
              apps(id) = LocalApp(id, fn.stripSuffix(suffix), tpe,
                normalizeAppPath(rel), content, p, meta.sync)
          }
        }
        FileVisitResult.CONTINUE
      }
    })
    err.toLeft(apps.toMap)
  }

  /** Does the local file disagree with the server copy in name, folder,
    * or (canonicalized) content (deploy.go appsDiffer:420-430)? */
  def appsDiffer(local: LocalApp, remote: RemoteApp): Boolean =
    local.name != remote.name ||
      local.path != normalizeAppPath(remote.path.stripPrefix("/")) ||
      canonicalBody(stripAppMeta(local.content)) != canonicalBody(remote.content)

  private def parseInstant(s: String): Option[java.time.Instant] =
    scala.util.Try(java.time.OffsetDateTime.parse(s).toInstant).toOption

  /** Second-truncated remote updatedAt vs local sync stamp — the
    * reference truncates before comparing so a stamp written from a
    * listing round-trips equal (deploy.go:306-318). */
  private def remoteNewer(remoteUpdatedAt: String, sync: Option[String]): Boolean =
    (parseInstant(remoteUpdatedAt), sync.flatMap(parseInstant)) match {
      case (Some(r), Some(s)) =>
        r.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).isAfter(s)
      case _ => true // unparseable / absent stamp = assume stale
    }

  /** Client over the listing + batch-deploy routes. */
  final class AppsClient(baseUrl: String, token: String) {
    private val http = java.net.http.HttpClient.newHttpClient()
    private val base = baseUrl.stripSuffix("/")

    /** status 0 = transport failure (connection refused, timeout) — a
      * thrown IOException must surface as Left, not as a stack trace
      * out of the CLI (and not AFTER a deploy batch already applied). */
    private def send(method: String, path: String, body: String): (Int, String) =
      try {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + path))
          .header("Authorization", s"Bearer $token")
        val req = (if (method == "GET") b.GET()
          else b.header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))).build()
        val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), r.body())
      } catch {
        case e: Exception => (0, s"I/O error: ${Option(e.getMessage).getOrElse(e.toString)}")
      }

    /** tasksEnabled from the public system config — pull/deploy must
      * know a task-less listing means "tasks disabled", not "every task
      * was deleted remotely". */
    def fetchTasksEnabled(): Either[String, Boolean] = {
      val (st, body) = send("GET", "/api/system/config", "")
      if (st != 200) Left(s"fetch system config failed ($st): $body")
      else {
        // parsed, not substring-matched: a serializer formatting change
        // (whitespace, field order) must not silently flip this to
        // tasks-disabled and make deploy skip every local task file
        import graft.ingest.SchemaInfer._
        try Right(parseOrdered(body).map.get("tasksEnabled").contains(JBool(true)))
        catch { case e: Exception =>
          Left(s"fetch system config: malformed response: ${e.getMessage}")
        }
      }
    }

    /** Server-side dashboard validation (`POST /api/validate`);
      * Right((valid, errorOrEmpty)). */
    def validate(sql: String): Either[String, (Boolean, String)] = {
      val (st, body) = send("POST", "/api/validate",
        s"""{"type":"dashboard","sql":${Model.jsonValue(sql)}}""")
      if (st != 200) Left(s"validate failed ($st): $body")
      else {
        import graft.ingest.SchemaInfer._
        val o = parseOrdered(body)
        val valid = o.map.get("valid").contains(JBool(true))
        val err = o.map.get("error").collect { case JString(v) => v }.getOrElse("")
        Right((valid, err))
      }
    }

    def fetchApps(): Either[String, Seq[RemoteApp]] = {
      val (st, body) = send("GET", "/api/apps?recursive=true&include_content=true", "")
      if (st != 200) return Left(s"fetch apps failed ($st): $body")
      import graft.ingest.SchemaInfer._
      val o = parseOrdered(body)
      def s(obj: JObject, k: String): String =
        obj.map.get(k).collect { case JString(v) => v }.getOrElse("")
      o.map.get("apps") match {
        case Some(JArray(items)) => Right(items.collect {
          case a: JObject if s(a, "type") == "dashboard" || s(a, "type") == "task" =>
            RemoteApp(s(a, "id"), s(a, "name"), s(a, "type"), s(a, "path"),
              s(a, "content"), s(a, "updatedAt"))
        })
        case _ => Left("fetch apps: malformed response")
      }
    }

    /** Create a TEMPORARY (preview) dashboard — `POST /api/dashboards`
      * with `temporary: true` (api_client.go:131-161); returns the
      * `shaper-tmp.`-prefixed id. Works under a query-data API key,
      * which may not create journaled dashboards. */
    def createPreview(name: String, content: String, path: String): Either[String, String] = {
      val (st, body) = send("POST", "/api/dashboards",
        s"""{"name":${Model.jsonValue(name)},"content":${Model.jsonValue(content)},""" +
          s""""path":${Model.jsonValue(path)},"temporary":true}""")
      if (st != 200) Left(s"create preview failed ($st): $body")
      else {
        import graft.ingest.SchemaInfer._
        try parseOrdered(body).map.get("id") match {
          case Some(JString(id)) if id.nonEmpty => Right(id)
          case _ => Left("create preview: response missing id")
        } catch { case e: Exception =>
          Left(s"create preview: malformed response: ${e.getMessage}")
        }
      }
    }

    /** ops = (operation, type, dataFields). One POST, first failure
      * aborts server-side exactly like the reference batch. */
    def deployBatch(ops: Seq[(String, String, Seq[(String, String)])]): Either[String, String] = {
      if (ops.isEmpty) return Right("nothing to deploy")
      val items = ops.map { case (op, tpe, data) =>
        val d = data.map { case (k, v) => s""""$k":${Model.jsonValue(v)}""" }
          .mkString("{", ",", "}")
        s"""{"operation":${Model.jsonValue(op)},"type":${Model.jsonValue(tpe)},"data":$d}"""
      }.mkString("[", ",", "]")
      val (st, body) = send("POST", "/api/deploy", s"""{"apps":$items}""")
      if (st == 200) Right(body) else Left(s"deploy failed ($st): $body")
    }
  }

  /** `graft.Dev deploy <dir>`: one-shot directory sync to the server —
    * deletes first, then updates, then creates, exactly the reference's
    * operation order (deploy.go buildDeployOperations:327-418), with
    * the staleness guard: a remote app modified after the local file's
    * sync stamp refuses to deploy until a pull. Divergence, documented:
    * the reference exempts remote edits made by the SAME actor (CI key
    * re-deploys); the listing here carries no updatedBy, so the
    * exemption is absent — after any out-of-band edit, pull first.
    * After a successful deploy the local sync stamps are refreshed from
    * a re-fetch, like deploy.go:146-186. */
  def deploy(dir: Path, client: AppsClient, log: String => Unit = _ => (),
      /** `--validate-only` (deploy.go:39,134-137): compute and log the
        * change set, apply nothing. */
      validateOnly: Boolean = false): Either[String, String] = {
    for {
      tasksEnabled <- client.fetchTasksEnabled()
      remote <- client.fetchApps()
      localAll <- loadLocalApps(dir)
      local = {
        // a task-less listing from a tasksEnabled=false server means
        // "tasks invisible", not "tasks deleted" — local task files
        // must neither create (id-exists errors) nor delete anything
        val skipped = localAll.values.filter(l => l.tpe == "task" && !tasksEnabled)
        skipped.foreach(l => log(s"WARNING: skipping ${l.filePath} — tasks are disabled on this server"))
        if (tasksEnabled) localAll else localAll.filter(_._2.tpe != "task")
      }
      _ <- {
        // staleness guard on UPDATES only: the reference also guards
        // deletions but exempts same-actor edits (updatedBy == this
        // key); without updatedBy in the listing that exemption can't
        // exist here, and guarding deletions would make them impossible
        // (a missing local file has no sync stamp to compare). The
        // guard is skippable for CI via GRAFT_DEPLOY_FORCE=1.
        val force = sys.env.get("GRAFT_DEPLOY_FORCE").contains("1")
        val stale = if (force) None else remote.find(r =>
          local.get(r.id).exists(l =>
            appsDiffer(l, r) && remoteNewer(r.updatedAt, l.sync)))
        stale.map(r => s"remote app ${r.name} (${r.id}) was updated in prod; run `graft.Dev pull` first")
          .toLeft(())
      }
      result <- {
        val remoteById = remote.map(r => r.id -> r).toMap
        val ordered = local.values.toSeq.sortBy(l => (l.path, l.name))
        val creates = ordered.filterNot(l => remoteById.contains(l.id)).map(l =>
          ("create", l.tpe, Seq("id" -> l.id, "name" -> l.name,
            "path" -> l.path, "content" -> stripAppMeta(l.content))))
        val updates = ordered.filter(l =>
          remoteById.get(l.id).exists(appsDiffer(l, _))).map(l =>
          ("update", l.tpe, Seq("id" -> l.id, "name" -> l.name,
            "path" -> l.path, "content" -> stripAppMeta(l.content))))
        val deletes = remote.filterNot(r => local.contains(r.id))
          .sortBy(r => (r.path, r.name))
          .map(r => ("delete", r.tpe, Seq("id" -> r.id)))
        log(s"changes: create=${creates.size}, update=${updates.size}, delete=${deletes.size}")
        if (validateOnly)
          Right("validation successful — no changes applied (validate-only mode)")
        else {
          val changedIds = (creates ++ updates)
            .flatMap(_._3.collectFirst { case ("id", v) => v }).toSet
          client.deployBatch(deletes ++ updates ++ creates).map { res =>
            if (changedIds.nonEmpty) restampSync(client, local, changedIds, log)
            res
          }
        }
      }
    } yield result
  }

  /** Post-deploy: refresh local `-- shapersync:` stamps from the
    * server's new updatedAt values so the next deploy's staleness check
    * passes without a pull (deploy.go:146-186). Only the files this
    * deploy actually created/updated are rewritten — restamping the
    * whole tree would churn mtimes and, with a concurrent `watch` on
    * the same directory, trigger a redeploy storm. */
  private def restampSync(client: AppsClient, local: Map[String, LocalApp],
      changedIds: Set[String], log: String => Unit): Unit =
    client.fetchApps() match {
      case Left(err) => log(s"WARNING: could not refresh sync stamps: $err")
      case Right(fresh) => fresh.filter(r => changedIds.contains(r.id)).foreach { r =>
        local.get(r.id).foreach { l =>
          parseInstant(r.updatedAt).foreach { at =>
            val stamp = at.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString
            val body = stripAppMeta(new String(Files.readAllBytes(l.filePath), UTF_8))
            Files.write(l.filePath,
              prependAppMeta(l.id, Some(stamp), body).getBytes(UTF_8))
          }
        }
      }
    }

  /** `graft.Dev pull <dir>`: write the server's apps into the directory
    * (pull.go:21-360) — new apps are created, changed/stale ones
    * overwritten, a moved app's old file removed, and local files whose
    * SYNCED app vanished remotely deleted (an unstamped file is never
    * deleted: it was authored locally, not pulled). Divergence,
    * documented: no interactive confirmation — this CLI is
    * non-interactive; callers diff first if they need a preview. */
  def pull(dir: Path, client: AppsClient, log: String => Unit = _ => ()): Either[String, Int] =
    for {
      tasksEnabled <- client.fetchTasksEnabled()
      remote <- client.fetchApps()
      localIds <- loadLocalAppsLenient(dir)
      written <- {
        // duplicate (folder, name) pairs cannot map to distinct files
        val dup = remote.groupBy(r => (r.path,
          sanitizeFileName(r.name), r.tpe)).values.find(_.size > 1)
        if (dup.nonEmpty) {
          val d = dup.get
          Left(s"duplicate app name '${d.head.name}' in folder '${d.head.path}' — rename one before pulling")
        } else {
          val root = dir.toAbsolutePath.normalize
          var count = 0
          var err: Option[String] = None
          val writtenTargets = scala.collection.mutable.Set.empty[Path]
          remote.foreach { r => if (err.isEmpty) {
            val suffix = if (r.tpe == "task") TaskSuffix else DashboardSuffix
            // sanitize every path segment AND verify containment: a
            // folder the server names '..' (nothing stops a user or a
            // malicious server) must not let pull write outside `dir`
            val relSegs = r.path.split("/").filter(_.nonEmpty).map(sanitizeFileName)
            val target = relSegs.foldLeft(root)(_.resolve(_))
              .resolve(sanitizeFileName(r.name) + suffix).normalize
            if (!target.startsWith(root)) {
              err = Some(s"refusing to write outside the pull directory: app '${r.name}' path '${r.path}'")
            } else {
              val existing = localIds.get(r.id).map(_._1)
              val needsWrite = existing match {
                case None => true
                case Some(p) =>
                  val content = new String(Files.readAllBytes(p), UTF_8)
                  val meta = extractAppMeta(content)
                  p != target || remoteNewer(r.updatedAt, meta.sync) ||
                    canonicalBody(stripAppMeta(content)) != canonicalBody(r.content)
              }
              // an unstamped local file was authored locally, never
              // pulled — if its body diverges from the server copy,
              // overwriting it would destroy un-synced local work
              // (README: pull never touches unstamped local drafts).
              // Surfaced as a conflict and skipped; resolve by deploying
              // the draft or deleting the file. The reference prompts
              // interactively here (pull.go); this CLI is non-interactive.
              val conflict = needsWrite && existing.exists { p =>
                val content = new String(Files.readAllBytes(p), UTF_8)
                extractAppMeta(content).sync.isEmpty &&
                  canonicalBody(stripAppMeta(content)) != canonicalBody(r.content)
              }
              if (conflict) {
                log(s"CONFLICT: ${existing.get} has un-synced local changes; " +
                  "not overwriting (deploy it or delete the file, then pull again)")
              } else if (needsWrite) {
                Files.createDirectories(target.getParent)
                val stamp = parseInstant(r.updatedAt)
                  .map(_.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString)
                Files.write(target,
                  prependAppMeta(r.id, stamp, r.content).getBytes(UTF_8))
                writtenTargets += target
                // a case-only rename on a case-insensitive filesystem
                // makes old and target distinct Paths over the SAME
                // file — deleting "old" would delete the fresh write
                existing.filter(old => old != target &&
                    !(Files.exists(old) && Files.exists(target) &&
                      Files.isSameFile(old, target)))
                  .foreach { old =>
                    Files.deleteIfExists(old)
                    log(s"moved: $old -> $target")
                  }
                count += 1
                log(s"wrote ${r.path}${r.name}$suffix")
              }
            }
          }}
          err.toLeft {
            // previously-SYNCED local files whose app vanished remotely
            // (an unstamped file was authored locally — never deleted).
            // Decisions use the PRE-write scan: a remote app that
            // reuses a deleted app's file name must not have its fresh
            // write deleted; a tasks-disabled server hides tasks from
            // the listing without deleting them.
            val remoteIds = remote.map(_.id).toSet
            localIds.foreach { case (id, (p, sync)) =>
              val isTask = p.getFileName.toString.endsWith(TaskSuffix)
              if (!remoteIds.contains(id) && sync.nonEmpty &&
                  !writtenTargets.contains(p) && (tasksEnabled || !isTask)) {
                Files.deleteIfExists(p)
                log(s"deleted (removed from prod): $p")
              }
            }
            count
          }
        }
      }
    } yield written

  /** `graft.Dev validate <dir>`: run every dashboard file through the
    * server's `POST /api/validate` (ref: dev/validate.go:22-215 — the
    * CI pre-deploy check). Returns the invalid files; Left only on
    * transport/auth failure. Task files are skipped like the reference
    * ("task validation is currently not supported"). */
  def validate(dir: Path, client: AppsClient,
      log: String => Unit = _ => ()): Either[String, Seq[(Path, String)]] = {
    val files = Vector.newBuilder[Path]
    Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
      override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
        if (p.getFileName.toString.endsWith(DashboardSuffix)) files += p
        FileVisitResult.CONTINUE
      }
    })
    val results = Vector.newBuilder[(Path, String)]
    var transportErr: Option[String] = None
    files.result().foreach { p => if (transportErr.isEmpty) {
      // an unreadable file (permissions, deleted mid-walk) is a Left,
      // not an uncaught stack trace — the doc promise of this function
      val sqlOrErr = try Right(stripAppMeta(new String(Files.readAllBytes(p), UTF_8)))
        catch { case e: java.io.IOException => Left(s"cannot read $p: ${e.getMessage}") }
      sqlOrErr.flatMap(client.validate) match {
        case Left(err) => transportErr = Some(err)
        case Right((true, _)) => log(s"ok: $p")
        case Right((false, err)) =>
          log(s"INVALID: $p — $err")
          results += (p -> err)
      }
    }}
    transportErr.toLeft(results.result())
  }

  /** `graft.Dev preview <file>`: push ONE dashboard file as a
    * temporary dashboard and return its preview URL
    * (ref: server/dev/preview.go RunPreviewCommand; with
    * `noOpen = false` the URL also opens via [[openUrl]], failure
    * advisory like preview.go:61-66 — the library default is the
    * reference's `--no-open` path since specs and headless harness
    * runs must never spawn a browser). The temporary create never
    * touches the journal or apps listing, so iterating on a preview
    * cannot collide with deployed names. */
  def preview(file: Path, client: AppsClient, baseUrl: String,
      log: String => Unit = _ => (),
      noOpen: Boolean = true,
      opener: String => Either[String, Seq[String]] = openUrl(_)): Either[String, String] = {
    if (!file.getFileName.toString.endsWith(DashboardSuffix))
      return Left(s"file $file is not a dashboard (must end with $DashboardSuffix)")
    val content = try new String(Files.readAllBytes(file), UTF_8)
      catch { case e: java.io.IOException => return Left(s"cannot read $file: ${e.getMessage}") }
    val name = file.getFileName.toString.stripSuffix(DashboardSuffix)
    client.createPreview(name, content, "/").map { id =>
      val url = s"${baseUrl.stripSuffix("/")}/dashboards/$id?preview=true"
      log(s"Preview created: $url")
      if (!noOpen) {
        log(s"Opening $url in browser...")
        opener(url).left.foreach(err =>
          log(s"WARNING: Failed to open browser: $err"))
      }
      url
    }
  }

  // ---- browser launch (ref: server/dev/browser.go) --------------------

  /** Platform browser launch — browser.go's OpenURL dispatch exactly:
    * windows → `rundll32 url.dll,FileProtocolHandler`, darwin →
    * `open`, WSL → `cmd.exe /c start`, else `xdg-open`; multi-arg
    * commands get an empty string inserted at args[1] (browser.go:34-37
    * — keeps a URL starting with a quote from being parsed as the
    * `start` window title). WSL detection reads the kernel release
    * for "microsoft" (browser.go isWSL runs `uname -r`; on a Linux
    * JVM `os.version` IS the uname release, no subprocess needed).
    * Returns the launched command (specs pin it via a recording
    * `exec`); failure is advisory — every reference call site falls
    * back to printing the URL (auth.go:193-198, preview.go:61-66). */
  def openUrl(url: String,
      os: String = sys.props.getOrElse("os.name", ""),
      kernel: String = sys.props.getOrElse("os.version", ""),
      exec: Seq[String] => Unit = cmd => { new ProcessBuilder(cmd: _*).start(); () })
      : Either[String, Seq[String]] = {
    val lower = os.toLowerCase
    val (bin, args) =
      if (lower.contains("windows"))
        ("rundll32", Seq("url.dll,FileProtocolHandler", url))
      else if (lower.contains("mac") || lower.contains("darwin"))
        ("open", Seq(url))
      else if (kernel.toLowerCase.contains("microsoft"))
        ("cmd.exe", Seq("/c", "start", url))
      else ("xdg-open", Seq(url))
    val padded = if (args.length > 1) args.head +: "" +: args.tail else args
    val cmd = bin +: padded
    try { exec(cmd); Right(cmd) }
    catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
  }

  // ---- login (ref: server/dev/login.go, auth.go) ----------------------

  /** Auth-file session cache (auth.go SessionToken/saveTokenLocked):
    * one trimmed token per file, written 0600 with a trailing newline —
    * byte-compatible with the reference's `.shaper-auth` file so the
    * two CLIs can share a login. */
  def readAuthToken(authFile: Path): Option[String] =
    if (!Files.isRegularFile(authFile)) None
    else Some(new String(Files.readAllBytes(authFile), UTF_8).trim).filter(_.nonEmpty)

  def saveAuthToken(authFile: Path, token: String): Unit = {
    Option(authFile.getParent).foreach(Files.createDirectories(_))
    Files.write(authFile, (token + "\n").getBytes(UTF_8))
    try Files.setPosixFilePermissions(authFile,
      java.nio.file.attribute.PosixFilePermissions.fromString("rw-------"))
    catch { case _: UnsupportedOperationException => () } // non-POSIX FS
  }

  /** One-shot localhost callback receiver for the browser login
    * handshake (auth.go:126-215): the server's `/dev-login` page posts
    * the minted session token to `POST /token` here. Single-use — the
    * first valid post wins `{"status":"ok"}`, later posts get 410 Gone;
    * OPTIONS preflight answers 204; CORS is restricted to the graft
    * server's origin so other sites cannot push tokens in. */
  final class TokenCallback(allowedOrigin: String) extends AutoCloseable {
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    private val promise = new java.util.concurrent.CompletableFuture[String]()
    // single-use winner, decided separately from the promise so the
    // response can flush before any waiter observes completion
    private val won = new java.util.concurrent.atomic.AtomicBoolean(false)

    server.createContext("/", ex => {
      try {
        val origin = Option(ex.getRequestHeaders.getFirst("Origin")).getOrElse("")
        if (allowedOrigin.isEmpty || origin == allowedOrigin) {
          val h = ex.getResponseHeaders
          val allow = if (allowedOrigin.nonEmpty) allowedOrigin else origin
          if (allow.nonEmpty) {
            h.set("Access-Control-Allow-Origin", allow)
            h.set("Access-Control-Allow-Methods", "POST, OPTIONS")
            h.set("Access-Control-Allow-Headers", "Content-Type")
            h.add("Vary", "Origin")
          }
        }
        def respond(code: Int, body: String): Unit = {
          val b = body.getBytes(UTF_8)
          ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
          if (b.nonEmpty) { val os = ex.getResponseBody; os.write(b); os.close() }
        }
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("OPTIONS", _) => respond(204, "")
          case ("POST", "/token") =>
            val token = try {
              import graft.ingest.SchemaInfer._
              parseOrdered(new String(ex.getRequestBody.readAllBytes(), UTF_8))
                .map.get("token").collect { case JString(t) => t.trim }.getOrElse("")
            } catch { case _: Exception => "" }
            if (token.isEmpty) respond(400, """{"error":"token required"}""")
            else if (won.compareAndSet(false, true)) {
              // respond BEFORE completing the promise: the login thread
              // wakes on completion and closes this server — completing
              // first let stop(0) race the in-flight 200 and the UI saw
              // "header parser received no bytes" (flaked in CI once)
              respond(200, """{"status":"ok"}""")
              promise.complete(token)
            } else respond(410, """{"error":"already authenticated"}""")
          case _ => respond(404, "")
        }
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()

    def port: Int = server.getAddress.getPort
    def await(timeoutMillis: Long): Option[String] =
      try Some(promise.get(timeoutMillis, java.util.concurrent.TimeUnit.MILLISECONDS))
      catch { case _: Exception => None }
    override def close(): Unit = server.stop(0)
  }

  /** `graft.Dev login`: the full session handshake of `shaper dev
    * login` (login.go:10-41), browser launch included: with
    * `noOpen = false` the login URL opens via [[openUrl]]
    * (auth.go:192-198, failure advisory), otherwise it prints for a
    * manual open like the reference's `--no-open`. The library
    * default stays no-open — specs and headless harness runs must
    * never spawn a browser; the CLI flips it unless `--no-open`.
    * Order:
    *   1. no-op when the server's public config says login isn't
    *      required;
    *   2. "Already logged in." when the cached auth-file token still
    *      passes a listing probe;
    *   3. credentials (GRAFT_EMAIL/GRAFT_PASSWORD — the headless CI
    *      path) mint a session via `POST /api/auth/login`;
    *   4. otherwise the callback handshake: print
    *      `<base>/dev-login?port=N` and wait for the UI to post the
    *      token back.
    * The minted token lands in `authFile`; every other command reads it
    * when GRAFT_TOKEN is unset. */
  def login(baseUrl: String, authFile: Path,
      credentials: Option[(String, String)] = None,
      log: String => Unit = _ => (),
      handshakeTimeoutMillis: Long = 300000,
      noOpen: Boolean = true,
      opener: String => Either[String, Seq[String]] = openUrl(_)): Either[String, String] = {
    val base = baseUrl.stripSuffix("/")
    log(s"Connecting to graft at: $base")
    val loginRequired = {
      val http = java.net.http.HttpClient.newHttpClient()
      try {
        val r = http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(base + "/api/system/config")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (r.statusCode() != 200)
          return Left(s"system config request failed (${r.statusCode()}): ${r.body()}")
        import graft.ingest.SchemaInfer._
        parseOrdered(r.body()).map.get("loginRequired").contains(JBool(true))
      } catch { case e: Exception => return Left(s"failed to fetch system config: ${e.getMessage}") }
    }
    if (!loginRequired) {
      log("Server does not require login.")
      return Right("")
    }
    readAuthToken(authFile) match {
      case Some(tok) if new AppsClient(base, tok).fetchApps().isRight =>
        log("Already logged in.")
        return Right(tok)
      case _ => ()
    }
    credentials match {
      case Some((email, password)) =>
        val http = java.net.http.HttpClient.newHttpClient()
        val body = s"""{"email":${Model.jsonValue(email)},"password":${Model.jsonValue(password)}}"""
        val r = try http.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(base + "/api/auth/login"))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        catch { case e: Exception => return Left(s"login request failed: ${e.getMessage}") }
        if (r.statusCode() != 200) return Left(s"login failed (${r.statusCode()}): ${r.body()}")
        import graft.ingest.SchemaInfer._
        parseOrdered(r.body()).map.get("token").collect { case JString(t) => t } match {
          case Some(tok) if tok.nonEmpty =>
            saveAuthToken(authFile, tok)
            log(s"Authentication successful! Token saved to $authFile")
            Right(tok)
          case _ => Left("login response carried no token")
        }
      case None =>
        val origin = try {
          val u = java.net.URI.create(base)
          if (u.getScheme != null && u.getHost != null)
            u.getScheme + "://" + u.getAuthority else ""
        } catch { case _: Exception => "" }
        val cb = new TokenCallback(origin)
        try {
          log(s"Dev auth callback listening on port ${cb.port}")
          val loginUrl = s"$base/dev-login?port=${cb.port}"
          // browser-first like auth.go:192-198; failure is advisory
          if (noOpen) log(s"Please open the login URL manually:\n$loginUrl")
          else opener(loginUrl) match {
            case Right(_) => log(s"Opening $loginUrl ...")
            case Left(err) => log(s"Failed to open browser automatically: $err\n" +
              s"Please open the URL manually.\n$loginUrl")
          }
          cb.await(handshakeTimeoutMillis) match {
            case Some(tok) =>
              saveAuthToken(authFile, tok)
              log(s"Authentication successful! Token saved to $authFile")
              Right(tok)
            case None => Left("authentication cancelled (no token received)")
          }
        } finally cb.close()
    }
  }

  /** id → (file, sync stamp) map that tolerates unstamped files (pull
    * must not fail on a half-written local draft the way deploy does).
    * The sync stamp is captured HERE, pre-write, so the delete phase
    * never judges a file by content pull itself just wrote. */
  private def loadLocalAppsLenient(dir: Path): Either[String, Map[String, (Path, Option[String])]] = {
    val ids = scala.collection.mutable.LinkedHashMap.empty[String, (Path, Option[String])]
    Files.walkFileTree(dir, new SimpleFileVisitor[Path] {
      override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
        val fn = p.getFileName.toString
        if (fn.endsWith(DashboardSuffix) || fn.endsWith(TaskSuffix)) {
          val meta = extractAppMeta(new String(Files.readAllBytes(p), UTF_8))
          meta.id.foreach(id => ids(id) = (p.toAbsolutePath.normalize, meta.sync))
        }
        FileVisitResult.CONTINUE
      }
    })
    Right(ids.toMap)
  }

  /** CLI: `graft.Dev [watch|deploy|pull|ids|validate|login] <dir>` with
    * GRAFT_BASE_URL (default http://localhost:5454, the reference's
    * port) and GRAFT_TOKEN (an API key with the deploy permission, or a
    * user session token) — falling back to the `login`-minted auth
    * file. Bare `graft.Dev <dir>` means watch. */
  def main(args: Array[String]): Unit = {
    val commands = Set("watch", "deploy", "pull", "ids", "validate", "login", "preview")
    val validateOnly = args.contains("--validate-only")
    // CLI default matches the reference (browser opens unless
    // --no-open); the library-level default stays no-open
    val noOpen = args.contains("--no-open")
    val argList = args.filterNot(_.startsWith("--"))
    val (cmd, dirArg) = argList.toList match {
      case c :: d :: _ if commands(c) => (c, Some(d))
      case c :: Nil if commands(c) => (c, sys.env.get("GRAFT_DEV_DIR"))
      case d :: _ => ("watch", Some(d))
      case Nil => ("watch", sys.env.get("GRAFT_DEV_DIR"))
    }
    // config-file fallback (the reference's shaper.json, config.go):
    // {"url": "...", "directory": "..."} read from GRAFT_DEV_CONFIG or
    // ./graft.json; explicit args/env always win
    val explicitConfig = sys.env.get("GRAFT_DEV_CONFIG").map(Paths.get(_))
    // an explicitly named config file that is missing deserves a loud
    // warning — silently falling back to defaults would point a deploy
    // at localhost instead of the configured server
    explicitConfig.filterNot(Files.isRegularFile(_)).foreach(p =>
      System.err.println(s"WARNING: GRAFT_DEV_CONFIG=$p does not exist; using defaults"))
    val configFile = explicitConfig
      .orElse(Some(Paths.get("graft.json")))
      .filter(Files.isRegularFile(_))
    val config: Map[String, String] = configFile
      .flatMap { p =>
        try {
          import graft.ingest.SchemaInfer._
          val o = parseOrdered(new String(Files.readAllBytes(p), UTF_8))
          Some(o.fields.collect { case (k, JString(v)) => k -> v }.toMap)
        } catch {
          case e: Exception =>
            System.err.println(s"WARNING: ignoring unreadable config $p: ${e.getMessage}")
            None
        }
      }.getOrElse(Map.empty)
    val baseUrl = sys.env.get("GRAFT_BASE_URL").orElse(config.get("url"))
      .getOrElse("http://localhost:5454")
    // session cache shared by login and every authenticated command
    // (the reference's defaultAuthFile, resolved next to the config)
    val authFile = sys.env.get("GRAFT_AUTH_FILE").orElse(config.get("authFile"))
      .map(Paths.get(_)).getOrElse(
        configFile.flatMap(p => Option(p.toAbsolutePath.getParent))
          .getOrElse(Paths.get(".")).resolve(".graft-auth"))
    if (cmd == "login") {
      val creds = for {
        e <- sys.env.get("GRAFT_EMAIL"); p <- sys.env.get("GRAFT_PASSWORD")
      } yield (e, p)
      login(baseUrl, authFile, creds, println, noOpen = noOpen) match {
        case Right(_) => ()
        case Left(err) => System.err.println(s"ERROR: $err"); sys.exit(1)
      }
      return
    }
    if (cmd == "preview") {
      // preview takes a FILE, not the watch directory (preview.go:13)
      val file = argList.toList.drop(1).headOption.getOrElse {
        System.err.println("usage: graft.Dev preview <file" + DashboardSuffix + ">")
        sys.exit(2)
      }
      val token = sys.env.get("GRAFT_TOKEN").orElse(readAuthToken(authFile)).getOrElse {
        System.err.println("GRAFT_TOKEN is required (query-data API key or session " +
          "token), or run `graft.Dev login` first")
        sys.exit(2)
      }
      preview(Paths.get(file), new AppsClient(baseUrl, token), baseUrl, println,
          noOpen = noOpen) match {
        case Right(_) => ()
        case Left(err) => System.err.println(s"ERROR: $err"); sys.exit(1)
      }
      return
    }
    val dir = dirArg.orElse(config.get("directory")).getOrElse {
      System.err.println("usage: graft.Dev [watch|deploy|pull|ids|validate|login|preview] <dir> " +
        "(or GRAFT_DEV_DIR, or \"directory\" in graft.json)")
      sys.exit(2)
    }
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) {
      System.err.println(s"directory '$dir' does not exist")
      sys.exit(2)
    }
    if (cmd == "ids") {
      val n = ensureIdsForDir(root, println)
      println(s"Done. Processed $n app${if (n == 1) "" else "s"}.")
      return
    }
    val token = sys.env.get("GRAFT_TOKEN").orElse(readAuthToken(authFile)).getOrElse {
      System.err.println("GRAFT_TOKEN is required (deploy-permitted API key or session " +
        "token), or run `graft.Dev login` first")
      sys.exit(2)
    }
    cmd match {
      case "deploy" =>
        deploy(root, new AppsClient(baseUrl, token), println,
            validateOnly = validateOnly) match {
          case Right(msg) if validateOnly => println(msg)
          case Right(_) => println("Deploy completed.")
          case Left(err) => System.err.println(s"ERROR: $err"); sys.exit(1)
        }
      case "pull" =>
        pull(root, new AppsClient(baseUrl, token), println) match {
          case Right(n) => println(s"Pull completed ($n files written).")
          case Left(err) => System.err.println(s"ERROR: $err"); sys.exit(1)
        }
      case "validate" =>
        validate(root, new AppsClient(baseUrl, token), println) match {
          case Right(Seq()) => println("All dashboards valid.")
          case Right(bad) =>
            System.err.println(s"${bad.size} invalid dashboard(s).")
            sys.exit(1)
          case Left(err) => System.err.println(s"ERROR: $err"); sys.exit(1)
        }
      case _ =>
        // live-reload channel (watch.go:321-443): deploys of a
        // dashboard reload its open tabs; with no tab connected the
        // dashboard URL opens (or prints under --no-open)
        val reload = new LiveReload(println)
        val onDeployed: String => Unit = id => if (!reload.notify(id)) {
          val url = s"${baseUrl.stripSuffix("/")}/dashboards/$id" +
            s"?dev=ws://localhost:${reload.port}/ws"
          if (noOpen) println(s"Dashboard URL: $url")
          else {
            println(s"Opening $url ...")
            openUrl(url).left.foreach(err =>
              println(s"ERROR: Failed opening '$url' in browser: $err"))
          }
        }
        val watcher = new Watcher(root, new HttpPusher(baseUrl, token),
          log = println, onDeployed = onDeployed)
        val n = watcher.start()
        println(s"Watching directory: $root")
        println(s"Found $n app file${if (n == 1) "" else "s"} in watch directory.")
        println()
        println(s"Create or edit any file with the $DashboardSuffix extension in the watched directory.")
        println("The filename before the extension is the dashboard name;")
        println("sub-directories become folders. Saving deploys to " + baseUrl + ".")
        // block until interrupted; the watch thread is a daemon
        Thread.currentThread().join()
    }
  }
}
