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
    * expired-dashboard recreate path, folded into deploy semantics. */
  final class HttpPusher(baseUrl: String, token: String) extends AppPusher {
    private val http = java.net.http.HttpClient.newHttpClient()
    private val base = baseUrl.stripSuffix("/")

    private def deploy(op: String, tpe: String, id: String, name: String,
        folderPath: String, content: String): (Int, String) = {
      val data = s"""{"id":${Model.jsonValue(id)},"name":${Model.jsonValue(name)},""" +
        s""""path":${Model.jsonValue(folderPath)},"content":${Model.jsonValue(content)}}"""
      val body = s"""{"apps":[{"operation":${Model.jsonValue(op)},""" +
        s""""type":${Model.jsonValue(tpe)},"data":$data}]}"""
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(base + "/api/deploy"))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }

    def push(tpe: String, id: String, name: String, folderPath: String,
        content: String): Either[String, String] = {
      val (st, body) = deploy("update", tpe, id, name, folderPath, content)
      if (st == 200) Right("updated")
      else if (st == 400 && body.contains("not found")) {
        val (st2, body2) = deploy("create", tpe, id, name, folderPath, content)
        if (st2 == 200) Right("created") else Left(s"create failed ($st2): $body2")
      } else Left(s"update failed ($st): $body")
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
      throttleMillis: Long = 500, log: String => Unit = _ => ()) extends AutoCloseable {
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
                      handleAppFile(f)
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
      if (runNow) handleAppFile(p)
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
      pusher.push("dashboard", id, name, fPath, content) match {
        case Right(status) => log(s"${status.capitalize} $fPath$name$DashboardSuffix")
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

  /** CLI: `sbt "runMain graft.Dev <dir>"` with GRAFT_BASE_URL (default
    * http://localhost:5454, the reference's port) and GRAFT_TOKEN (an
    * API key with the deploy permission, or a user session token). */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.orElse(sys.env.get("GRAFT_DEV_DIR")).getOrElse {
      System.err.println("usage: graft.Dev <watch-dir> (or GRAFT_DEV_DIR)")
      sys.exit(2)
    }
    val baseUrl = sys.env.getOrElse("GRAFT_BASE_URL", "http://localhost:5454")
    val token = sys.env.getOrElse("GRAFT_TOKEN", {
      System.err.println("GRAFT_TOKEN is required (deploy-permitted API key or session token)")
      sys.exit(2)
    })
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) {
      System.err.println(s"watch directory '$dir' does not exist")
      sys.exit(2)
    }
    val watcher = new Watcher(root, new HttpPusher(baseUrl, token), log = println)
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
