package graft.state

import graft.auth.Tokens
import graft.ingest.SchemaInfer
import graft.ingest.SchemaInfer.{JValue, JString, JNumber, JBool, JNull, JObject, JArray}

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Event-sourced system state (op #44 — ref: server/core/state.go:29-163).
  * The reference routes every metadata change through a journal first
  * (NATS JetStream), applies it with an IDEMPOTENT handler into a
  * materialized view (SQLite), and checkpoints the last applied
  * sequence per consumer so a restarted node replays only the tail —
  * "you can apply them multiple times and the end result looks the
  * same".
  *
  * Spark-native analog: the journal is a directory of one-JSON-file-
  * per-event segments addressed through the Hadoop FS API (works on
  * local disk, HDFS, or an object store — the same place the warehouse
  * lives), the materialized view is the in-memory `MetaStore`, and
  * consumer checkpoints are tiny seq files. Writes are
  * segment-per-event because object stores have no append; at metadata
  * event rates (human-driven dashboard edits) this is far below any
  * filesystem's small-file threshold, and replay is a bounded listing.
  */
object StateJournal {

  final case class Event(seq: Long, event: String, payload: JObject)

  final case class DashboardMeta(id: String, name: String, content: String,
      folderId: Option[String], visibility: Option[String],
      createdAtMillis: Long, createdBy: String,
      passwordHash: Option[String] = None,
      /** Last edit time from the update event's journaled `timestamp`
        * (0 = never edited). Journaled, not wall-clock-at-apply, so a
        * replay on another node reconstructs identical state. */
      updatedAtMillis: Long = 0L) {
    def updatedAt: Long = if (updatedAtMillis > 0) updatedAtMillis else createdAtMillis
  }
  final case class TaskMeta(id: String, name: String, content: String,
      folderId: Option[String], createdAtMillis: Long, createdBy: String,
      updatedAtMillis: Long = 0L) {
    def updatedAt: Long = if (updatedAtMillis > 0) updatedAtMillis else createdAtMillis
  }
  final case class FolderMeta(id: String, name: String, parentId: Option[String])
  final case class InviteMeta(code: String, email: String,
      createdAtMillis: Long, createdBy: String)

  /** Edit-time bump for update events: take the payload's journaled
    * `timestamp` when present, otherwise keep the previous value (old
    * journals without the field replay unchanged). */
  private def bump(payload: JObject, prev: Long): Long = {
    val t = millis(payload, "timestamp")
    if (t > 0) t else prev
  }

  private def str(o: JObject, k: String): String =
    o.map.get(k).collect { case JString(s) => s }.getOrElse("")
  private def strOpt(o: JObject, k: String): Option[String] =
    o.map.get(k).collect { case JString(s) => s }
  private def millis(o: JObject, k: String): Long =
    o.map.get(k).collect {
      case JNumber(n) => n.toLong
      case JString(s) => try {
        java.time.Instant.parse(s).toEpochMilli
      } catch { case _: Exception => 0L }
    }.getOrElse(0L)

  /** Materialized view over the journal — handlers mirror the
    * reference's HandleCreate*/ /* functions and are idempotent:
    * create = INSERT OR IGNORE, update = overwrite-if-present,
    * delete = remove-if-present. API-key/session/user events route
    * into the auth store (the reference's api_keys/sessions/users
    * tables). Unknown events return false, like the reference's
    * unknown-subject handler. */
  final class MetaStore(val tokens: Tokens.TokenStore = new Tokens.TokenStore()) {
    val dashboards: mutable.LinkedHashMap[String, DashboardMeta] = mutable.LinkedHashMap.empty
    val tasks: mutable.LinkedHashMap[String, TaskMeta] = mutable.LinkedHashMap.empty
    val folders: mutable.LinkedHashMap[String, FolderMeta] = mutable.LinkedHashMap.empty
    val invites: mutable.LinkedHashMap[String, InviteMeta] = mutable.LinkedHashMap.empty

    /** Apply one event; true = handled (ack + checkpoint). */
    /** Signing-secret override journaled by `reset_jwt_secret` — replay
      * restores a rotation across restarts and onto every node (the
      * reference persists the rotated secret the same way its other
      * state flows through the journal/KV). */
    @volatile var jwtSecretOverride: Option[String] = None

    /** Apply one event; true = handled (ack + checkpoint). Synchronized:
      * the HTTP pool serves full-scan reads (apps listing, folder-path
      * walks) concurrently with these writes, and the LinkedHashMaps are
      * not thread-safe — readers take the same monitor. */
    def apply(event: String, payload: JObject): Boolean = this.synchronized { applyLocked(event, payload) }

    /** Monitor-taking point reads for callers outside this class — the
      * backing LinkedHashMaps are not safe against a concurrent
      * apply(). */
    def getDashboard(id: String): Option[DashboardMeta] = this.synchronized(dashboards.get(id))
    def getTask(id: String): Option[TaskMeta] = this.synchronized(tasks.get(id))

    /** Folder chain as path segments, root-first (cycle-guarded: a
      * corrupt parent chain resolves to root rather than spinning).
      * The single shared walk behind the HTTP layer's `/a/b/` paths and
      * the init-task depth ordering. */
    def folderSegments(folderId: Option[String]): List[String] = this.synchronized {
      val names = List.newBuilder[String]
      var cur = folderId
      var hops = 0
      while (cur.isDefined && hops < 64) {
        folders.get(cur.get) match {
          case Some(f) => names += f.name; cur = f.parentId
          case None => cur = None
        }
        hops += 1
      }
      if (hops >= 64) Nil else names.result().reverse
    }

    private def applyLocked(event: String, payload: JObject): Boolean = event match {
      case "create_dashboard" =>
        val id = str(payload, "id")
        if (id.isEmpty) false
        else {
          if (!dashboards.contains(id)) // INSERT OR IGNORE
            dashboards(id) = DashboardMeta(id, str(payload, "name"),
              str(payload, "content"), strOpt(payload, "folderId"),
              strOpt(payload, "visibility"), millis(payload, "timestamp"),
              str(payload, "createdBy"))
          true
        }
      case "update_dashboard_content" =>
        dashboards.get(str(payload, "id")).foreach(d =>
          dashboards(d.id) = d.copy(content = str(payload, "content"),
            updatedAtMillis = bump(payload, d.updatedAtMillis)))
        true
      case "update_dashboard_name" =>
        dashboards.get(str(payload, "id")).foreach(d =>
          dashboards(d.id) = d.copy(name = str(payload, "name"),
            updatedAtMillis = bump(payload, d.updatedAtMillis)))
        true
      case "update_dashboard_visibility" =>
        dashboards.get(str(payload, "id")).foreach(d =>
          dashboards(d.id) = d.copy(visibility = strOpt(payload, "visibility"),
            updatedAtMillis = bump(payload, d.updatedAtMillis)))
        true
      case "update_dashboard_password" =>
        dashboards.get(str(payload, "id")).foreach(d =>
          dashboards(d.id) = d.copy(
            passwordHash = strOpt(payload, "passwordHash").filter(_.nonEmpty),
            updatedAtMillis = bump(payload, d.updatedAtMillis)))
        true
      case "delete_dashboard" =>
        dashboards.remove(str(payload, "id")); true
      case "create_task" =>
        val id = str(payload, "id")
        if (id.isEmpty) false
        else {
          if (!tasks.contains(id))
            tasks(id) = TaskMeta(id, str(payload, "name"), str(payload, "content"),
              strOpt(payload, "folderId"), millis(payload, "timestamp"),
              str(payload, "createdBy"))
          true
        }
      case "update_task_content" =>
        tasks.get(str(payload, "id")).foreach(t =>
          tasks(t.id) = t.copy(content = str(payload, "content"),
            updatedAtMillis = bump(payload, t.updatedAtMillis)))
        true
      case "update_task_name" =>
        tasks.get(str(payload, "id")).foreach(t =>
          tasks(t.id) = t.copy(name = str(payload, "name"),
            updatedAtMillis = bump(payload, t.updatedAtMillis)))
        true
      case "delete_task" =>
        tasks.remove(str(payload, "id")); true
      case "create_folder" =>
        val id = str(payload, "id")
        if (id.isEmpty) false
        else {
          if (!folders.contains(id))
            folders(id) = FolderMeta(id, str(payload, "name"),
              strOpt(payload, "parentFolderId"))
          true
        }
      case "rename_folder" =>
        folders.get(str(payload, "id")).foreach(f =>
          folders(f.id) = f.copy(name = str(payload, "name")))
        true
      case "delete_folder" =>
        folders.remove(str(payload, "id")); true
      case "move_items" =>
        val to = strOpt(payload, "toFolderId")
        payload.map.get("apps").collect { case JArray(items) => items }.getOrElse(Nil)
          .collect { case JString(id) => id }.foreach { id =>
            dashboards.get(id).foreach(d => dashboards(id) = d.copy(folderId = to,
              updatedAtMillis = bump(payload, d.updatedAtMillis)))
            tasks.get(id).foreach(t => tasks(id) = t.copy(folderId = to,
              updatedAtMillis = bump(payload, t.updatedAtMillis)))
          }
        payload.map.get("folders").collect { case JArray(items) => items }.getOrElse(Nil)
          .collect { case JString(id) => id }.foreach { id =>
            folders.get(id).foreach(f => folders(id) = f.copy(parentId = to))
          }
        true
      case "create_api_key" =>
        val id = str(payload, "id")
        if (id.isEmpty) false
        else {
          if (tokens.getApiKey(id).isEmpty) // INSERT OR IGNORE
            tokens.putApiKey(Tokens.ApiKeyRecord(id, str(payload, "name"),
              str(payload, "hash"), str(payload, "salt"),
              Some(payload.map.get("permissions").collect {
                case JArray(items) => items.collect { case JString(s) => s }
              }.getOrElse(Nil)),
              millis(payload, "timestamp"), str(payload, "createdBy")))
          true
        }
      case "delete_api_key" =>
        tokens.deleteApiKey(str(payload, "id")); true
      case "update_api_key_permissions" =>
        val id = str(payload, "id")
        tokens.getApiKey(id).foreach { k =>
          val perms = payload.map.get("permissions").collect {
            case JArray(items) => items.collect { case JString(s) => s }
          }.getOrElse(Nil)
          tokens.putApiKey(k.copy(permissions = Some(perms)))
        }
        true
      case "create_user" =>
        val id = str(payload, "id")
        if (id.isEmpty) false
        else { tokens.putUser(Tokens.UserRecord(id, str(payload, "email"),
          str(payload, "name"), strOpt(payload, "passwordHash"))); true }
      case "update_user_name" =>
        tokens.updateUser(str(payload, "id"))(_.copy(name = str(payload, "name")))
        true
      case "update_user_password" =>
        // new hash + invalidate every OTHER session for the user
        // (ref: HandleUpdateUserPassword, users.go:220-269)
        val userId = str(payload, "userId")
        tokens.updateUser(userId)(_.copy(
          passwordHash = strOpt(payload, "passwordHash")))
        tokens.deleteSessionsForUser(userId,
          except = strOpt(payload, "excludeSessionId").filter(_.nonEmpty))
        true
      case "delete_user" =>
        // sessions hard-deleted, user SOFT-deleted (users.go:402-440)
        val id = str(payload, "id")
        tokens.deleteSessionsForUser(id)
        tokens.updateUser(id)(_.copy(
          deletedAtMillis = Some(millis(payload, "timestamp"))))
        true
      case "create_session" =>
        tokens.putSession(Tokens.SessionRecord(str(payload, "id"),
          str(payload, "userId"), str(payload, "hash"), str(payload, "salt"),
          millis(payload, "timestamp")))
        true
      case "delete_session" =>
        tokens.logout(str(payload, "id")); true
      case "create_invite" =>
        // INSERT OR IGNORE by code (users.go:544-560)
        val code = str(payload, "code")
        if (code.isEmpty) false
        else {
          if (!invites.contains(code))
            invites(code) = InviteMeta(code, str(payload, "email"),
              millis(payload, "timestamp"), str(payload, "createdBy"))
          true
        }
      case "delete_invite" =>
        invites.remove(str(payload, "code")); true
      case "reset_jwt_secret" =>
        val s = str(payload, "secret")
        if (s.isEmpty) false else { jwtSecretOverride = Some(s); true }
      case "claim_invite" =>
        // create the user and burn the invite (users.go:642-700)
        val userId = str(payload, "userId")
        if (userId.isEmpty) false
        else {
          if (tokens.getUser(userId).isEmpty)
            tokens.putUser(Tokens.UserRecord(userId, str(payload, "email"),
              str(payload, "name"), strOpt(payload, "passwordHash")))
          invites.remove(str(payload, "code"))
          true
        }
      case _ => false // unknown subject: not acked (state.go:37-40)
    }

    /** (ref: VerifyDashboardPassword, edit_dashboard.go:259-280):
      * Left = not found / no password set; Right(bool) = match. */
    def verifyDashboardPassword(id: String, password: String): Either[String, Boolean] =
      dashboards.get(id).flatMap(_.passwordHash) match {
        case None => Left("dashboard not found")
        case Some(h) => Right(graft.auth.Passwords.verify(password, h))
      }

    /** The PublicAuth decision + mint (ref: handler/auth.go:234-300):
      * private/unshared → not found; password-protected requires a
      * verified password; success mints a {exp, dashboardId,
      * public: visibility} token. */
    def publicAuth(dashboardId: String, password: Option[String], secret: String,
        noPublicSharing: Boolean = false, noPasswordSharing: Boolean = false,
        nowSeconds: Long = System.currentTimeMillis() / 1000): Either[String, String] = {
      val d = dashboards.get(dashboardId).getOrElse(return Left("not found"))
      d.visibility match {
        case None | Some("private") => Left("not found")
        case Some("public") if noPublicSharing => Left("not found")
        case Some("password-protected") if noPasswordSharing => Left("not found")
        case Some("password-protected") =>
          password match {
            case None | Some("") => Left("Password required")
            case Some(pw) => verifyDashboardPassword(dashboardId, pw) match {
              case Right(true) => Right(graft.auth.Auth.mintPublicToken(
                dashboardId, "password-protected", secret, nowSeconds))
              case Right(false) => Left("Invalid password")
              case Left(e) => Left(e)
            }
          }
        case Some("public") => Right(graft.auth.Auth.mintPublicToken(
          dashboardId, "public", secret, nowSeconds))
        case Some(_) => Left("not found")
      }
    }
  }

  /** Durable journal + checkpointed consumer. */
  final class Journal(dir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()) {
    private val base = new org.apache.hadoop.fs.Path(dir)
    private val fs = base.getFileSystem(hadoopConf)
    private val eventsDir = new org.apache.hadoop.fs.Path(base, "events")
    private val consumersDir = new org.apache.hadoop.fs.Path(base, "consumers")
    /** Seq-only claim files: event filenames embed the event NAME, so two
      * nodes minting the same seq for different events would both create
      * successfully and replay order would be nondeterministic. The claim
      * file's name is the bare seq — cross-process atomic create decides
      * the winner, the loser retries with the next seq. */
    private val seqLocksDir = new org.apache.hadoop.fs.Path(base, "seqlocks")
    fs.mkdirs(eventsDir)
    fs.mkdirs(consumersDir)
    fs.mkdirs(seqLocksDir)

    private def segName(seq: Long, event: String): String = f"$seq%012d-$event.json"

    def lastSeq(): Long = {
      val statuses = fs.listStatus(eventsDir)
      if (statuses.isEmpty) 0L
      else statuses.map(_.getPath.getName.takeWhile(_.isDigit).toLong).max
    }

    /** (max seq, event count) in ONE listing — the cheap change probe
      * the tail poller compares between polls. Count matters as much as
      * max: a stalled writer can land a claimed seq BELOW an already-
      * observed head (see the checkpoint constraint note), which only
      * the count detects. */
    def headState(): (Long, Int) = {
      val names = fs.listStatus(eventsDir)
        .map(_.getPath.getName).filter(_.endsWith(".json"))
      val max = if (names.isEmpty) 0L
        else names.map(_.takeWhile(_.isDigit).toLong).max
      (max, names.length)
    }

    /** Atomically claim a seq number across processes. Same branch logic
      * as FsWorkQueue.tryClaim (Tasks.scala): Hadoop's local-FS
      * create(overwrite=false) is exists-then-create (NOT atomic), the
      * JDK's File.createNewFile is O_CREAT|O_EXCL; HDFS create IS
      * atomic-exclusive. Unlike the work queue, an I/O fault here must
      * surface — appends cannot silently drop. */
    private def claimSeq(seq: Long): Boolean = {
      val p = new org.apache.hadoop.fs.Path(seqLocksDir, f"$seq%012d.seq")
      fs match {
        case lfs: org.apache.hadoop.fs.LocalFileSystem => lfs.pathToFile(p).createNewFile()
        case raw: org.apache.hadoop.fs.RawLocalFileSystem => raw.pathToFile(p).createNewFile()
        case other =>
          try { other.create(p, false).close(); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      }
    }

    /** Append one event (the reference's SubmitState publish). The JVM
      * monitor serializes local writers; the seq claim file serializes
      * writers on OTHER nodes sharing this journal dir. Peers observe
      * the append at boot-time replay AND live through their
      * [[JournalTailPoller]] (Serve starts one by default) — the
      * shared-FS analog of the reference's NATS fan-out. */
    def append(event: String, payloadJson: String): Long = synchronized {
      var seq = lastSeq() + 1
      while (!claimSeq(seq)) seq += 1
      val p = new org.apache.hadoop.fs.Path(eventsDir, segName(seq, event))
      // write-then-RENAME publish: every reader filters on ".json", so
      // the ".w" temp is invisible until the atomic rename — a peer's
      // replay can never open a half-written payload (the torn read the
      // concurrent-checkpoint hammer exposed: "expected start of
      // object, got null" mid-append)
      val tmp = new org.apache.hadoop.fs.Path(eventsDir, segName(seq, event) + ".w")
      var published = false
      try {
        val out = fs.create(tmp, false)
        try out.write(payloadJson.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        published = fs.rename(tmp, p)
        if (!published)
          throw new java.io.IOException(s"could not publish event seq $seq")
      } finally if (!published) {
        // failed publish must not leave an orphaned .w inflating every
        // future listing (crash-left orphans are pruned below)
        try { fs.delete(tmp, false); () } catch { case _: java.io.IOException => }
      }
      // bound the claim-file count (FsWorkQueue.expire's analog):
      // periodically drop locks far below the current head. The 4096
      // margin covers listing-lagged writers on eventually-consistent
      // stores — a writer whose stale lastSeq() trails by less than the
      // margin still finds those locks present and skips past them.
      if (seq % 256 == 0) {
        try fs.listStatus(seqLocksDir)
          .filter(_.getPath.getName.takeWhile(_.isDigit).toLongOption
            .exists(_ <= seq - 4096))
          .foreach(st => fs.delete(st.getPath, false))
        catch { case _: java.io.IOException => () } // pruning is best-effort
        // crash-left .w temps (writer died between create and rename):
        // their claimed seqs are dead, so anything old is safe to drop
        try fs.listStatus(eventsDir)
          .filter(st => st.getPath.getName.endsWith(".w") &&
            st.getPath.getName.takeWhile(_.isDigit).toLongOption
              .exists(_ <= seq - 4096))
          .foreach(st => fs.delete(st.getPath, false))
        catch { case _: java.io.IOException => () }
      }
      seq
    }

    /** Events after `fromSeq`, in order. `limit` truncates BEFORE the
      * payload files are opened (filenames carry seq + event name), so
      * a batched reader (the /api/journal/events endpoint) never
      * parses more of the tail than it returns. */
    def read(fromSeq: Long, limit: Int = Int.MaxValue): Seq[Event] =
      fs.listStatus(eventsDir).toSeq
        .map(_.getPath)
        .filter(_.getName.endsWith(".json"))
        .map { p =>
          val name = p.getName.stripSuffix(".json")
          val seq = name.takeWhile(_.isDigit).toLong
          val event = name.dropWhile(_.isDigit).stripPrefix("-")
          (seq, event, p)
        }
        .filter(_._1 > fromSeq)
        .sortBy(_._1)
        .take(limit)
        .map { case (seq, event, p) =>
          val in = fs.open(p)
          val bytes =
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](8192)
              var n = in.read(chunk)
              while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
              buf.toByteArray
            } finally in.close()
          Event(seq, event, SchemaInfer.parseOrdered(
            new String(bytes, StandardCharsets.UTF_8)))
        }

    /** (ref: trackConsumerState / getConsumerStartSeq, state.go:110-163)
      *
      * CONSTRAINT: the checkpoint is a diagnostic applied-watermark,
      * never a resume cursor — every boot replays from seq 0 (StateApp
      * .boot, TaskRunLog.boot). That must stay true under the seq-claim
      * scheme: a writer that claims seq N and stalls can land its event
      * AFTER a peer has applied and checkpointed N+1, so resuming a
      * read at the checkpoint would permanently skip event N. Full
      * replay (with idempotent handlers) is immune to that gap. */
    def checkpoint(consumer: String, seq: Long): Unit = {
      val p = new org.apache.hadoop.fs.Path(consumersDir, consumer)
      // PER-CALL unique temp name: two NODES checkpoint the same
      // consumer concurrently (a writer's submit and a peer's tail
      // poll), and a shared ".tmp" name let one process rename the
      // other's temp away mid-flight (observed as FileNotFoundException
      // in the two-JVM convergence drill). Unique temps make the only
      // remaining race a rename-into-existing-dest, which one writer
      // wins — fine, because the checkpoint is a best-effort diagnostic
      // watermark, never a resume cursor (see constraint above).
      val tmp = new org.apache.hadoop.fs.Path(consumersDir,
        consumer + ".tmp." + java.util.UUID.randomUUID().toString)
      var renamed = false
      try {
        val out = fs.create(tmp, true)
        try out.write(seq.toString.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        fs.delete(p, false)
        renamed = fs.rename(tmp, p) // false (peer re-created p first) is benign
        ()
      } catch {
        case _: java.io.IOException => // best-effort: a lost race must
          // not fail the submit/poll that triggered the checkpoint
      } finally if (!renamed) { // successful rename already consumed tmp
        try { fs.delete(tmp, false); () } catch { case _: java.io.IOException => }
      }
    }

    /** Best-effort cursor read: a peer's concurrent checkpoint has a
      * delete→rename window where the file briefly does not exist — a
      * reader must see "0 for a moment", never throw. */

    def consumerSeq(consumer: String): Long = {
      val p = new org.apache.hadoop.fs.Path(consumersDir, consumer)
      try {
        if (!fs.exists(p)) 0L
        else {
          val in = fs.open(p)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
          finally in.close()
        }
      } catch {
        case _: java.io.FileNotFoundException => 0L // raced a checkpoint
      }
    }
  }

  /** Command-side invite claim (ref: ClaimInvite, users.go:594-641):
    * validate code, expiry, and email uniqueness BEFORE hashing the
    * password and journaling the claim event. Returns the new user id. */
  def claimInvite(store: MetaStore, submit: (String, String) => Boolean,
      code: String, name: String, password: String,
      inviteExpMillis: Long = 7L * 24 * 3600 * 1000,
      nowMillis: () => Long = () => System.currentTimeMillis()): Either[String, String] = {
    val invite = store.invites.get(code).getOrElse(return Left("invalid invite code"))
    if (nowMillis() - invite.createdAtMillis > inviteExpMillis)
      return Left("invite has expired")
    if (store.tokens.userByEmail(invite.email).isDefined)
      return Left("email is already registered")
    val userId = store.tokens.newId()
    val m = graft.render.Model
    val json = Seq(
      "\"code\":" + m.jsonValue(code),
      "\"email\":" + m.jsonValue(invite.email),
      "\"name\":" + m.jsonValue(name),
      "\"passwordHash\":" + m.jsonValue(graft.auth.Passwords.hash(password)),
      "\"userId\":" + m.jsonValue(userId)
    ).mkString("{", ",", "}")
    if (submit("claim_invite", json)) Right(userId)
    else Left("failed to submit claim invite state")
  }

  val ConsumerName = "internal_shaper_state_consumer" // (state.go:18)
  val TaskResultsConsumerName = "internal_task_results_consumer" // (state.go:19)

  /** Last run per task (the reference's task_runs row, upserted with
    * ON CONFLICT(task_id) DO UPDATE — last write wins). */
  final case class TaskRunMeta(taskId: String, startedAtMillis: Long,
      success: Boolean, totalDurationMs: Long, nextRunAtMillis: Option[Long],
      nextRunType: String)

  /** The task-results stream: a SECOND journal consumer with its own
    * checkpoint, like the reference's separate JetStream consumer for
    * publishTaskRunResult → trackTaskRun (schedule_task.go:176-295).
    * Events are idempotent last-write-per-task upserts. The journal
    * lives in a `task-results` SUBDIRECTORY of the given dir, so a
    * StateApp over the same base never races this writer's sequence
    * allocation (the reference separates the streams the same way);
    * instance methods are synchronized — task timers fire from
    * multiple scheduler threads. */
  final class TaskRunLog(dir: String) {
    val journal = new Journal(dir + "/task-results")
    val runs: mutable.LinkedHashMap[String, TaskRunMeta] = mutable.LinkedHashMap.empty

    private def applyEvent(payload: JObject): Boolean = {
      val taskId = str(payload, "taskId")
      if (taskId.isEmpty) return false
      runs(taskId) = TaskRunMeta(taskId,
        millis(payload, "startedAt"),
        payload.map.get("success").collect { case JBool(b) => b }.getOrElse(false),
        payload.map.get("totalDurationMs").collect { case JNumber(n) => n.toLong }.getOrElse(0L),
        payload.map.get("nextRunAt").collect { case JNumber(n) => n.toLong },
        str(payload, "nextRunType"))
      true
    }

    /** Full-journal replay, like [[StateApp.boot]]: the runs map is
      * in-memory, so a fresh process must not resume from the cursor.
      * Upserts are last-write-per-task — replay converges. */
    def boot(): Int = synchronized {
      var applied = 0
      var lastSeq = 0L
      journal.read(0L).foreach { e =>
        if (e.event == "task_run_result" && applyEvent(e.payload)) {
          lastSeq = e.seq
          applied += 1
        }
      }
      if (applied > 0) journal.checkpoint(TaskResultsConsumerName, lastSeq)
      applied
    }

    /** (ref: publishTaskRunResult payload, schedule_task.go:18-25) */
    def publish(taskId: String, startedAtMillis: Long, success: Boolean,
        totalDurationMs: Long, nextRunAtMillis: Option[Long],
        nextRunType: String): Unit = synchronized {
      val m = graft.render.Model
      val fields = Seq.newBuilder[String]
      fields += "\"taskId\":" + m.jsonValue(taskId)
      fields += "\"startedAt\":" + startedAtMillis
      fields += "\"success\":" + success
      fields += "\"totalDurationMs\":" + totalDurationMs
      nextRunAtMillis.foreach(t => fields += "\"nextRunAt\":" + t)
      if (nextRunType.nonEmpty) fields += "\"nextRunType\":" + m.jsonValue(nextRunType)
      val json = fields.result().mkString("{", ",", "}")
      val seq = journal.append("task_run_result", json)
      if (applyEvent(SchemaInfer.parseOrdered(json)))
        journal.checkpoint(TaskResultsConsumerName, seq)
    }

    def lastRun(taskId: String): Option[TaskRunMeta] = synchronized { runs.get(taskId) }
  }

  /** Journal + store + checkpointed apply loop — the reference's
    * SubmitState → HandleState round trip. [[pollOnce]] gives a
    * multi-node deployment LIVE convergence (the reference gets this
    * from NATS fan-out): peers detect each other's appends from one
    * directory listing and re-replay. */
  final class StateApp(dir: String,
      val store: MetaStore = new MetaStore()) {
    val journal = new Journal(dir)

    /** Journal head (max seq, event count) as of the last boot/submit —
      * what [[pollOnce]] compares against a fresh listing. Count AND
      * max seq: a stalled peer can land a claimed seq BELOW our
      * observed head, which only the count detects. */
    private var seenHead: (Long, Int) = (0L, 0)

    /** Rebuild the in-memory store by replaying the FULL journal. The
      * reference resumes from its consumer cursor because the
      * materialized view lives in SQLite; here the view is in-memory
      * and a fresh process starts empty, so resuming from the cursor
      * would silently drop all pre-restart state. Handlers are
      * idempotent (INSERT OR IGNORE creates, last-write updates), so a
      * replay over an already-warm store converges; the checkpoint is
      * still advanced as the applied-watermark diagnostic. */
    def boot(): Int = synchronized {
      val events = journal.read(0L)
      var applied = 0
      var lastSeq = 0L
      events.foreach { e =>
        if (store.apply(e.event, e.payload)) {
          lastSeq = e.seq
          applied += 1
        }
      }
      // once, after the loop: per-event checkpointing is ~5 FS metadata
      // ops each — O(journal) rewrites of a purely diagnostic cursor
      if (applied > 0) journal.checkpoint(ConsumerName, lastSeq)
      seenHead = (events.lastOption.map(_.seq).getOrElse(0L), events.size)
      applied
    }

    /** Journal-first write, then apply + checkpoint (SubmitState). */
    def submit(event: String, payloadJson: String): Boolean = synchronized {
      val seq = journal.append(event, payloadJson)
      val ok = store.apply(event,
        SchemaInfer.parseOrdered(payloadJson))
      if (ok) journal.checkpoint(ConsumerName, seq)
      seenHead = (math.max(seenHead._1, seq), seenHead._2 + 1)
      ok
    }

    /** Tail poll: one listing against the remembered head; on ANY
      * change, a full idempotent replay (never a from-cursor resume —
      * see the checkpoint constraint note: a stalled peer's append can
      * land below an applied watermark, and only full replay is immune
      * to that gap). Returns the number of newly observed events
      * (0 = no change). Cost when idle: one directory listing. */
    def pollOnce(): Int = synchronized {
      val head = journal.headState()
      if (head == seenHead) 0
      else {
        val before = seenHead._2
        boot()
        math.max(0, seenHead._2 - before)
      }
    }
  }

  /** Daemon-thread tail poller for multi-node serve: node B applies
    * node A's journal writes within `intervalMillis` of landing, so a
    * dashboard deployed on A renders on B without a reboot — the
    * engine-side analog of the reference's NATS fan-out (comms.go).
    * `onApplied` runs after each poll that observed new events (Serve
    * uses it to reconcile task schedules). */
  final class JournalTailPoller(app: StateApp, intervalMillis: Long = 2000,
      onApplied: Int => Unit = _ => ()) extends AutoCloseable {
    private val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-journal-tail"); t.setDaemon(true); t
    })

    def start(): Unit = {
      exec.scheduleWithFixedDelay(new Runnable {
        def run(): Unit =
          // a transient FS fault must not kill the poll chain
          try { val n = app.pollOnce(); if (n > 0) onApplied(n) }
          catch { case e: Exception =>
            System.err.println(s"[journal-tail] poll failed: ${e.getMessage}")
          }
      }, intervalMillis, intervalMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
      ()
    }

    override def close(): Unit = exec.shutdownNow()
  }
}
