package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Forked child for RebootSpec: each invocation is a REAL serve-style
  * boot in its own JVM/SparkContext (an in-process "reboot" can't shed
  * the shared external catalog). `first` writes state the way a running
  * server does — journal-first dashboard create + a managed table in
  * the warehouse; `second` boots fresh and proves the reboot contract:
  * journal replay restores the dashboard, Tables.registerWarehouse
  * restores table visibility, and the dashboard renders over the
  * pre-reboot data. */
object RebootChild {
  def main(args: Array[String]): Unit = {
    val Array(mode, warehouse, stateDir, outFile) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val app = new graft.state.StateJournal.StateApp(stateDir)
      app.boot()
      mode match {
        case "first" =>
          spark.range(30).selectExpr("CAST(id % 3 AS STRING) AS kind")
            .write.saveAsTable("reboot_e2e_t")
          val ok = app.submit("create_dashboard",
            """{"id":"rb1","name":"Reboot Board","content":"SELECT kind, count(*) AS n FROM reboot_e2e_t GROUP BY kind ORDER BY kind;","timestamp":1}""")
          Files.write(Paths.get(outFile),
            (if (ok) "FIRST_OK" else "FIRST_SUBMIT_FAILED").getBytes(UTF_8))
        case "second" =>
          val recovered = Tables.registerWarehouse(spark)
          val dash = app.store.getDashboard("rb1")
          val result = dash match {
            case None => "NO_DASHBOARD"
            case Some(d) =>
              val r = graft.interp.Dashboard.run(spark, d.content,
                graft.interp.Dashboard.RunConfig(dashboardId = d.id))
              val rows = r.sections.flatMap(_.queries).flatMap(_.rows)
              s"SECOND_OK recovered=${recovered.sorted.mkString(",")} rows=${rows.length} " +
                rows.map(_.mkString(":")).mkString(";")
          }
          Files.write(Paths.get(outFile), result.getBytes(UTF_8))
      }
    } finally spark.stop()
  }
}

/** Forked child for the LIVE convergence drill: `reader` boots with an
  * empty journal, starts a JournalTailPoller, signals readiness, and
  * waits for a PEER's dashboard to arrive without rebooting; `writer`
  * submits it from a second JVM. */
object LiveConvChild {
  def main(args: Array[String]): Unit = {
    val Array(mode, stateDir, outFile, readyFile) = args
    mode match {
      case "writer" =>
        val app = new graft.state.StateJournal.StateApp(stateDir)
        app.boot()
        val ok = app.submit("create_dashboard",
          """{"id":"lc1","name":"Live Board","content":"SELECT 'Live'::LABEL;\nSELECT 41 + 1 AS x;","timestamp":5}""")
        Files.write(Paths.get(outFile),
          (if (ok) "WRITER_OK" else "WRITER_FAILED").getBytes(UTF_8))
      case "reader" =>
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[2]")
          .config("spark.sql.shuffle.partitions", "2")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        try {
          val app = new graft.state.StateJournal.StateApp(stateDir)
          app.boot()
          val poller = new graft.state.StateJournal.JournalTailPoller(app, 100)
          poller.start()
          Files.write(Paths.get(readyFile), "READY".getBytes(UTF_8))
          // generous: under a full parallel `sbt test` the writer JVM's
          // boot alone can take tens of seconds of contended CPU
          val deadline = System.currentTimeMillis() + 150000
          var dash: Option[graft.state.StateJournal.DashboardMeta] = None
          while (dash.isEmpty && System.currentTimeMillis() < deadline) {
            dash = app.store.getDashboard("lc1")
            if (dash.isEmpty) Thread.sleep(50)
          }
          val result = dash match {
            case None => "READER_TIMEOUT"
            case Some(d) =>
              // render the peer-deployed dashboard — the GetResult core
              val r = graft.interp.Dashboard.run(spark, d.content,
                graft.interp.Dashboard.RunConfig(dashboardId = d.id))
              val rows = r.sections.flatMap(_.queries).flatMap(_.rows)
              s"READER_OK rows=${rows.map(_.mkString(":")).mkString(";")}"
          }
          poller.close()
          Files.write(Paths.get(outFile), result.getBytes(UTF_8))
        } finally spark.stop()
    }
  }
}

/** Forked children for the CHURN convergence drill (r6 verdict #6): the
  * one-shot live drill above proves a single peer append converges; this
  * one hammers the cross-node path the 23fcdae races lived on — two
  * writer JVMs concurrently appending ~150 mixed create/update/delete
  * events to the shared journal while a reader JVM tails it live. The
  * reader must converge to the exact expected state (computed
  * independently by the spec): half-written appends, checkpoint temp
  * renames, or dropped events all show up as a summary mismatch. */
object ChurnConvChild {
  def main(args: Array[String]): Unit = {
    args(0) match {
      case "writer" =>
        val Array(_, stateDir, outFile, prefix) = args
        val app = new graft.state.StateJournal.StateApp(stateDir)
        app.boot()
        var ok = true
        (1 to 50).foreach { i =>
          ok &= app.submit("create_dashboard",
            s"""{"id":"${prefix}_$i","name":"D $i","content":"SELECT $i AS x;","timestamp":$i}""")
          if (i % 3 == 0) // update a recent create (may later be deleted)
            ok &= app.submit("update_dashboard_content",
              s"""{"id":"${prefix}_${i - 2}","content":"SELECT ${i * 1000} AS x;","timestamp":${i + 1}}""")
          if (i % 5 == 0) // delete an older one (update-after-delete no-ops)
            ok &= app.submit("delete_dashboard", s"""{"id":"${prefix}_${i - 4}"}""")
        }
        Files.write(Paths.get(outFile),
          (if (ok) "WRITER_OK" else "WRITER_FAILED").getBytes(UTF_8))
      case "reader" =>
        val Array(_, stateDir, outFile, readyFile, expectedFile) = args
        val app = new graft.state.StateJournal.StateApp(stateDir)
        app.boot()
        val poller = new graft.state.StateJournal.JournalTailPoller(app, 50)
        poller.start()
        Files.write(Paths.get(readyFile), "READY".getBytes(UTF_8))
        val expected = new String(Files.readAllBytes(Paths.get(expectedFile)), UTF_8)
        def summary(): String = app.store.synchronized {
          app.store.dashboards.toSeq
            .map { case (id, d) => s"$id=${d.content}" }.sorted.mkString(";")
        }
        val deadline = System.currentTimeMillis() + 150000
        var cur = summary()
        while (cur != expected && System.currentTimeMillis() < deadline) {
          Thread.sleep(50)
          cur = summary()
        }
        poller.close()
        Files.write(Paths.get(outFile),
          (if (cur == expected) "READER_OK" else s"READER_TIMEOUT got=$cur")
            .getBytes(UTF_8))
    }
  }
}

/** The serve reboot contract, across two real JVMs sharing a warehouse
  * and state dir: everything a running server accumulated — journaled
  * control-plane state AND managed table data — must be served again
  * by the next process (ref: the DuckDB+SQLite files give the
  * reference this for free; the Spark analog is journal replay +
  * warehouse re-registration). */
class RebootSpec extends AnyFunSuite {

  test("second JVM serves the first JVM's dashboard over its ingested table") {
    val tmp = Files.createTempDirectory("graft-reboot")
    val warehouse = tmp.resolve("wh").toString
    val stateDir = tmp.resolve("state").toString
    try {
      val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      def boot(mode: String): String = {
        val out = tmp.resolve(s"out-$mode.txt")
        val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
          "graft.RebootChild", mode, warehouse, stateDir, out.toString)
        val proc = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true)
          .redirectOutput(tmp.resolve(s"log-$mode.txt").toFile)
          .start()
        assert(proc.waitFor() == 0, s"$mode boot failed: " + new String(
          Files.readAllBytes(tmp.resolve(s"log-$mode.txt")), UTF_8).takeRight(800))
        new String(Files.readAllBytes(out), UTF_8)
      }
      assert(boot("first") == "FIRST_OK")
      val second = boot("second")
      assert(second.startsWith("SECOND_OK"), second)
      assert(second.contains("reboot_e2e_t"), s"table not re-registered: $second")
      // the dashboard's groupBy over the restored table: 3 kinds × 10
      assert(second.contains("rows=3") && second.contains("0:10") &&
        second.contains("1:10") && second.contains("2:10"), second)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("churn convergence: reader converges live while two writer JVMs hammer the journal") {
    val tmp = Files.createTempDirectory("graft-churnconv")
    val stateDir = tmp.resolve("state").toString
    try {
      // expected final state, simulated independently of the journal:
      // per-writer event order is program order, and the two writers
      // only ever touch their own id prefix, so the fixpoint is
      // deterministic under ANY cross-writer interleaving
      val expected = {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
        for (prefix <- Seq("chA", "chB"); i <- 1 to 50) {
          m(s"${prefix}_$i") = s"SELECT $i AS x;"
          if (i % 3 == 0 && m.contains(s"${prefix}_${i - 2}"))
            m(s"${prefix}_${i - 2}") = s"SELECT ${i * 1000} AS x;"
          if (i % 5 == 0) m.remove(s"${prefix}_${i - 4}")
        }
        m.toSeq.map { case (id, c) => s"$id=$c" }.sorted.mkString(";")
      }
      Files.write(tmp.resolve("expected.txt"), expected.getBytes(UTF_8))
      val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      def launch(mode: String, tag: String, extra: String*): Process = {
        val out = tmp.resolve(s"out-$tag.txt").toString
        val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx1g", "-cp", cp,
          "graft.ChurnConvChild", mode, stateDir, out) ++ extra
        new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true)
          .redirectOutput(tmp.resolve(s"log-$tag.txt").toFile)
          .start()
      }
      val reader = launch("reader", "reader",
        tmp.resolve("ready.txt").toString, tmp.resolve("expected.txt").toString)
      val deadline = System.currentTimeMillis() + 180000
      while (!Files.exists(tmp.resolve("ready.txt")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Files.exists(tmp.resolve("ready.txt")), "reader never became ready")
      // both writers at full speed, concurrently
      val wA = launch("writer", "writerA", "chA")
      val wB = launch("writer", "writerB", "chB")
      assert(wA.waitFor() == 0, "writer A JVM failed: " + new String(
        Files.readAllBytes(tmp.resolve("log-writerA.txt")), UTF_8).takeRight(800))
      assert(wB.waitFor() == 0, "writer B JVM failed: " + new String(
        Files.readAllBytes(tmp.resolve("log-writerB.txt")), UTF_8).takeRight(800))
      assert(new String(Files.readAllBytes(tmp.resolve("out-writerA.txt")), UTF_8) == "WRITER_OK")
      assert(new String(Files.readAllBytes(tmp.resolve("out-writerB.txt")), UTF_8) == "WRITER_OK")
      assert(reader.waitFor() == 0, "reader JVM failed: " + new String(
        Files.readAllBytes(tmp.resolve("log-reader.txt")), UTF_8).takeRight(800))
      val out = new String(Files.readAllBytes(tmp.resolve("out-reader.txt")), UTF_8)
      assert(out == "READER_OK", out.take(2000))
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => { Files.deleteIfExists(p); () })
    }
  }

  test("live convergence: node B renders node A's new dashboard WITHOUT rebooting") {
    val tmp = Files.createTempDirectory("graft-liveconv")
    val stateDir = tmp.resolve("state").toString
    try {
      val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      def launch(mode: String, extra: String*): Process = {
        val out = tmp.resolve(s"out-$mode.txt").toString
        val ready = tmp.resolve("ready.txt").toString
        val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g", "-cp", cp,
          "graft.LiveConvChild", mode, stateDir, out, ready)
        new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true)
          .redirectOutput(tmp.resolve(s"log-$mode.txt").toFile)
          .start()
      }
      // reader first: it must be RUNNING (booted on an empty journal,
      // poller armed) before the writer's event exists
      val reader = launch("reader")
      val deadline = System.currentTimeMillis() + 180000
      while (!Files.exists(tmp.resolve("ready.txt")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Files.exists(tmp.resolve("ready.txt")), "reader never became ready")
      val writer = launch("writer")
      val writerExit = writer.waitFor()
      assert(writerExit == 0, s"writer JVM failed (exit $writerExit): " +
        new String(Files.readAllBytes(tmp.resolve("log-writer.txt")), UTF_8)
          .takeRight(1500))
      assert(new String(Files.readAllBytes(tmp.resolve("out-writer.txt")), UTF_8) == "WRITER_OK")
      assert(reader.waitFor() == 0, "reader JVM failed: " + new String(
        Files.readAllBytes(tmp.resolve("log-reader.txt")), UTF_8).takeRight(800))
      val out = new String(Files.readAllBytes(tmp.resolve("out-reader.txt")), UTF_8)
      assert(out == "READER_OK rows=42", out)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => { Files.deleteIfExists(p); () })
    }
  }
}
