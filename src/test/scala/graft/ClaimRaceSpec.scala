package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Forked child: contends on a shared FsWorkQueue claim dir and records
  * which (task, runAt) claims it won. Spun up by ClaimRaceSpec as a
  * REAL second/third JVM — the in-process TasksSpec coverage can't see
  * cross-process create-exclusive races (the exact bug Hadoop's
  * LocalFileSystem.createNewFile non-atomicity would cause). */
object ClaimRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(claimDir, outFile, nKeys, order) = args
    val q = new graft.tasks.FsWorkQueue(claimDir,
      new org.apache.hadoop.conf.Configuration())
    // start barrier: both children spin here until the parent drops the
    // flag, so claims genuinely overlap instead of running serially
    val start = Paths.get(claimDir, "START")
    val deadline = System.currentTimeMillis() + 30000
    while (!Files.exists(start)) {
      if (System.currentTimeMillis() > deadline) sys.exit(3)
      Thread.sleep(2)
    }
    val idx = 0 until nKeys.toInt
    val seq = if (order == "reverse") idx.reverse else idx
    val wins = seq.filter(i => q.tryClaim(s"task$i", 1000000L + i))
    Files.write(Paths.get(outFile),
      wins.sorted.mkString(",").getBytes(UTF_8))
  }
}

/** VERDICT r4 #5: exercise the work-queue claim across real JVMs.
  * Two forked processes race the same 200 (task, runAt) keys against
  * one claim dir; exactly one process may win each key — the
  * MaxMsgsPerSubject=1 guarantee the scheduler's `single` runs rely on
  * (ref: schedule_task.go:144-241 NATS work-queue semantics). */
class ClaimRaceSpec extends AnyFunSuite {

  test("two JVMs claiming one dir: every key claimed exactly once") {
    val tmp = Files.createTempDirectory("graft-claim-race")
    val nKeys = 200
    try {
      val java = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      def spawn(tag: String, order: String): Process = {
        val out = tmp.resolve(s"wins-$tag.txt").toString
        new ProcessBuilder(java, "-cp", cp, "graft.ClaimRaceChild",
          tmp.toString, out, nKeys.toString, order)
          .redirectErrorStream(true)
          .redirectOutput(tmp.resolve(s"log-$tag.txt").toFile)
          .start()
      }
      val a = spawn("a", "forward")
      val b = spawn("b", "reverse")
      // both children are spinning on the barrier; release them together
      Thread.sleep(1500)
      Files.write(tmp.resolve("START"), Array.emptyByteArray)
      assert(a.waitFor() == 0, "child A failed: " +
        new String(Files.readAllBytes(tmp.resolve("log-a.txt")), UTF_8).takeRight(500))
      assert(b.waitFor() == 0, "child B failed: " +
        new String(Files.readAllBytes(tmp.resolve("log-b.txt")), UTF_8).takeRight(500))
      def wins(tag: String): Set[Int] = {
        val s = new String(Files.readAllBytes(tmp.resolve(s"wins-$tag.txt")), UTF_8).trim
        if (s.isEmpty) Set.empty else s.split(",").map(_.toInt).toSet
      }
      val wa = wins("a")
      val wb = wins("b")
      // exactly-once: disjoint, and together they cover every key
      assert((wa & wb).isEmpty, s"double-claimed keys: ${(wa & wb).toSeq.sorted.take(10)}")
      assert(wa.size + wb.size == nKeys,
        s"lost keys: A=${wa.size} B=${wb.size}, expected $nKeys total")
      assert((wa | wb) == (0 until nKeys).toSet)
      // with a start barrier both processes should win SOME claims —
      // a 200/0 split would mean the race never actually overlapped
      // (not asserted hard: scheduling can legitimately starve one side)
      info(s"split: A=${wa.size} B=${wb.size}")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => { Files.deleteIfExists(p); () })
    }
  }
}
