package graft

import graft.queries.{PipelineOps, SkewLab}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measures the dedup skew crossover SKEW.md documents: d03 (direct
  * inverted-index jaccard) vs d09 (PPJoin prefix filter) vs d10
  * (df-capped winnowing) on a uniform corpus and on hot-shingle
  * corpora where a boilerplate header appears on 10% / 30% of docs.
  *
  * Corpora are written to parquet first so every measurement starts
  * from a real scan (not an in-memory local relation). Each cell is
  * the min of two timed passes after one untimed warmup, the same
  * discipline as Bench. Prints one JSON line.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
  *        java … graft.SkewBench
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val docs = Tables.t(spark, sfDir, "documents")
    def writeCorpus(name: String, df: DataFrame): DataFrame = {
      val p = s"$base/$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // 40 header words → 38 hot shingles; everyK 10 / 3 → df ≈ N/10, N/3
    val corpora = Seq(
      "uniform" -> writeCorpus("uniform", docs),
      "hot10" -> writeCorpus("hot10", SkewLab.skewedCorpus(docs, 10, 40)),
      "hot30" -> writeCorpus("hot30", SkewLab.skewedCorpus(docs, 3, 40)))

    def timed(fn: => Long): (Double, Long) = {
      fn // warmup (untimed): plan compilation + codegen
      def pass(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = fn
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (ta, na) = pass()
      val (tb, _) = pass()
      (math.min(ta, tb), na)
    }

    import java.util.Locale
    def f3(v: Double): String = "%.3f".formatLocal(Locale.ROOT, v)
    val cells = collection.mutable.LinkedHashMap.empty[String, String]
    corpora.foreach { case (cname, c) =>
      val (t03, n03) = timed(PipelineOps.exactJaccardPairsOf(c, 0.5).count())
      val (t09, n09) = timed(PipelineOps.prefixFilterJaccardOf(c, 0.5).count())
      val (t10, n10) = timed(PipelineOps.winnowingDedupOf(c, 20, 8).count())
      require(n03 == n09, s"$cname: d09 output $n09 != d03 output $n03")
      cells(s"${cname}_d03") = f3(t03)
      cells(s"${cname}_d09") = f3(t09)
      cells(s"${cname}_d10cap") = f3(t10)
      cells(s"${cname}_pairs") = n03.toString
      cells(s"${cname}_d10pairs") = n10.toString
      cells(s"${cname}_d03_join_rows") = SkewLab.d03JoinRows(c).toString
      cells(s"${cname}_d09_join_rows") = SkewLab.d09JoinRows(c, 0.5).toString
      cells(s"${cname}_d10cap_join_rows") = SkewLab.d10JoinRows(c, 20).toString
      cells(s"${cname}_d10nocap_join_rows") = SkewLab.d10JoinRows(c, Int.MaxValue).toString
      System.err.println(s"[skew] $cname done: d03=${f3(t03)}s d09=${f3(t09)}s d10cap=${f3(t10)}s")
    }
    // the uncapped d10 leg runs only on hot10: its candidate set is
    // every hot-doc pair, and the verify stage alone re-expands each —
    // hot30 would be minutes of deliberate melt for no extra signal
    val hot10 = corpora.find(_._1 == "hot10").get._2
    val (t10no, n10no) = timed(
      PipelineOps.winnowingDedupOf(hot10, Int.MaxValue, 8).count())
    cells("hot10_d10nocap") = f3(t10no)
    cells("hot10_d10nocap_pairs") = n10no.toString

    val qs = cells.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"skew_crossover","unit":"sec","sf":"${new java.io.File(sfDir).getName}","cells":$qs}""")
    spark.stop()
  }
}
