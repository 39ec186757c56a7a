package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off kernel-level scaling probe for BENCH_SF1.json measurements
  * where the oracled entry's fixed parameters deliberately do NOT model
  * production (e.g. d17 pins K=8 for the oracle; SemDeDup at scale
  * grows K with the corpus so per-cluster pair cost stays flat). Runs a
  * named kernel through the PUBLIC facade with caller parameters,
  * min-of-2 timed passes after one untimed warmup — the same protocol
  * as the SPARK_GRAFT_ONLY Bench runs it is compared against.
  *
  * Usage: ScaleProbe <sfDir> semdedup <k> <tau>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(): Long = args(1) match {
      case "semdedup" =>
        val emb = Tables.t(spark, sfDir, "embeddings")
        graft.pipeline.Similarity
          .semDedup(emb, k = args(2).toInt, tau = args(3).toDouble)
          .count()
      case "bitext" =>
        // the s12 PRODUCTION config: ANN candidate generation with
        // kmeans clusters — K scales with the corpus (args: k tau
        // probes clusters), the d17 K-scaling protocol
        val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "lang")
        val emb = Tables.t(spark, sfDir, "embeddings")
        def side(lang: String) = emb
          .join(docs.filter(col("lang") === lang), col("vec_id") === col("doc_id"))
          .select(col("vec_id"), col("embedding"))
        graft.pipeline.Similarity.bitextMineAnn(side("de"), side("en"),
          k = args(2).toInt, tau = args(3).toDouble,
          probes = args(4).toInt, clusters = args(5).toInt)
          .count()
      case "knngraph" =>
        // the s18 PRODUCTION config: K scales with the corpus so
        // per-cell pair cost stays flat (args: k topK) — the d17
        // K-scaling protocol
        val emb = Tables.t(spark, sfDir, "embeddings")
        graft.pipeline.Similarity
          .knnGraph(emb, k = args(2).toInt, topK = args(3).toInt)
          .count()
      case other => sys.error(s"unknown kernel: $other")
    }
    run() // warmup pass: plan compilation + codegen
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime(); val n = run()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[probe] ${args.mkString(" ")}: min=${times.map(_._1).min}%.3f s " +
      f"(passes ${times.map(t => f"${t._1}%.3f").mkString(", ")}; rows=${times.head._2})")
    spark.stop()
  }
}
