package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew instrumentation for the dedup family (d03 / d09 / d10).
  *
  * The 100 TB dedup story rests on a claim: d03's direct inverted-index
  * join melts on a skewed corpus (a hot shingle with document frequency
  * f expands f² join rows), while d09's PPJoin prefix filter and d10's
  * df-cap exclude hot keys from the join by construction. This object
  * makes that claim measurable:
  *
  *  - [[skewedCorpus]] builds the adversarial fixture — a fixed
  *    boilerplate header (the "mirrored crawl banner" case) prepended
  *    to every K-th document, so each header shingle's df is exactly
  *    the hot-doc count;
  *  - the `*JoinRows` counters report how many rows each operator's
  *    index self-join would materialize, computed ANALYTICALLY as
  *    Σ_key C(df_key, 2) from the key histogram — exact for an
  *    `a.id < b.id` equi-self-join, and computable without running the
  *    explosion being measured.
  *
  * SKEW.md holds the measured wall-clock crossover; SkewSpec pins the
  * candidate bounds as a regression test.
  */
object SkewLab {

  /** Every `everyK`-th document gets the same `headerWords`-word
    * boilerplate header prepended. Header tokens (`hdrw0 hdrw1 …`) are
    * outside the corpus vocabulary, so exactly `headerWords - 2` new
    * 3-gram shingles appear, each with df = ceil(N / everyK), and no
    * existing shingle's frequency changes. */
  def skewedCorpus(docs: DataFrame, everyK: Int, headerWords: Int): DataFrame = {
    val header = (0 until headerWords).map(i => s"hdrw$i").mkString(" ")
    docs.withColumn("text",
      when(col("doc_id") % everyK === 0, concat(lit(header + " "), col("text")))
        .otherwise(col("text")))
  }

  /** Join rows d03's inverted-index self-join materializes. */
  def d03JoinRows(docs: DataFrame): Long =
    selfJoinRows(PipelineOps.shingles(docs), "sh")

  /** Join rows d09's prefix self-join materializes (upper bound: the
    * AllPairs size filter prunes further at execution). */
  def d09JoinRows(docs: DataFrame, thr: Double): Long =
    selfJoinRows(PipelineOps.prefixRanked(PipelineOps.shingles(docs), thr), "sh")

  /** Join rows d10's fingerprint-index self-join materializes under
    * `dfCap` (pass Int.MaxValue for the uncapped form). */
  def d10JoinRows(docs: DataFrame, dfCap: Int): Long = {
    val hist = PipelineOps.winnowingFps(docs)
      .groupBy("fp").agg(count(lit(1)).as("n"))
      .filter(col("n") <= dfCap)
    sumPairs(hist)
  }

  /** Join rows d14's batch×corpus gram join materializes: Σ_sh
    * bdf·cdf over the two sides' gram histograms. */
  def d14JoinRows(batch: DataFrame, corpus: DataFrame): Long =
    crossRows(PipelineOps.shingles(batch), PipelineOps.shingles(corpus))

  /** Join rows d15's prefix×prefix cross join materializes (upper
    * bound: the AllPairs size filter prunes further at execution). */
  def d15JoinRows(batch: DataFrame, corpus: DataFrame, thr: Double): Long = {
    val bsh = PipelineOps.shingles(batch)
    val csh = PipelineOps.shingles(corpus)
    val dfTab = csh.groupBy("sh").agg(count(lit(1)).as("cdf"))
    crossRows(PipelineOps.corpusDfRanked(bsh, dfTab, thr),
      PipelineOps.corpusDfRanked(csh, dfTab, thr))
  }

  /** Σ_sh na·nb over two gram histograms — the exact row count of the
    * batch-side × corpus-side equi-join on sh. */
  private def crossRows(a: DataFrame, b: DataFrame): Long =
    a.groupBy("sh").agg(count(lit(1)).as("na"))
      .join(b.groupBy("sh").agg(count(lit(1)).as("nb")), "sh")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("r"))
      .head.getLong(0)

  /** Σ_key C(df, 2) over the key histogram of `df` — the exact row
    * count of an `a.key = b.key AND a.id < b.id` self-join. */
  private def selfJoinRows(rows: DataFrame, key: String): Long =
    sumPairs(rows.groupBy(key).agg(count(lit(1)).as("n")))

  private def sumPairs(hist: DataFrame): Long =
    hist.agg(coalesce(sum(expr("n * (n - 1) DIV 2")), lit(0L)).as("r"))
      .head.getLong(0)
}
