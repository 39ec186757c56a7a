package graft

import graft.queries.{PipelineOps, SkewLab}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The dedup skew story, demonstrated instead of argued (SKEW.md holds
  * the wall-clock numbers; this spec pins the candidate bounds).
  *
  * Fixture: the sf0.01 documents corpus with a 40-word boilerplate
  * header prepended to every 3rd doc — the "crawl with a mirrored
  * banner" case, 38 hot shingles with df ≈ N/3 each. On it:
  *  - d03's inverted-index self-join explodes by Σ C(df,2) per hot
  *    shingle (the f² law);
  *  - d09's prefix filter excludes hot shingles from every doc's join
  *    set by construction, so its join stays near the uniform cost;
  *  - d10's df-cap drops hot fingerprints before the index join.
  * And the remedies stay EXACT: d09's verified output equals d03's on
  * the skewed corpus, where the header manufactures new true near-dup
  * pairs (short docs dominated by the shared header).
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val uniform = Tables.t(spark, sfDir, "documents")
  private lazy val skewed = SkewLab.skewedCorpus(uniform, 3, 40)

  test("hot shingles explode d03's join quadratically; d09's prefix join stays bounded") {
    val d03Unif = SkewLab.d03JoinRows(uniform)
    val d03Skew = SkewLab.d03JoinRows(skewed)
    val d09Unif = SkewLab.d09JoinRows(uniform, 0.5)
    val d09Skew = SkewLab.d09JoinRows(skewed, 0.5)
    // 38 hot shingles × C(167, 2) ≈ 527k extra rows for d03 (sf0.01:
    // 14k → 541k); the analytic floor keeps the assertion corpus-robust
    assert(d03Skew > 20 * d03Unif,
      s"d03 join rows did not explode under skew: $d03Unif -> $d03Skew")
    // d09 joins only prefix (rarest-df) shingles: hot keys are in
    // nobody's prefix, so its join grows additively, not quadratically
    assert(d09Skew < d03Skew / 20,
      s"d09 join rows not bounded vs d03 under skew: $d09Skew vs $d03Skew")
    assert(d09Skew < 10 * d09Unif,
      s"d09 join rows exploded under skew: $d09Unif -> $d09Skew")
  }

  test("d10's df-cap keeps the fingerprint join flat under skew; uncapped it explodes") {
    val capUnif = SkewLab.d10JoinRows(uniform, 20)
    val capSkew = SkewLab.d10JoinRows(skewed, 20)
    val nocapSkew = SkewLab.d10JoinRows(skewed, Int.MaxValue)
    // every header fingerprint has df ≈ N/3 > 20 → dropped pre-join
    assert(capSkew < (capUnif * 3) / 2,
      s"df-capped join rows not flat under skew: $capUnif -> $capSkew")
    assert(nocapSkew > 10 * capSkew,
      s"uncapped join rows did not explode: $nocapSkew vs capped $capSkew")
  }

  test("incremental path under skew: d14's cross join explodes, d15's stays bounded and exact") {
    import org.apache.spark.sql.functions.col
    def cut(df: org.apache.spark.sql.DataFrame) =
      (df.filter(col("doc_id") % 7 === 3), df.filter(col("doc_id") % 7 =!= 3))
    val (bu, cu) = cut(uniform)
    val (bs, cs) = cut(skewed)
    val d14Unif = SkewLab.d14JoinRows(bu, cu)
    val d14Skew = SkewLab.d14JoinRows(bs, cs)
    val d15Skew = SkewLab.d15JoinRows(bs, cs, 0.5)
    // every hot shingle contributes (hot batch docs)·(hot corpus docs)
    // cross rows — the incremental face of the f² law
    assert(d14Skew > 10 * d14Unif,
      s"d14 cross-join rows did not explode under skew: $d14Unif -> $d14Skew")
    // the corpus-df prefix keeps hot grams out of BOTH sides' prefixes
    assert(d15Skew < d14Skew / 10,
      s"d15 join rows not bounded vs d14 under skew: $d15Skew vs $d14Skew")
    // and the remedy stays exact on the adversarial corpus
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(PipelineOps.crossJaccardPairsSkewRobustOf(bs, cs, 0.5)) ==
      key(PipelineOps.crossJaccardPairsOf(bs, cs, 0.5)))
  }

  test("d09 stays exact under skew: verified output equals d03's") {
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d03 = key(PipelineOps.exactJaccardPairsOf(skewed, 0.5))
    val d09 = key(PipelineOps.prefixFilterJaccardOf(skewed, 0.5))
    assert(d03 == d09)
    // the skewed fixture is adversarial, not degenerate: the header
    // manufactures NEW true pairs (short docs dominated by it), so the
    // equality above is exercised on skew-specific output too
    assert(key(PipelineOps.exactJaccardPairsOf(uniform, 0.5)) != d03)
  }
}
