package graft.exprs

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions}
import org.apache.spark.sql.expressions.Aggregator

/** BOXPLOT(val) aggregate — port of the reference's SQL macro
  * (ref: server/core/custom_types.go:102-134). Without the
  * `outlier_info` argument the macro's ELSE branch applies: plain
  * max/min plus exact linear-interpolation quartiles (DuckDB
  * quantile_cont semantics). The outlier_info variant (Tukey 1.5·IQR
  * whiskers + outlier list) is modeled by `BoxplotResult.outliers`,
  * emitted empty here — matching the reference's no-info branch.
  *
  * Output struct field order (max, min, outliers, q1, q2, q3) is what
  * the render layer keys boxplot detection on (ref:
  * findBoxlotColumnIndex, get_dashboard.go:749-756).
  *
  * Scale note: the buffer collects values, which is fine for the
  * dashboard path (≤3000-row results, reference row cap); for a
  * 100 TB aggregation you would swap in percentile_approx — the
  * render contract is unchanged.
  */
object Boxplot {

  final case class BoxplotOutlier(value: Double, info: Map[String, String])
  final case class BoxplotResult(
      max: Option[Double], min: Option[Double],
      outliers: Seq[BoxplotOutlier],
      q1: Option[Double], q2: Option[Double], q3: Option[Double])

  /** quantile_cont: linear interpolation between closest ranks. */
  def quantileCont(sorted: IndexedSeq[Double], p: Double): Double = {
    val n = sorted.length
    if (n == 1) sorted.head
    else {
      val pos = (n - 1) * p
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < n) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo)
    }
  }

  class BoxplotAgg extends Aggregator[java.lang.Double, List[Double], BoxplotResult] {
    def zero: List[Double] = Nil
    def reduce(b: List[Double], a: java.lang.Double): List[Double] =
      if (a == null) b else a.doubleValue() :: b
    def merge(b1: List[Double], b2: List[Double]): List[Double] = b1 ::: b2
    def finish(b: List[Double]): BoxplotResult = {
      if (b.isEmpty) BoxplotResult(None, None, Nil, None, None, None)
      else {
        val sorted = b.toIndexedSeq.sorted
        BoxplotResult(
          Some(sorted.last), Some(sorted.head), Nil,
          Some(quantileCont(sorted, 0.25)),
          Some(quantileCont(sorted, 0.5)),
          Some(quantileCont(sorted, 0.75)))
      }
    }
    def bufferEncoder: Encoder[List[Double]] = Encoders.kryo[List[Double]]
    def outputEncoder: Encoder[BoxplotResult] = Encoders.product[BoxplotResult]
  }

  def register(spark: SparkSession): Unit =
    spark.udf.register("BOXPLOT", functions.udaf(new BoxplotAgg, Encoders.DOUBLE))
}
