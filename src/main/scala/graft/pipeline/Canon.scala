package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared input canonicalization for the public facades: cast the
  * caller's columns to the kernels' fixed names/types and drop rows
  * whose id or payload is null (or became null under the cast) — a
  * null id would otherwise silently form its own join/group key and a
  * null payload would poison hash/cosine kernels. One copy, so the
  * contract can't drift between facades. */
private[pipeline] object Canon {

  /** `extra` carries additional pre-computed columns (evaluated against
    * the CALLER's schema, e.g. a target predicate) through the
    * canonicalization, so facades needing more than (id, text) don't
    * re-implement the cast/null contract inline. */
  def docs(df: DataFrame, idCol: String, textCol: String,
      extra: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id") +:
        col(textCol).cast("string").as("text") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .filter(col("doc_id").isNotNull && col("text").isNotNull)

  def vecs(df: DataFrame, idCol: String, vecCol: String,
      extra: Seq[(String, org.apache.spark.sql.Column)] = Nil): DataFrame =
    df.select(col(idCol).cast("long").as("vec_id") +:
        col(vecCol).cast("array<double>").as("e") +:
        extra.map { case (n, c) => c.as(n) }: _*)
      .filter(col("vec_id").isNotNull && col("e").isNotNull)
}
