package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.PipelineOps

/** Public, composable API over the lexical-retrieval operators — the
  * keyword-search counterpart of [[Similarity]]'s dense side. The named
  * entries (s07/idx01) are the oracled instantiations of these kernels;
  * this facade exposes them over arbitrary DataFrames with
  * caller-chosen column names:
  *
  * {{{
  * import graft.pipeline.Retrieval
  * val hits  = Retrieval.bm25TopK(docs, Seq("spark", "join"), k = 20)
  * val index = Retrieval.invertedIndex(docs, minDf = 1000, headCap = 100)
  * }}}
  *
  * Both kernels keep the scale shapes the named entries pin: BM25 is
  * two map-side corpus scans with a single broadcast stats row and a
  * TakeOrdered cut; the index build caps hot-term postings in two
  * lossless phases so no reducer materializes a stopword's full list.
  */
object Retrieval {

  // shared canonicalization/null contract: see [[Canon]]
  private def canon(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Canon.docs(docs, idCol, textCol)

  /** BM25 top-k keyword search (s07's kernel, Lucene idf; k1/b are the
    * standard defaults). `terms` must be plain tokens. Returns
    * (doc_id, score), score rounded to 4 decimals with doc_id tiebreak
    * so the cut is deterministic. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    PipelineOps.bm25TopKOf(canon(docs, idCol, textCol), terms, k, k1, b)

  /** Inverted-index build (idx01's kernel): per term with df ≥ `minDf`,
    * the document frequency and the first `headCap` doc ids of its
    * postings list. Returns (term, df, postings_head). */
  def invertedIndex(docs: DataFrame, minDf: Long, headCap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    PipelineOps.invertedIndexOf(canon(docs, idCol, textCol), minDf, headCap)
}
