package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public `graft.pipeline.Curation` facade must be the SAME kernels
  * the oracled named entries run — each test renames the corpus columns
  * to arbitrary caller names, runs the facade, and checks exact
  * agreement with the corresponding `SparkEntry.queries` entry. */
class CurationApiSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"
  // caller-shaped corpus: different column names, extra columns
  private def userDocs = Tables.t(spark, dir, "documents")
    .select(col("doc_id").as("docnum"), col("text").as("body"), col("lang"))

  private def entry(name: String) = SparkEntry.queries(name)(spark, dir)

  import graft.pipeline.Curation

  test("nearDupPairs over renamed columns equals the d03 entry") {
    val api = Curation.nearDupPairs(userDocs, 0.5, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("d03_ngram_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(api == ref)
    // and the skew-robust plan is output-identical
    val skew = Curation.nearDupPairsSkewRobust(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(skew == ref)
  }

  test("dedupAgainstCorpus equals the d14 entry on the same cut") {
    val api = Curation.dedupAgainstCorpus(
        userDocs.filter(col("docnum") % 7 === 3),
        userDocs.filter(col("docnum") % 7 =!= 3),
        0.5, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("d14_incremental_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(api == ref)
  }

  test("dedupAgainstCorpusSkewRobust is output-identical to the direct cross join") {
    val api = Curation.dedupAgainstCorpusSkewRobust(
        userDocs.filter(col("docnum") % 7 === 3),
        userDocs.filter(col("docnum") % 7 =!= 3),
        0.5, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("d14_incremental_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(api == ref)
  }

  test("dupClusters equals the d11 entry") {
    val api = Curation.dupClusters(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val ref = entry("d11_dup_clusters")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(api == ref)
  }

  test("charEntropy equals the t11 entry") {
    val api = Curation.charEntropy(userDocs, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("t11_char_entropy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(api == ref)
  }

  test("minhash pairs are a subset of exact pairs at the same threshold") {
    val mh = Curation.nearDupPairsMinhash(userDocs, 0.9, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Curation.nearDupPairs(userDocs, 0.9, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact), "minhash reported a pair exact jaccard rejects")
  }

  test("minhash banding adapts to the threshold: high recall at 0.5, not the 8x4 shape") {
    // with the fixed 8x4 banding a true jaccard-0.5 pair is detected
    // with prob ~0.40; the 16x2 regime detects it at ~0.99 — so at
    // threshold 0.5 the candidate pass must surface (nearly) all exact
    // pairs, and verification keeps it a subset
    val mh = Curation.nearDupPairsMinhash(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Curation.nearDupPairs(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(exact))
    assert(mh.size >= (exact.size * 8) / 10,
      s"minhash at 0.5 found ${mh.size}/${exact.size} exact pairs — banding not threshold-adapted")
  }

  test("shardedWrite excludes null ids instead of minting an extra null-shard directory") {
    val out = java.nio.file.Files.createTempDirectory("graft-null-shards").toString
    val withNull = userDocs.select(
      when(col("docnum") === 7, lit(null)).otherwise(col("docnum")).as("docnum"),
      col("body"))
    Curation.shardedWrite(withNull, out, nShards = 4, idCol = "docnum")
    val back = spark.read.parquet(out)
    assert(back.count() == 499L, "null-id row must be excluded, others kept")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.sameElements((0 until 4).map(i => s"shard=$i")),
      s"unexpected shard layout: ${dirs.mkString(",")}")
  }

  test("bitextMine over renamed columns equals the s12 entry") {
    import graft.pipeline.Similarity
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "lang")
    def side(lang: String) = Tables.t(spark, dir, "embeddings")
      .join(docs.filter(col("lang") === lang), col("vec_id") === col("doc_id"))
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val api = Similarity.bitextMine(side("de"), side("en"),
        k = 4, tau = 1.15, idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val ref = entry("s12_bitext_mining")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(api == ref && api.nonEmpty)
  }

  test("bitextMineAnn at probes = clusters equals the exhaustive miner exactly") {
    import graft.pipeline.Similarity
    val docs = Tables.t(spark, dir, "documents").select("doc_id", "lang")
    def side(lang: String) = Tables.t(spark, dir, "embeddings")
      .join(docs.filter(col("lang") === lang), col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("embedding"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    // probes = clusters -> the candidate set is exhaustive, so the ANN
    // path must reproduce the exhaustive margins bit-for-bit
    val full = key(Similarity.bitextMineAnn(side("de"), side("en"),
      k = 4, tau = 1.15, probes = 6, clusters = 6))
    val exact = key(Similarity.bitextMine(side("de"), side("en"), k = 4, tau = 1.15))
    assert(full == exact && full.nonEmpty)
    // a real probe (2 of 6 cells): still mines pairs, every margin
    // honors tau, and every mined pair is a true candidate of the
    // exhaustive run's id space
    val pruned = key(Similarity.bitextMineAnn(side("de"), side("en"),
      k = 4, tau = 1.15, probes = 2, clusters = 6))
    assert(pruned.nonEmpty && pruned.forall(_._4 >= 1.15))
  }

  test("Similarity facade over renamed columns equals the s01/s02/s06 entries") {
    import graft.pipeline.Similarity
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"), col("label").as("bucket"))
    val queries = userEmb.filter(col("vid") < 10)
    val exact = Similarity.bruteForceTopK(userEmb, queries, k = 5,
      idCol = "vid", vecCol = "vec")
    val approx = Similarity.ivfTopK(userEmb, queries, k = 5, probes = 2,
      idCol = "vid", vecCol = "vec", bucketCol = "bucket")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(asSet(exact) == asSet(entry("s01_cosine_topk")))
    assert(asSet(approx) == asSet(entry("s02_ann_ivf")))
    val grade = Similarity.recallAtK(exact, approx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("s06_ann_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(grade == ref)
    val mmr = Similarity.mmrRerank(userEmb, queries,
        idCol = "vid", vecCol = "vec").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val mmrRef = entry("s24_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(mmr == mmrRef)
  }

  test("shardedWrite round trip: total partition, one directory per shard") {
    val out = java.nio.file.Files.createTempDirectory("graft-curation-shards").toString
    Curation.shardedWrite(userDocs, out, nShards = 4, idCol = "docnum")
    val back = spark.read.parquet(out)
    assert(back.count() == 500L)
    assert(back.select("shard").distinct().count() == 4L)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.sameElements((0 until 4).map(i => s"shard=$i")))
  }

  test("chunkDedup over renamed columns equals the d16 entry") {
    val api = Curation.chunkDedup(userDocs, chunkWords = 10,
        idCol = "docnum", textCol = "body")
      .select(col("doc_id"), col("n_kept"), md5(col("cleaned_text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val ref = entry("d16_chunk_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(api == ref)
  }

  test("bpePairCounts over renamed columns equals the t13 entry") {
    val api = Curation.bpePairCounts(userDocs, k = 20, "docnum", "body")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = entry("t13_bpe_pair_counts")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(api == ref)
  }

  test("bpeMergeLoop over renamed columns equals the t16 entry") {
    val api = Curation.bpeMergeLoop(userDocs, merges = 6, "docnum", "body")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val ref = entry("t16_bpe_merge_loop")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(api == ref)
  }

  test("qualityKeep over renamed columns equals the d19 entry") {
    val api = Curation.qualityKeep(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val ref = entry("d19_quality_keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(api == ref)
  }

  test("splitLeakage over renamed columns equals the spl02 entry") {
    val api = Curation.splitLeakage(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    val ref = entry("spl02_split_leakage")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(api == ref && api.nonEmpty)
  }

  test("qualityKeepFromEdges with the skew-robust pair source equals the exact path") {
    // the prefix-filter builder is recall-exact, so the election over
    // its edges must match qualityKeep's verdict identically
    val edges = Curation.nearDupPairsSkewRobust(userDocs, 0.5, "docnum", "body")
    val api = Curation.qualityKeepFromEdges(userDocs, edges, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val ref = Curation.qualityKeep(userDocs, 0.5, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(api == ref && api.nonEmpty)
  }

  test("bpeTokenize over renamed columns equals the t17 entry") {
    val api = Curation.bpeTokenize(userDocs, merges = 6, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = entry("t17_bpe_tokenize")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(api == ref)
  }

  test("sourceDatasheet and temporalSplitAudit over renamed columns equal the entries") {
    val userFull = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("docnum"), col("text").as("body"),
        col("lang").as("language"), col("source").as("origin"))
    val api = Curation.sourceDatasheet(userFull, idCol = "docnum",
        textCol = "body", sourceCol = "origin", langCol = "language")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    val ref = entry("cur03_source_datasheet")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(api == ref)
    val ev = Tables.t(spark, dir, "events")
      .select(col("user_id").as("uid"), col("ts").as("at"))
    val apiT = Curation.temporalSplitAudit(ev, "2024-01-30 20:00:00",
        userCol = "uid", tsCol = "at")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val refT = entry("spl03_temporal_split")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(apiT == refT)
  }

  test("knBigramScore over renamed columns equals the lm03 entry") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toSeq
    val api = key(Curation.knBigramScore(userDocs, idCol = "docnum", textCol = "body"))
    assert(api == key(entry("lm03_kneser_ney")))
  }

  test("corpusDrift over renamed columns matches the guard02 math on lang cells") {
    val ref = userDocs.filter(col("docnum") % 3 === 0)
    val cur = userDocs.filter(col("docnum") % 3 =!= 0)
    val api = Curation.corpusDrift(ref, cur, dimCol = "lang", textCol = "body")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shares sum to ~1e6 on each side (floor+0.5 rounding, one cell off at most a few units)
    assert(math.abs(api.map(_._2).sum - 1000000L) <= api.length)
    assert(math.abs(api.map(_._3).sum - 1000000L) <= api.length)
    assert(api.map(_._1).toSeq == api.map(_._1).sorted.toSeq && api.nonEmpty)
  }

  test("spanDecontaminate over renamed columns equals the dec04 entry") {
    val api = Curation.spanDecontaminate(userDocs, col("docnum") % 50 === 0,
        runLen = 4, idCol = "docnum", textCol = "body")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        col("contamination"), md5(col("cleaned_text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSet
    val ref = entry("dec04_span_decontaminate")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toSet
    assert(api == ref)
  }

  test("epochPlan over renamed columns equals the samp05 entry") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))).toSeq
    val api = key(Curation.epochPlan(userDocs, totalTokens = 100000,
      idCol = "docnum", textCol = "body"))
    assert(api == key(entry("samp05_epoch_plan")))
  }

  test("htmlExtract over renamed columns equals the t23 entry's rule cascade") {
    // the facade takes a caller HTML column; feed it the same
    // deterministic pages the entry builds and compare the audit
    val pages = graft.queries.PipelineOps.htmlPageOf(
        Tables.t(spark, dir, "documents").select("doc_id", "text"), 12)
      .select(col("doc_id").as("docnum"), col("html").as("markup"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_blocks", "n_kept", "n_drop_link", "n_drop_short",
        "extracted_md5", "extracted_wc")
      .collect().map(_.toString).sorted.toSeq
    val api = key(graft.pipeline.Curation.htmlExtract(pages,
      idCol = "docnum", htmlCol = "markup"))
    assert(api == key(entry("t23_html_extract")))
  }

  test("nnDescent and graphAnnServe over renamed columns equal the s19/s20 entries") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    import graft.pipeline.Similarity
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val g = Similarity.nnDescent(userEmb, k = 8, idCol = "vid", vecCol = "vec")
    assert(key(g) == key(entry("s19_nn_descent")))
    // the s20 entry serves over a DENSER degree-6 graph (serving wants
    // HNSW's M, not the analysis artifact's k)
    val g6 = Similarity.nnDescent(userEmb, k = 8, topK = 6,
      idCol = "vid", vecCol = "vec")
    val served = Similarity.graphAnnServe(userEmb, g6,
      userEmb.filter(col("vid") < 10), idCol = "vid", vecCol = "vec")
    assert(key(served) == key(entry("s20_graph_ann_serve")))
  }

  test("unigramSegment over renamed columns equals the t20 entry") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val api = key(Curation.unigramSegment(userDocs, idCol = "docnum",
      textCol = "body", seedVocab = 128))
    assert(api == key(entry("t20_unigram_segmentation")))
  }

  test("bpeFertility over renamed columns equals the t19 entry") {
    val api = Curation.bpeFertility(userDocs, merges = 6,
        idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    val ref = entry("t19_tokenizer_fertility")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(api == ref)
  }

  test("bpeTokenizeWith under bpeMergeLoop's merges equals bpeTokenize") {
    val merges = Curation.bpeMergeLoop(userDocs, 6, "docnum", "body")
      .collect().map(r => { val Array(a, b) = r.getString(1).split(" ", 2); (a, b) }).toSeq
    val served = Curation.bpeTokenizeWith(userDocs, merges, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fused = Curation.bpeTokenize(userDocs, 6, "docnum", "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served == fused && served.nonEmpty)
  }

  test("nfcNormalized rewrites the text column in place, ASCII untouched") {
    val out = Curation.nfcNormalized(
        userDocs.withColumn("body", concat(col("body"), lit("é"))),
        textCol = "body")
      .select("body").collect().map(_.getString(0))
    // the appended decomposed é composes: no bare combining acute left
    assert(out.forall(s => !s.exists(_ == '\u0301')))
    assert(out.forall(_.endsWith("\u00E9")))
  }

  test("nfcNormalized survives a column name containing a backtick (r6 advice)") {
    import spark.implicits._
    val weird = Seq("cafe\u0301").toDF("weird")
      .withColumnRenamed("weird", "we`ird")
    val out = Curation.nfcNormalized(weird, textCol = "we`ird")
      .collect().map(_.getString(0))
    assert(out.sameElements(Array("caf\u00E9")))
  }

  test("Retrieval facade over renamed columns equals the s07/idx01 entries") {
    import graft.pipeline.Retrieval
    val bm = Retrieval.bm25TopK(userDocs, Seq("spark", "join", "vector"),
        k = 20, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bmRef = entry("s07_bm25_topk")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm == bmRef)
    // the facade keeps the array form; the entry serializes postings to
    // a comma-joined string for the driver comparator — compare via the
    // same serialization
    val ix = Retrieval.invertedIndex(userDocs, minDf = 300, headCap = 20,
        idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).mkString(","))).toSet
    val ixRef = entry("idx01_inverted_index")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(ix == ixRef)
  }

  test("qualityScore over renamed columns equals the t14 entry") {
    val api = Curation.qualityScore(userDocs, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = entry("t14_quality_classifier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(api == ref)
  }

  test("semDedup and pqEncode over renamed columns equal the d17/s09 entries") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val sd = graft.pipeline.Similarity.semDedup(userEmb, k = 8, tau = 0.4,
        idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val sdRef = entry("d17_semdedup")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sd == sdRef)
    // facade keeps array codes; the entry serializes them for the
    // driver comparator — compare via the same serialization
    val pq = graft.pipeline.Similarity.pqEncode(userEmb, dims = 64, subs = 8,
        idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).mkString(","), r.getDouble(2))).toSet
    val pqRef = entry("s09_pq_encode")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(pq == pqRef)
  }

  test("semDedup and pqEncode seed by RANK, not id value: offset ids shift, results don't") {
    // the review-caught defect: seeding centroids/codebook with
    // `vec_id < k` returns empty results for 1-based/hashed id spaces.
    // Seeding by rank must make an id-space translation a no-op: same
    // clusters, same drops, same codes — every id just shifted.
    val base = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val shifted = base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val sd0 = graft.pipeline.Similarity.semDedup(base, k = 8, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(sd0.nonEmpty)
    val sd1 = graft.pipeline.Similarity.semDedup(shifted, k = 8, tau = 0.4)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getInt(1), r.getLong(2) - 1000000L,
        r.getDouble(3))).toSet
    assert(sd1 == sd0)
    val pq0 = graft.pipeline.Similarity.pqEncode(base, dims = 64, subs = 8)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2))).toSet
    assert(pq0.size == base.count())
    val pq1 = graft.pipeline.Similarity.pqEncode(shifted, dims = 64, subs = 8)
      .collect().map(r => (r.getLong(0) - 1000000L, r.getSeq[Int](1), r.getDouble(2))).toSet
    assert(pq1 == pq0)
  }

  test("importanceResample over renamed columns equals the samp02 entry") {
    val withLang = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("docnum"), col("text").as("body"), col("lang"))
    val api = Curation.importanceResample(withLang, col("lang") === "en",
        n = 100, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val ref = entry("samp02_dsir_resample")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(api == ref)
  }

  test("importanceResample enriches the target on a discriminative fixture") {
    // the synthetic corpus's language unigrams barely differ, so the
    // oracled entry shows only mild enrichment; this two-vocabulary
    // fixture proves the mechanism: target-vocab docs must dominate a
    // half-corpus selection
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val vocabA = s"alpha$i beta gamma delta epsilon zeta eta theta"
      val vocabB = s"omega$i psi chi phi upsilon tau sigma rho"
      if (i % 2 == 0) (i.toLong, vocabA, true) else (i.toLong, vocabB, false)
    }.toDF("doc_id", "text", "is_tgt")
    val picked = Curation.importanceResample(docs, col("is_tgt"), n = 50)
      .collect().map(_.getLong(0)).toSet
    val targetShare = picked.count(_ % 2 == 0).toDouble / picked.size
    assert(targetShare >= 0.9,
      s"expected the target vocabulary to dominate the draw, got $targetShare")
  }

  test("corpusDiff classifies added/removed/changed/unchanged over renamed columns") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("docnum", "body")
    val v2 = Seq((1L, "alpha beta"), (2L, "gamma CHANGED"), (4L, "zeta"))
      .toDF("docnum", "body")
    val got = Curation.corpusDiff(v1, v2, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
    // a run that NULLs text must report `changed`, never `removed` —
    // null text is present-with-corrupt-content, and the audit is the
    // place that distinction matters most
    val v2null = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "epsilon"))
      .toDF("docnum", "body")
    val gotNull = Curation.corpusDiff(v1, v2null, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(gotNull == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged"))
  }

  test("clusterExemplars over renamed columns equals the s10 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val api = graft.pipeline.Similarity.clusterExemplars(userEmb, k = 8,
        idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = entry("s10_cluster_exemplars")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(api == ref)
  }

  test("knnGraph over renamed columns equals the s18 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val api = graft.pipeline.Similarity.knnGraph(userEmb, k = 8,
        idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = entry("s18_knn_graph")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(api == ref)
  }

  test("ivfPqTopK over renamed columns equals the s14 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"), col("label").as("cell"))
    val api = graft.pipeline.Similarity.ivfPqTopK(
        userEmb, userEmb.filter(col("vid") < 10), k = 5,
        idCol = "vid", vecCol = "vec", bucketCol = "cell")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val ref = entry("s14_ivfpq_search")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(api == ref)
  }

  test("pqRerank over renamed columns equals the s15 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"), col("label").as("cell"))
    val api = graft.pipeline.Similarity.pqRerank(
        userEmb, userEmb.filter(col("vid") < 10), k = 5,
        idCol = "vid", vecCol = "vec", bucketCol = "cell")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = entry("s15_pq_rerank")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(api == ref)
  }

  test("embeddingOutliers over renamed columns equals the s16 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"), col("label").as("cell"))
    val api = graft.pipeline.Similarity.embeddingOutliers(
        userEmb, idCol = "vid", vecCol = "vec", bucketCol = "cell")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    val ref = entry("s16_embedding_outliers")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(api == ref)
  }

  test("kAnonRelease over renamed columns equals the u04 entry") {
    val userEvents = Tables.t(spark, dir, "events")
      .select(col("event_type").as("etype"), col("ts").as("when"),
        col("user_id").as("uid"), col("value").as("v"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6))
    val api = Curation.kAnonRelease(userEvents, 10,
      typeCol = "etype", tsCol = "when", userCol = "uid", valueCol = "v")
      .collect().map(key).toSet
    val ref = entry("u04_kanon_release").collect().map(key).toSet
    assert(api == ref)
  }

  test("tfidfKeywords over renamed columns equals the t22 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3))
    val api = Curation.tfidfKeywords(userDocs, 3,
      idCol = "docnum", textCol = "body").collect().map(key).toSet
    val ref = entry("t22_tfidf_keywords").collect().map(key).toSet
    assert(api == ref)
  }

  test("canaryAudit over renamed columns equals the guard03 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    val api = Curation.canaryAudit(userDocs, 3,
      idCol = "docnum", textCol = "body").collect().map(key).toSet
    val ref = entry("guard03_canary_audit").collect().map(key).toSet
    assert(api == ref)
  }

  test("trainingOrderManifest over renamed columns equals the p08 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    val api = Curation.trainingOrderManifest(userDocs, 2, 4,
      idCol = "docnum", textCol = "body").collect().map(key).toSet
    val ref = entry("p08_training_order").collect().map(key).toSet
    assert(api == ref)
  }

  test("dupClustersAlternating over renamed columns equals the d24 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2))
    val api = Curation.dupClustersAlternating(userDocs, 0.5,
      idCol = "docnum", textCol = "body").collect().map(key).toSet
    val ref = entry("d24_cc_largestar").collect().map(key).toSet
    assert(api == ref)
  }

  test("bloomDedupGate over renamed columns equals the d23 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    val api = Curation.bloomDedupGate(
      userDocs.filter(col("docnum") % 7 === 3),
      userDocs.filter(col("docnum") % 7 =!= 3),
      3, 0.5, 0.03, idCol = "docnum", textCol = "body")
      .collect().map(key).toSet
    val ref = entry("d23_bloom_dedup_gate").collect().map(key).toSet
    assert(api == ref)
  }

  test("c4LineGate over renamed columns equals the t21 entry") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) "" else r.getString(4))
    val api = Curation.c4LineGate(userDocs, 10, 6, Seq("vector"), Seq("dup"), 2,
      idCol = "docnum", textCol = "body").collect().map(key).toSet
    val ref = entry("t21_c4_line_gate").collect().map(key).toSet
    assert(api == ref)
  }

  test("intraDocDedup over renamed columns equals the d22 entry") {
    val api = Curation.intraDocDedup(userDocs, 2, idCol = "docnum", textCol = "body")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val ref = entry("d22_intradoc_dedup")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(api == ref)
  }

  test("softDedupWeights over renamed columns equals the d21 entry") {
    val api = Curation.softDedupWeights(userDocs, 0.5, idCol = "docnum", textCol = "body")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    val ref = entry("d21_soft_dedup_weights")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(api == ref)
  }

  test("piiAudit counts organic PII over caller text and flags by rate") {
    import spark.implicits._
    // the entry audits synthetic-augmented text; the facade takes
    // whatever text the caller has — here literal organic PII
    val docs = Seq(
      ("a", "contact bob@corp.com or 555-123 at 10.0.0.1 thanks"),
      ("a", "no sensitive content here at all"),
      ("b", "plain text"), ("b", "more plain text"), ("b", "even more")
    ).toDF("origin", "body")
    val out = graft.pipeline.Curation.piiAudit(docs, tau = 0.5,
        sourceCol = "origin", textCol = "body")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getLong(7))).toMap
    assert(out("a") == ((2L, 1L, 1L, 1L, 1L, 1.5, 1L)), out.toString)
    assert(out("b") == ((3L, 0L, 0L, 0L, 0L, 0.0, 0L)), out.toString)
  }

  test("hybridTopK over renamed columns equals the s13 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val api = graft.pipeline.Similarity.hybridTopK(
        userDocs, userDocs.filter(col("docnum") < 8),
        userEmb, userEmb.filter(col("vid") < 8),
        idCol = "docnum", textCol = "body", vecIdCol = "vid", vecCol = "vec")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSet
    val ref = entry("s13_hybrid_rrf")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5))).toSet
    assert(api == ref)
  }

  test("bfdPack over renamed columns equals the samp10 entry") {
    val userSrc = Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("docnum"), col("source").as("origin"),
        col("text").as("body"))
    val api = Curation.bfdPack(userSrc, idCol = "docnum",
        sourceCol = "origin", textCol = "body")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    val ref = entry("samp10_bfd_packing")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(api == ref)
  }

  test("noveltyRatio over renamed columns equals the t15 entry") {
    val api = Curation.noveltyRatio(userDocs, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ref = entry("t15_novelty_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(api == ref)
  }

  test("randomProject over renamed columns equals the s08 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    // facade keeps the array; the entry posexplodes to (vec_id, j, pv)
    // scalar rows for the driver comparator — regroup to compare
    val api = graft.pipeline.Similarity.randomProject(userEmb, 64, 8,
        idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).toSet
    val ref = entry("s08_random_projection")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (id, rs) => (id, rs.sortBy(_._2).map(_._3).toVector) }
      .toSet
    assert(api == ref)
  }

  test("contaminationAudit over renamed columns equals the dec02 entry") {
    val api = Curation.contaminationAudit(userDocs, col("docnum") % 50 === 0,
        idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSet
    val ref = entry("dec02_contamination_audit")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSet
    assert(api == ref)
  }

  test("ccnetBuckets and qualityFloorSelect over renamed columns equal the lm02/sel01 entries") {
    val cb = Curation.ccnetBuckets(userDocs, idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val cbRef = entry("lm02_ccnet_buckets")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(cb == cbRef)
    val sel = Curation.qualityFloorSelect(userDocs, floorPerLang = 8, totalN = 100,
        idCol = "docnum", textCol = "body")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    val selRef = entry("sel01_quality_floor_select")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(sel == selRef)
  }

  test("semanticContamination over renamed columns equals the dec03 entry") {
    val userEmb = Tables.t(spark, dir, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("vec"))
    val api = graft.pipeline.Similarity.semanticContamination(
        userEmb, col("vid") % 50 === 0, idCol = "vid", vecCol = "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val ref = entry("dec03_semantic_contamination")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(api == ref)
  }

  test("temperatureMixture and tokenBudgetMixture over renamed columns equal the samp03/samp04 entries") {
    val tm = Curation.temperatureMixture(userDocs, total = 200,
        idCol = "docnum", langCol = "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ck"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val tmRef = entry("samp03_temperature_sample")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      .filter(_._2 > 0).toSet
    assert(tm == tmRef)
    val tb = Curation.tokenBudgetMixture(userDocs, totalTokens = 20000,
        idCol = "docnum", textCol = "body", langCol = "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_tok").as("tk"), sum("doc_id").as("ck"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val tbRef = entry("samp04_token_budget_mixture")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .filter(_._2 > 0).toSet
    assert(tb == tbRef)
  }

  test("buildTermDict + prefixSuggest/fuzzyCorrect over renamed columns equal the idx10/idx11 entries") {
    val dictDir = java.nio.file.Files
      .createTempDirectory("graft-api-termdict").toString
    Curation.buildTermDict(userDocs, dictDir, idCol = "docnum", textCol = "body")
    val sug = Curation.prefixSuggest(spark, dictDir, prefix = "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val sugRef = entry("idx10_prefix_suggest")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sug == sugRef)
    val fz = Curation.fuzzyCorrect(spark, dictDir,
        Seq("scann", "tabl", "scen", "data", "zzz"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    val fzRef = entry("idx11_fuzzy_correct")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getLong(4))).toSeq
    assert(fz == fzRef)
  }
}
