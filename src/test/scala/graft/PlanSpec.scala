package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards: the scale-critical plan shapes must not
  * regress (filter pushdown, column pruning, broadcast dimension joins,
  * bucketed co-located joins with no shuffle). These assert on
  * `.explain` output — the same audit `graft.Plans` prints for review.
  */
class PlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-wh").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "10MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
  private val dir = "/root/testdata/sf0.001"
  private val runId = java.lang.Long.toString(System.nanoTime(), 36)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("d06 embedding near-dup is lazy and bucketed: parquet scan in-plan, no cartesian, no collect") {
    // round-2 review: the old d06 collected the whole table to the
    // driver (plan showed only a parallelized RDD). The scale-safe LSH
    // default must keep the parquet scan inside the plan and join on
    // bucket keys — never CartesianProduct on the corpus.
    val df = graft.queries.PipelineOps.defs("d06_dedup_embedding")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("embeddings"), "embeddings parquet scan missing from plan (driver-side collect?)")
    assert(!plan.contains("CartesianProduct"), "corpus self-join degenerated to a cartesian")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "bucket-key equi-join missing")
  }

  test("d09 prefix-filtered jaccard: equi-joins only, no cartesian, scan in-plan") {
    // the skew-robust path must itself stay shuffle-sane: the prefix
    // self-join and the verify joins are all equi-joins on (sh) / (doc
    // ids) — a cartesian or driver collect here would defeat its purpose
    val df = graft.queries.PipelineOps.defs("d09_prefix_filter_jaccard")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("documents"), "documents scan missing from plan")
    assert(!plan.contains("CartesianProduct"), "prefix join degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "non-equi join sneaked in")
    // recompute-over-persist is DELIBERATE and measured: the shingle
    // scan+explode subtree appears 6x (prefix both sides, verify s1/s2,
    // sizes ×1 via ranked… exact count pinned below) and re-executing
    // the fused map-side explode measured CHEAPER than any persist
    // (sf0.1 isolated min-of-3: baseline 2.55 s, DISK_ONLY shingles
    // 3.89 s) — and a persisted explode is what a 100 TB run cannot
    // hold anyway. In the shuffle (sort-merge) regime at real scale the
    // identical prefix sides dedup through ReuseExchange; in the
    // broadcast regime the recompute is the cost model's choice. Pin
    // the shape: no cache materialization in the plan, and the scan
    // count stays at the audited 6 so an accidental 7th reference (or
    // a sneaked-in cache) shows up here.
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 6, s"expected the audited 6 documents scans, got $scans")
    assert(!plan.contains("InMemoryTableScan") && !plan.contains("InMemoryRelation"),
      "d09 must not cache the shingle explode (measured slower + unbounded at scale)")
  }

  test("dec01 decontamination: benchmark gram set broadcast, corpus side never sort-merges") {
    // the benchmark set must ride a broadcast (it is ≪ corpus by
    // construction); a sort-merge join here would shuffle the full
    // exploded corpus gram stream at 100 TB
    val df = graft.queries.PipelineOps.defs("dec01_decontaminate")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "benchmark join must be broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "corpus gram stream must not shuffle for the benchmark join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t14 quality classifier: map-side only, no explode/join/groupBy before the sort") {
    // the whole classifier evaluates inside the row (hash-derived
    // weights need no model join); the only Exchange allowed is the
    // presentation orderBy's range partitioning
    val df = graft.queries.PipelineOps.defs("t14_quality_classifier")(spark, dir)
    val plan = planOf(df)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Generate"), "no explode should appear in an in-row score")
    assert(!plan.contains("Join"), "hash-derived weights must not need a model join")
  }

  test("s09 PQ encode: codebook joins broadcast, no cartesian, no sort-merge") {
    // the 128-row codebook must broadcast against the exploded
    // subvector stream; a sort-merge or cartesian would shuffle the
    // corpus against a constant-size side
    val df = graft.queries.PipelineOps.defs("s09_pq_encode")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "codebook join is not broadcast")
    assert(!plan.contains("CartesianProduct"), "subvector join degenerated to a cartesian")
    assert(!plan.contains("SortMergeJoin"), "constant-size codebook must never sort-merge")
  }

  test("d17 semdedup: within-cluster pair join is an equi-join, centroids broadcast") {
    // the pairwise stage must join on the cluster key only (never
    // all-pairs); the kmeans prepass crossJoins ONLY the broadcast
    // 8-row centroid table — assert the one BroadcastNestedLoopJoin
    // per assignment pass is against that tiny side and the pair join
    // itself is a hash/sort equi-join
    val df = graft.queries.PipelineOps.defs("d17_semdedup")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "pair join degenerated to a cartesian")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "cluster-key equi-join missing")
  }

  test("samp02 DSIR: weight table broadcast, Gumbel cut is TakeOrdered, no sort-merge") {
    // the buckets-row weight table must broadcast against the token
    // stream, and the top-n selection must be a bounded TakeOrdered,
    // never a global sort of the corpus
    val df = graft.queries.PipelineOps.defs("samp02_dsir_resample")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "weight-table join is not broadcast")
    assert(!plan.contains("SortMergeJoin"), "constant-size weight table must never sort-merge")
    assert(plan.contains("TakeOrderedAndProject"), "Gumbel cut must be TakeOrdered")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
  }

  test("p03 composed pipeline: one join total (the chunk-df anti-filter), no metadata join-back") {
    // the quality gate is an in-row Column (no score join) and lang is
    // carried through the chunk-dedup kernel (no doc_id join-back), so
    // the ONLY join in the whole composed plan is d16's chunk-frequency
    // hash join
    val df = graft.queries.PipelineOps.defs("p03_curation_v2")(spark, dir)
    val plan = planOf(df)
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly the chunk-df join, found $joins:\n$plan")
    assert(plan.contains("Generate"), "chunk explode missing")
  }

  test("p04 composed pipeline: one corpus-keyed shuffle join, everything else broadcast or in-row") {
    // quality gate is in-row; lm model tables, tercile thresholds, the
    // eval gram set, and the contaminated-id anti-filter all broadcast;
    // the single shuffled join is the lm-score attach on doc_id
    val df = graft.queries.PipelineOps.defs("p04_curation_v3")(spark, dir)
    val plan = planOf(df)
    // at test scale Catalyst may broadcast even the doc_id attach
    // (0 shuffled joins); at scale AQE keeps it the ONLY shuffled one
    val shuffled = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(plan).size
    assert(shuffled <= 1,
      s"only the doc_id lm-score attach may shuffle, found $shuffled:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert(plan.contains("BroadcastHashJoin"), "broadcast sides missing")
    assert(plan.contains("percentile"), "tercile thresholds must be partial-aggregable percentile")
  }

  test("s10 exemplars: per-cluster top-3 is a WindowGroupLimit bounded heap") {
    // the CLUSTER-partitioned window specifically must group-limit: the
    // kmeans subtree's per-vec_id windows also produce WindowGroupLimit
    // nodes, so a bare contains() could never fail for the exemplar cut
    val df = graft.queries.PipelineOps.defs("s10_cluster_exemplars")(spark, dir)
    val plan = planOf(df)
    assert("WindowGroupLimit \\[cluster".r.findFirstIn(plan).isDefined,
      s"per-cluster top-k must be a bounded heap, not a full window sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
  }

  test("s18 knn graph: cell equi-join pairs, per-vector top-k is a bounded heap") {
    // the pair stage must join on the cluster key only, and the
    // neighbor election must be a WindowGroupLimit over (cos desc) —
    // match the ORDER spec so the kmeans subtree's own per-vec_id
    // windows (dist asc) can't satisfy the assertion
    val df = graft.queries.PipelineOps.defs("s18_knn_graph")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "pair join degenerated to a cartesian")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "cluster-key equi-join missing")
    assert("WindowGroupLimit \\[vec_id[^\\]]*\\], \\[cos".r.findFirstIn(plan).isDefined,
      s"per-vector top-k must be a bounded heap over cos:\n$plan")
  }

  test("s13 hybrid RRF: query tokens broadcast, bounded per-query heaps, no cartesian") {
    // the lexical half must meet the corpus token stream through a
    // BroadcastHashJoin (queries are the bounded sample), both the
    // per-query lexical rank and the fused rank must be literal-bounded
    // heaps, and nothing may degenerate to a cartesian — the fusion's
    // full-outer join sees only the two top-r frames
    val df = graft.queries.PipelineOps.defs("s13_hybrid_rrf")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      "query token block must broadcast onto the corpus token stream")
    assert("WindowGroupLimit \\[qid".r.findAllIn(plan).size >= 2,
      s"lexical and fused per-query ranks must both be bounded heaps:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "non-equi join sneaked in")
  }

  test("samp03 temperature draw: per-lang rank is a WindowGroupLimit bounded heap") {
    // the literal budget bound (r <= 200) must sit directly above the
    // Window so the head language never gets fully sorted on one
    // reducer — the quota filter alone (rank vs joined column) cannot
    // trigger InferWindowGroupLimit
    val df = graft.queries.PipelineOps.defs("samp03_temperature_sample")(spark, dir)
    val plan = planOf(df)
    assert("WindowGroupLimit \\[lang".r.findFirstIn(plan).isDefined,
      s"per-lang rank must be a bounded heap:\n$plan")
  }

  test("samp04 token-budget fill: per-lang rank is a WindowGroupLimit bounded heap, no cartesian") {
    // the literal r <= 400 spec bound keeps the md5-rank window a
    // bounded heap; the running token sum then orders at most 400 rows
    // per lang — never a full per-lang sort of the corpus
    val df = graft.queries.PipelineOps.defs("samp04_token_budget_mixture")(spark, dir)
    val plan = planOf(df)
    assert("WindowGroupLimit \\[lang".r.findFirstIn(plan).isDefined,
      s"per-lang rank must be a bounded heap:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
  }

  test("t08 repetition metrics: doc-local, no explode/groupBy shuffle besides the final sort") {
    // bigram run-counting happens inside the row (array_sort +
    // aggregate HOF) — the only Exchange allowed is the presentation
    // orderBy's range partitioning
    val df = graft.queries.PipelineOps.defs("t08_repetition_metrics")(spark, dir)
    val plan = planOf(df)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Generate"), "no explode should appear in a doc-local metric")
    assert(!plan.contains("HashAggregate"),
      "per-doc bigram counting must stay inside the row, not a groupBy")
  }

  test("s05/t09: quantization and redaction are pure maps — at most the orderBy exchange") {
    Seq("s05_embedding_quantize", "t09_pii_redact").foreach { name =>
      val plan = planOf(graft.queries.PipelineOps.defs(name)(spark, dir))
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"$name: expected at most the orderBy exchange, got $exchanges")
      assert(!plan.contains("Generate"), s"$name must not explode")
      assert(!plan.contains("HashAggregate"), s"$name must not shuffle an aggregation")
    }
  }

  test("t10 gopher gate is a pure map — at most the orderBy exchange, no explode") {
    val plan = planOf(graft.queries.PipelineOps.defs("t10_gopher_rules")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges")
    assert(!plan.contains("Generate"), "rule scoring must not explode the token array")
    assert(!plan.contains("HashAggregate"), "rule scoring must stay inside the row")
  }

  test("samp01 mixture sampling: map-side filter, the only wide shuffle is the |lang| rollup") {
    // the keep decision (md5 bucket vs CASE rate) must fold into the
    // scan-side projection — at 100 TB this runs at scan speed, with
    // only the 5-row language rollup crossing the wire
    val plan = planOf(graft.queries.PipelineOps.defs("samp01_mixture_sample")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected only rollup + orderBy exchanges, got $exchanges:\n$plan")
    assert(plan.contains("partial"), "language rollup lost its map-side partial aggregation")
  }

  test("u01 domain cap: equi-window shuffles only, no cartesian, scan pruned") {
    val plan = planOf(graft.queries.PipelineOps.defs("u01_domain_cap")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "cap join degenerated to a non-equi join")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      "documents scan must read only (doc_id, source) for the URL derivation")
  }

  test("d13 bloom decontamination: bit-table joins broadcast, corpus never sort-merges") {
    // the whole point of the Bloom path is that the membership structure
    // is broadcast-sized no matter how large the benchmark is — a
    // sort-merge join on the corpus side would defeat it
    val plan = planOf(graft.queries.PipelineOps.defs("d13_bloom_decontaminate")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), "bit-table membership joins must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "corpus side must not sort-merge against the bit table")
    assert(!plan.contains("CartesianProduct"))
  }

  test("p02 sequence packing: doc-row windows are id-range blocked — never a bare per-source window") {
    // the running sum is distPrefixSumOf's two-level form: any window
    // ordered by doc_id (the one that touches DOC rows) must carry the
    // bkt_ id-range block in its spec — a bare (source | doc_id ASC)
    // window would hold an entire source in one task, which on a
    // 90%-one-source crawl serializes 90% of the corpus
    val plan = planOf(graft.queries.PipelineOps.defs("p02_sequence_packing")(spark, dir))
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, s"packing lost its window form:\n$plan")
    specs.filter(_.contains("doc_id")).foreach(sp =>
      assert(sp.contains("bkt_"),
        s"doc-row window is not id-range blocked (whole-source task): $sp"))
    // the only SinglePartition exchanges allowed are the one-row
    // min/max id-span reduces (their child is a partial agg with no
    // keys — constant data volume); a window or sort over one
    // partition would be the whole-corpus funnel this pin exists for
    singlePartitionFeedsOnlyScalarAgg(plan)
    assert(!plan.contains("CartesianProduct"))
  }

  /** Every `Exchange SinglePartition` in `plan` must feed from a
    * keyless partial aggregate (a scalar reduce — rows in flight are
    * one per task, not the corpus). */
  private def singlePartitionFeedsOnlyScalarAgg(plan: String): Unit = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
      .foreach { case (l, i) =>
        val child = lines.drop(i + 1).headOption.getOrElse("")
        assert(child.contains("HashAggregate(keys=[], functions=[partial_") ||
          child.contains("SortAggregate(key=[], functions=[partial_"),
          s"SinglePartition exchange carries non-scalar rows:\n$l\n$child")
      }
  }

  test("p01 composed pipeline prunes the documents scan to (doc_id, text), no cartesian") {
    val df = graft.queries.PipelineOps.defs("p01_pipeline_e2e")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "documents scan must read only the two needed columns")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q01: shipdate filter pushed into the parquet scan, columns pruned") {
    val df = graft.queries.CoreSql.defs("q01_pricing_summary")(spark, dir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"))
    // projection pruning: p_name etc. absent; only the 6 needed columns read
    assert(scan.contains("ReadSchema") && !scan.contains("l_comment"))
  }

  test("q10: all dimension joins broadcast (no sort-merge on the star join)") {
    val plan = planOf(graft.queries.CoreSql.defs("q10_join_star")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("top-k is TakeOrdered, not a global sort") {
    val plan = planOf(graft.queries.CoreSql.defs("q11_top_orders")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("bucketed co-located join has no shuffle exchange (scale path)") {
    val li = s"li_bkt_$runId"
    val o = s"o_bkt_$runId"
    Tables.t(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(li)
    Tables.t(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(o)
    val joined = spark.table(li).join(spark.table(o),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    val plan = planOf(joined)
    // the join itself must not introduce an Exchange on either side
    val joinSection = plan.substring(0, plan.length)
    val exchangesBeforeAgg = "Exchange hashpartitioning\\(l_orderkey|Exchange hashpartitioning\\(o_orderkey".r
      .findAllIn(joinSection).length
    assert(exchangesBeforeAgg == 0,
      s"bucketed join should not shuffle join keys:\n$plan")
    assert(joined.count() > 0)
  }

  test("partial (map-side) aggregation present on groupBy") {
    val plan = planOf(graft.queries.CoreSql.defs("q01_pricing_summary")(spark, dir))
    // two HashAggregate nodes: partial + final
    assert("HashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("q70 as-of join: single user_id shuffle, no range self-join") {
    val plan = planOf(graft.queries.CoreSql.defs("q70_asof_join")(spark, dir))
    // the merge-sort LOCF shape: no join operator at all — never a
    // BNLJ/range join. Two hash shuffles total: (user_id, ts) for the
    // right-side dedup agg and user_id for the window.
    assert(!plan.contains("Join"), s"as-of should be join-free:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length <= 2,
      s"unexpected extra shuffles:\n$plan")
  }

  test("per-group top-k gets WindowGroupLimit (bounded heap, not full sort)") {
    // Catalyst pushes rank()/row_number() <= k filters into partial +
    // final WindowGroupLimit — the bounded per-key top-k we'd otherwise
    // need a custom operator for; guard that our rank-filter shape keeps
    // triggering it
    val q35 = planOf(graft.queries.CoreSql.defs("q35_rank_in_group")(spark, dir))
    assert(q35.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$q35")
    val s01 = planOf(graft.queries.PipelineOps.defs("s01_cosine_topk")(spark, dir))
    assert(s01.contains("WindowGroupLimit"))
  }

  test("d10 winnowing dedup: self-join reuses one fingerprint exchange, no cartesian") {
    // the fingerprint lineage (position explode + two windows) is the
    // expensive subtree; both self-join sides must share ONE exchange
    // (measured 22 s -> 4.5 s at sf0.1 when the df-cap moved onto the
    // join's own fp-partitioned shuffle)
    val df = graft.queries.PipelineOps.defs("d10_winnowing_dedup")(spark, dir)
    assert(!planOf(df).contains("CartesianProduct"),
      "fingerprint self-join degenerated to a cartesian")
    df.collect() // AQE only materializes ReusedExchange in the FINAL plan
                 // (and only for THIS QueryExecution — count() would spawn its own)
    val finalPlan = planOf(df)
    assert(finalPlan.contains("ReusedExchange"),
      "self-join sides recompute the fingerprint lineage instead of reusing the exchange")
  }

  test("q71 band join: tiny band side broadcast, fact side never shuffles") {
    val plan = planOf(graft.queries.CoreSql.defs("q71_band_join")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!"Exchange hashpartitioning\\(l_".r.findAllIn(plan).hasNext,
      s"fact side must not shuffle before the band join:\n$plan")
  }

  test("mm08 perceptual dedup: band-key equi-join only, pixel bytes never shuffle") {
    // the candidate join must key on (band, band-value) — 8-byte hashes
    // and ids on the wire, never payloads, never a cartesian; the
    // decode stays inside the map stage before the first exchange
    val df = graft.queries.MediaCatalogOps.defs("mm08_perceptual_dedup")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "band join degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "non-equi join sneaked in")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "band-key equi-join missing")
    // the scan side legitimately reads payload for the map-side decode;
    // what must never happen is payload bytes riding an exchange
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm09 alignment gate: one id-keyed equi-join, payload never shuffles") {
    // the pair association must be a single equi-join on the shared id
    // (co-partitionable at scale; AQE broadcasts the smaller side at
    // this scale), the decode+pooling stays inside the map stage, and
    // raster bytes never ride an exchange
    val df = graft.queries.MediaCatalogOps.defs("mm09_image_text_alignment")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair association degenerated from an equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"smaller side not broadcast at test scale:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one pair join, got $joins:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm10 audio alignment gate: one id-keyed equi-join, payload never shuffles") {
    // mm09's pin for the audio modality: one equi-join on the shared
    // id, decode+pooling map-side, sample bytes never ride an exchange
    val df = graft.queries.MediaCatalogOps.defs("mm10_audio_text_alignment")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair association degenerated from an equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"smaller side not broadcast at test scale:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one pair join, got $joins:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm12 video near-dup: frame-hash equi-join only, payload never shuffles") {
    // the candidate join must key on the 64-bit frame hash — 8-byte
    // signatures and ids on the wire, never payloads, never a
    // cartesian; decode + dHash stay inside the map stage, and the
    // per-clip frame count rides along so Jaccard needs no second join
    val df = graft.queries.MediaCatalogOps.defs("mm12_video_near_dup")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "hash join degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "non-equi join sneaked in")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one candidate join, got $joins:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm14 audio near-dup: print equi-joins only, payload never shuffles") {
    // decode + window fingerprinting stay inside the map stage; the
    // candidate join keys on the 60-bit print with ids-only on the
    // wire, the per-clip print count rides along (no second join),
    // and (r9) the stop-print cut adds exactly one broadcast
    // anti-join against the tiny stop set plus the documented
    // 1-row-stat crossJoin (the suite's accepted BNLJ pattern —
    // s07/idx04's stats frame) for the fractional threshold
    val df = graft.queries.MediaCatalogOps.defs("mm14_audio_near_dup")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "print join degenerated to a cartesian")
    // the 1-row nclips stat crossJoin appears once per self-join side
    // (the kept subtree is duplicated, like the decode itself — the
    // entry's pre-existing shape); nothing else may be a BNLJ
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 2 && bnlj.forall(_.contains("nclips")),
      s"a non-stat BNLJ sneaked in:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 3,
      s"expected the candidate join + one stop anti-join per side, got $joins:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"stop-print cut must be an anti-join:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm13 frame containment: hash equi-join only, payload never shuffles") {
    // both modalities reduce to 8-byte fingerprints map-side; the
    // containment join keys on the 64-bit hash, ids-only on the wire
    val df = graft.queries.MediaCatalogOps.defs("mm13_frame_containment")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "hash join degenerated to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "non-equi join sneaked in")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one containment join, got $joins:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("mm11 video alignment gate: one id-keyed equi-join, payload never shuffles") {
    // mm09/mm10's pin for the video modality
    val df = graft.queries.MediaCatalogOps.defs("mm11_video_text_alignment")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair association degenerated from an equi-join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"smaller side not broadcast at test scale:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins == 1, s"expected exactly one pair join, got $joins:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.toLowerCase.contains("exchange") && l.toLowerCase.contains("payload")),
      s"binary payload column crossed an exchange:\n$plan")
  }

  test("sink01 partitioned export: reading one lang prunes to one partition directory") {
    // the point of the lang-partitioned layout: a single-lang reader
    // must carry the predicate as a PartitionFilter (directory prune),
    // not a post-scan row filter over every partition
    graft.queries.PipelineOps.defs("sink01_partitioned_export")(spark, dir).collect()
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-sink01-" + dir.replaceAll("[^A-Za-z0-9.-]", "_")).getPath
    val one = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang predicate did not become a partition filter:\n$scan")
    assert(!scan.contains("PushedFilters: [IsNotNull(lang"),
      "lang should prune directories, not filter rows post-scan")
  }

  test("idx02 phrase search: per-term scans prune to their bucket partitions, equi-joins only") {
    // the stored-index promise: each phrase term's scan must carry its
    // literal bucket as a PartitionFilter (directory prune) and its
    // term as a pushed predicate — the serve plan touches df(term)
    // rows, never the corpus; adjacency is (doc_id, p0) equi-joins
    val df = graft.queries.PipelineOps.defs("idx02_phrase_search")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"adjacency degenerated from an equi-join:\n$plan")
  }

  test("idx08 boolean search: pruned per-term scans, equi-join AND, anti-join NOT — never the corpus") {
    val df = graft.queries.PipelineOps.defs("idx08_boolean_search")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"the NOT clause lost its anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"boolean retrieval degenerated from equi-joins:\n$plan")
  }

  test("samp09 packing audit: every doc-row window is id-range blocked, no single-partition sort") {
    // all three packers' running totals are distPrefixSumOf's
    // two-level form: every window ordered by doc_id (the ones that
    // touch DOC rows) must carry the bkt_ id-range block in its spec;
    // only the block-SUBTOTAL windows (compressed frames, ≤ buckets
    // rows per source and length) may partition by the bare part key
    val df = graft.queries.PipelineOps.defs("samp09_packing_audit")(spark, dir)
    val plan = planOf(df)
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, s"packing lost its window form:\n$plan")
    specs.filter(_.contains("doc_id")).foreach(sp =>
      assert(sp.contains("bkt_"),
        s"doc-row window is not id-range blocked (whole-source task): $sp"))
    singlePartitionFeedsOnlyScalarAgg(plan)
  }

  test("idx09 snippet serve: artifacts only — no live corpus scan, DPP prunes the doc-store buckets") {
    // the serve plan must touch ONLY stored artifacts: the span search
    // reads pruned index buckets, and the text join-back reads the
    // doc-store sidecar with a dynamic-pruning partition filter fed by
    // the broadcast hit set — a scan of the live documents parquet
    // here would be the full-corpus-text-per-query cost the sidecar
    // exists to avoid
    val df = graft.queries.PipelineOps.defs("idx09_snippets")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("documents.parquet"),
      s"snippet serve scanned the live corpus:\n$plan")
    assert(plan.contains("dynamicpruningexpression"),
      s"doc-store scan lost its dynamic partition pruning:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("idx10 prefix suggest: dictionary-only serve — prefix pushed to the scan, bounded top-k") {
    // the autocomplete promise: suggest cost is vocabulary-shaped and
    // corpus-independent — the serve plan's only FileScan is the
    // range-sorted term dictionary with the StartsWith predicate
    // pushed to parquet (min/max stats prune non-matching files), and
    // the cut is a TakeOrdered heap, never a global sort
    val df = graft.queries.PipelineOps.defs("idx10_prefix_suggest")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("documents"),
      s"prefix suggest scanned the live corpus:\n$plan")
    assert("PushedFilters: \\[[^\\]]*StringStartsWith\\(term".r.findFirstIn(plan).isDefined,
      s"StartsWith predicate not pushed to the dictionary scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k degenerated into a global sort:\n$plan")
  }

  test("idx11 fuzzy correct: variant equi-join, queries broadcast — no pairwise vocabulary scan") {
    // the SymSpell promise: candidate generation is an EQUI-join on
    // the shared deletion variant with the (len+1)-per-query side
    // broadcast; a cartesian / nested-loop here would be the
    // quadratic all-pairs distance scan the method exists to avoid
    val df = graft.queries.PipelineOps.defs("idx11_fuzzy_correct")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("documents"),
      s"fuzzy correct scanned the live corpus:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"query variants lost their broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy correct degenerated into a pairwise scan:\n$plan")
  }

  test("idx12 index delete: tombstones apply as a broadcast anti-join, term scans stay pruned") {
    // the delete promise: a tombstoned serve costs the same pruned
    // df(term)-sized scans as an untouched index plus ONE broadcast
    // anti-join of the deletion-batch-sized tombstone table — never a
    // rebuild, never a corpus scan
    val df = graft.queries.PipelineOps.defs("idx12_index_delete")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("documents.parquet"),
      s"delete serve scanned the live corpus:\n$plan")
    assert("BroadcastHashJoin [^\\n]*LeftAnti".r.findFirstIn(plan).isDefined,
      s"tombstones lost their broadcast anti-join:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("s24 MMR re-rank: post-checkpoint serve plan never rescans the corpus, no cartesian") {
    // the MMR stage is query-bounded by contract: after the bounded
    // (queries x poolK) pool localCheckpoints, the pairwise self-join
    // and the greedy rollup must read ONLY that checkpointed frame —
    // a parquet scan here would mean pool-sized work regressed to
    // corpus-sized (s21's discipline, pinned the same way)
    val df = graft.queries.PipelineOps.defs("s24_mmr_rerank")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("Scan parquet"),
      s"MMR serve stage rescanned the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"bounded pool checkpoint missing from the serve plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pool self-join degenerated from the qid equi-join:\n$plan")
  }

  test("p14 RAG serve: the only scan is the doc store with literal bucket + id pruning") {
    // the composed serve's promise: retrieval latency is index-shaped,
    // not corpus-shaped — the IVF pool and MMR stages run before this
    // plan (bounded, checkpointed), and the ONLY FileScan left is the
    // doc-store fetch carrying the result page's LITERAL bucket INSET
    // (static partition pruning) and doc_id IN (row-group pruning);
    // a scan of the live embeddings or documents here would be the
    // corpus-sized serve cost the artifacts exist to avoid
    val df = graft.queries.PipelineOps.defs("p14_rag_serve")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("embeddings") && !plan.contains("documents.parquet"),
      s"RAG serve scanned a live corpus:\n$plan")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly the doc-store scan:\n$plan")
    assert("PartitionFilters: \\[bucket\\S* INSET".r.findFirstIn(plan).isDefined,
      s"store scan lost its literal bucket partition pruning:\n$plan")
    assert("PushedFilters: \\[In\\(doc_id".r.findFirstIn(plan).isDefined,
      s"store scan lost its pushed doc_id IN filter:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("idx06 proximity search: per-term scans prune to their buckets, equi-joins only") {
    // same serve contract as idx02: each term's scan carries its
    // literal bucket PartitionFilter + pushed term predicate; the
    // doc_id joins are equi-joins — never a corpus scan or cartesian
    val df = graft.queries.PipelineOps.defs("idx06_proximity_search")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"proximity degenerated from an equi-join:\n$plan")
    // the scale guarantee: exactly ONE row per (doc, term) crosses the
    // join — every join input aggregates its postings to a sorted
    // per-doc position array FIRST, so a high-tf doc can never blow up
    // into a per-position cross-product (the span is an in-row fold)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val lp = df.queryExecution.optimizedPlan
    val joins = lp.collect { case j: Join => j }
    assert(joins.size == 2, s"expected the 2 doc_id equi-joins:\n$lp")
    joins.foreach { j =>
      assert(j.right.collectFirst { case a: Aggregate => a }.isDefined &&
        j.left.collectFirst { case a: Aggregate => a }.isDefined,
        s"a join side is not a per-(doc, term) aggregated stream:\n$lp")
    }
    assert(plan.contains("collect_list"),
      s"positions are not aggregated per (doc, term) before the join:\n$plan")
  }

  test("idx05 index append: appended-artifact probe prunes and equals the single build") {
    // append must be invisible at serve time: same partition pruning +
    // pushed term predicate as idx02, and the answer over the appended
    // artifact is bit-identical to the single full-corpus build
    val df = graft.queries.PipelineOps.defs("idx05_index_append")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter on the appended index:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the appended-index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"adjacency degenerated from an equi-join:\n$plan")
    val appended = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val single = graft.queries.PipelineOps.defs("idx02_phrase_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(appended.toSeq == single.toSeq,
      "appended-artifact probe diverged from the single-build index")
  }

  test("idx04 BM25 serve: pruned index scans, no corpus scan, TakeOrdered top-k") {
    // serve must read ONLY the artifacts: each query term's postings
    // scan carries its literal bucket PartitionFilter + pushed term
    // predicate, the corpus text never appears, and the top-k is a
    // bounded TakeOrdered — never a global sort
    val df = graft.queries.PipelineOps.defs("idx04_bm25_serve")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the index scan:\n$plan")
    assert(!plan.contains("documents.parquet"),
      s"serve plan touched the corpus text:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("idx03 index merge: merged-artifact probe prunes and equals the single build") {
    // segment merge must be invisible at serve time: same partition
    // pruning + pushed term predicate as idx02, and the answer over
    // the merged artifact is bit-identical to the single-build index
    val df = graft.queries.PipelineOps.defs("idx03_index_merge")(spark, dir)
    val plan = planOf(df)
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"bucket literal did not become a partition filter on the merged index:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(term".r.findFirstIn(plan).isDefined,
      s"term predicate not pushed to the merged-index scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"adjacency degenerated from an equi-join:\n$plan")
    val merged = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val single = graft.queries.PipelineOps.defs("idx02_phrase_search")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq == single.toSeq,
      "merged-segment probe diverged from the single-build index")
  }

  test("d14 incremental dedup: gram equi-join only, never a cartesian on either side") {
    // the incremental path's promise is O(batch · df): batch and corpus
    // gram streams meet ONLY on the sh equi-key; any nested-loop or
    // cartesian shape would re-couple the batch to the whole corpus
    val df = graft.queries.PipelineOps.defs("d14_incremental_dedup")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"batch x corpus cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$plan")
  }

  test("task-SQL BOXPLOT over full lineitem: no per-group value collection (BoxplotScaleRule)") {
    // r7 weak mark closed: the statement gate imposes no row cap on
    // task SQL, so BOXPLOT(x, outlier_info := y) over an unbounded
    // GROUP BY must not reach the Kryo-collect UDAF — the rule routes
    // it to the percentile + broadcast join-back plan, and only true
    // Tukey outliers are ever collected
    graft.exprs.Boxplot.register(spark)
    graft.Tables.t(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    val sql = graft.sqlfront.Dialect.rewrite(
      """SELECT l_returnflag,
        |  BOXPLOT(l_quantity, outlier_info := map('ok', CAST(l_orderkey AS STRING))) AS bp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    val df = spark.sql(sql)
    val plan = planOf(df)
    assert(!plan.toLowerCase.contains("boxplotinfoagg"),
      s"task SQL still reaches the collect-per-group UDAF:\n$plan")
    assert(plan.contains("percentile"), s"distributed quartiles missing:\n$plan")
    assert(df.count() == 3, "lineitem has 3 return flags")
  }

  test("task-SQL 1-arg BOXPLOT over full lineitem: native aggregates, no UDAF (BoxplotScaleRule)") {
    // r8 weak mark closed: the no-info ELSE branch. The Dialect pass
    // already rewrites the TEXT form, but SQL that reaches spark.sql
    // without it (programmatic callers, the registered-name path) hit
    // the 1-arg BoxplotAgg UDAF — the rule now substitutes the call
    // in place for builtin max/min/percentile (no join-back needed),
    // so neither registered name can reach a collect-per-group buffer
    graft.exprs.Boxplot.register(spark)
    graft.Tables.t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_bp1")
    val df = spark.sql(
      "SELECT l_returnflag, BOXPLOT(CAST(l_quantity AS DOUBLE)) AS bp " +
        "FROM lineitem_bp1 GROUP BY l_returnflag")
    val plan = planOf(df)
    // native Percentile legitimately executes via ObjectHashAggregate
    // (bounded value->count map buffer, map-side combine); the pin is
    // that no ScalaAggregator — the Kryo collect-per-group UDAF — runs
    assert(!plan.contains("ScalaAggregator") && !plan.contains("BoxplotAgg"),
      s"1-arg BOXPLOT still reaches the collect-per-group UDAF:\n$plan")
    assert(plan.contains("percentile"), s"native quartiles missing:\n$plan")
    assert(df.count() == 3, "lineitem has 3 return flags")
  }

  test("d18 exact-substring dedup: grams-only joins, text shuffles once by doc_id") {
    // the ExactSubstr promise: corpus TEXT never self-joins — the
    // gram-df aggregation and the dup join-back run on 60-bit longs
    // built map-side, and the only text-bearing exchange is the one
    // doc_id join against each doc's dup-start list
    val df = graft.queries.PipelineOps.defs("d18_exact_substring")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"corpus cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$plan")
    // gram hashing happens inside the token array BEFORE the explode:
    // the exploded gram stream carries the hash column, never gram text
    assert(plan.contains("md5_bits60"), "gram hashing must be the native md5_bits60")
    // every hash-partitioned exchange keys on gh (the 60-bit gram
    // hash) or doc_id — never on a text/gram-string column
    val exchanges = "hashpartitioning\\(([a-zA-Z0-9_]+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    assert(exchanges.subsetOf(Set("gh", "doc_id")),
      s"unexpected shuffle keys $exchanges:\n$plan")
  }

  test("t16 BPE merge loop: one shuffle per iteration, no text re-read after iteration 1") {
    // the tokenizer-training recurrence promise: corpus text explodes
    // exactly once into the word table; each subsequent iteration is
    // one partial-agg shuffle over the CHECKPOINTED word table (no
    // parquet scan in its plan) and the merge application is a pure map
    import graft.queries.PipelineOps.{bpeWordTable, bpePairCount, bpeApplyMerge}
    val docs = graft.Tables.t(spark, dir, "documents")
    val words = bpeWordTable(docs).localCheckpoint()
    // the loop executes limit(1): the argmax must be TakeOrdered, not
    // a rangepartitioning sort exchange
    val count = bpePairCount(words).limit(1)
    count.collect()
    val countPlan = count.queryExecution.executedPlan.toString
    assert(!countPlan.contains("FileScan") && !countPlan.contains("Parquet"),
      s"iteration re-reads corpus text:\n$countPlan")
    assert(countPlan.contains("TakeOrderedAndProject"),
      s"argmax must be a bounded TakeOrdered:\n$countPlan")
    assert(!countPlan.contains("rangepartitioning"),
      s"argmax degenerated to a global sort exchange:\n$countPlan")
    // exactly one hash shuffle (AQE prints Final + Initial plans, so
    // the same Exchange can appear twice in the string)
    assert("Exchange hashpartitioning".r.findAllIn(countPlan).size <= 2,
      s"iteration pair count must be exactly one partial-agg shuffle:\n$countPlan")
    assert(countPlan.contains("partial_sum"),
      s"pair count not map-side combined:\n$countPlan")
    val merge = bpeApplyMerge(words, "e", "r")
    val mergePlan = merge.queryExecution.executedPlan.toString
    assert(!mergePlan.contains("Exchange"),
      s"merge application must be a pure map:\n$mergePlan")
  }

  test("t17 tokenizer apply: broadcast token-count table, one doc-keyed rollup shuffle") {
    // the encode promise: merge work happened on the checkpointed
    // vocab, so the rollup plan is scan -> explode -> BROADCAST join
    // with the word->n_tokens table -> one partial-agg'd shuffle on
    // doc_id; never a sort-merge join of the occurrence stream
    val df = graft.queries.PipelineOps.defs("t17_bpe_tokenize")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"token-count table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"occurrence stream must not sort or cross:\n$plan")
    // one rollup shuffle on doc_id (AQE prints Final+Initial so the
    // same exchange can appear twice); the presentation orderBy adds
    // its range exchange on top
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size <= 2,
      s"expected exactly one doc-keyed rollup shuffle:\n$plan")
    assert(!"Exchange hashpartitioning\\(w".r.findAllIn(plan).hasNext,
      s"occurrence stream shuffled by word:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"rollup not map-side combined:\n$plan")
  }

  test("t20 unigram segmentation: word-key table broadcast, one doc-keyed rollup") {
    // t17's serve shape: the DP ran on the distinct-word table, the
    // word -> key table broadcasts onto the occurrence stream, the
    // occurrence stream never sorts or shuffles by word
    val df = graft.queries.PipelineOps.defs("t20_unigram_segmentation")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "word-key table not broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"occurrence stream must not sort or cross:\n$plan")
    assert(!"Exchange hashpartitioning\\(w".r.findAllIn(plan).hasNext,
      s"occurrence stream shuffled by word:\n$plan")
  }

  test("cur03 datasheet + spl03 temporal audit: map-side rows, partial-agg rollups, no corpus joins") {
    val c3 = planOf(graft.queries.PipelineOps.defs("cur03_source_datasheet")(spark, dir))
    assert(!c3.contains("CartesianProduct") && !c3.contains("SortMergeJoin"),
      s"datasheet must not join the corpus:\n$c3")
    assert(c3.contains("partial_count") || c3.contains("partial_sum"),
      "datasheet rollups not map-side combined")
    val s3 = planOf(graft.queries.PipelineOps.defs("spl03_temporal_split")(spark, dir))
    assert(!s3.contains("CartesianProduct") && !s3.contains("SortMergeJoin"),
      s"temporal audit must not join the corpus:\n$s3")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(s3).size <= 4,
      s"per-user flags must be one rollup per side at most:\n$s3")
  }

  test("p06 governed release: two broadcast joins total, blocklist join-free, no cartesian") {
    // the composition's promise: the opt-out gate is in-row (adds NO
    // join), the span stage contributes exactly its two joins (eval
    // grams broadcast + rare hit-position attach), lang rides the
    // carry so nothing joins back, and the split tag is a pure map
    val df = graft.queries.PipelineOps.defs("p06_governed_release")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-keyed shuffle join sneaked into the composition:\n$plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)".r
      .findAllIn(plan).size
    assert(joins == 2, s"expected exactly the span stage's 2 joins, got $joins:\n$plan")
  }

  test("lm03 Kneser-Ney: model tables broadcast, doc bigram stream never sorts") {
    // the four model tables (bigram counts, left/continuation stats,
    // scalar total) are vocab-sized and must broadcast onto the
    // map-side doc bigram stream; the only data shuffle is the
    // doc-keyed rollup
    val df = graft.queries.PipelineOps.defs("lm03_kneser_ney")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "model tables must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      s"doc bigram stream must not shuffle for the model join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size <= 2,
      s"expected exactly one doc-keyed rollup shuffle:\n$plan")
  }

  test("guard02 drift: cell rollups map-side combined, corpus never joins corpus") {
    // the only exchanges are the two per-corpus cell rollups (plus the
    // presentation sort); the full-outer join sees cells-count frames,
    // and no corpus-row join exists to degenerate
    val df = graft.queries.PipelineOps.defs("guard02_distribution_drift")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert(plan.contains("partial_sum"), "cell masses not map-side combined")
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).hasNext,
      s"corpus rows shuffled by doc_id:\n$plan")
  }

  test("dec04 span decontamination: eval grams broadcast, corpus gram stream never sorts") {
    // dec01's shape at token granularity: the eval gram set must ride
    // a broadcast; a sort-merge join here would shuffle the full
    // corpus gram stream at 100 TB
    val df = graft.queries.PipelineOps.defs("dec04_span_decontaminate")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "eval gram join must be broadcast")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus gram stream must not shuffle for the eval join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
  }

  test("samp05 epoch plan: fractional fill is a bounded heap, no cartesian") {
    // the fractional-epoch fill must reuse samp04's shape: literal
    // rankCap bound -> WindowGroupLimit per lang, remainder table
    // broadcast; the only crossJoins are the documented broadcast-tiny
    // stat frames inside tokenBudgetsOf
    val df = graft.queries.PipelineOps.defs("samp05_epoch_plan")(spark, dir)
    val plan = planOf(df)
    assert("WindowGroupLimit \\[lang".r.findFirstIn(plan).isDefined,
      s"fractional fill rank must be a bounded heap:\n$plan")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian")
    assert(plan.contains("BroadcastHashJoin"), "remainder/budget tables must broadcast")
  }

  test("u02 blocklist: rules broadcast onto the map-side suffix chain, no cartesian") {
    // the corpus must never shuffle to be matched: the label-bounded
    // suffix explode is map-side and the rule table rides a broadcast;
    // the only exchanges belong to the tiny per-rule rollup
    val df = graft.queries.PipelineOps.defs("u02_domain_blocklist")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "rule table must broadcast")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"suffix stream must not sort or cross:\n$plan")
    assert(!"Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).hasNext,
      s"corpus shuffled by doc_id to be matched:\n$plan")
  }

  test("t19 fertility audit: broadcast token-count table, one lang-keyed rollup shuffle") {
    // t17's encode shape with the rollup keyed by lang: the word ->
    // token-count table broadcasts onto the occurrence stream, the
    // occurrence stream never sorts or shuffles by word, and the only
    // data shuffle is the partial-agg'd lang rollup (languages-count
    // rows out at any corpus size)
    val df = graft.queries.PipelineOps.defs("t19_tokenizer_fertility")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"token-count table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"occurrence stream must not sort or cross:\n$plan")
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(plan).size <= 2,
      s"expected exactly one lang-keyed rollup shuffle (AQE may print it twice):\n$plan")
    assert(!"Exchange hashpartitioning\\(w".r.findAllIn(plan).hasNext,
      s"occurrence stream shuffled by word:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"rollup not map-side combined:\n$plan")
  }

  test("s12 bitext mining: broadcast candidate pass, bounded-heap kNN, windowless election") {
    // candidate generation is the documented broadcast nested loop
    // (dec03's shape: tiny lang block broadcast, big side map-side);
    // the kNN top-k must run as WindowGroupLimit bounded heaps and the
    // per-source election as a partial-agg max(struct), never a window
    val df = graft.queries.PipelineOps.defs("s12_bitext_mining")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"candidate pass must broadcast the smaller language block:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unbroadcast cartesian sneaked in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"kNN top-k not a bounded heap:\n$plan")
    assert(plan.contains("partial_max"),
      s"per-source election not map-side combined:\n$plan")
  }

  test("d20 stored dedup index: probe reads the parquet artifact, equi-joins only") {
    // the serve job's plan must scan the STORED postings/sizes (no
    // corpus text re-shingle on the corpus side) and join on gram/id
    // keys only — never a cartesian; corpus text appears exactly once
    // (the batch side's own scan)
    val df = graft.queries.PipelineOps.defs("d20_dedup_index_persist")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("graft-d20"), s"probe not reading the stored artifact:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"probe degenerated from equi-joins:\n$plan")
    assert("shingles3".r.findAllIn(plan).size <= 2,
      s"corpus side re-shingled despite the stored index (batch side only expected):\n$plan")
  }

  test("p05 corpus release: broadcast anti-join removal, windowless, no cartesian") {
    // the drop set (cluster members minus keepers) must broadcast into
    // a LeftAnti hash join against the corpus scan; the election and
    // rollup stay windowless partial aggregations
    val df = graft.queries.PipelineOps.defs("p05_corpus_release")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"survivor cut not a broadcast anti-join:\n$plan")
    assert(!plan.contains("Window"), s"window sneaked into the release plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join sneaked in:\n$plan")
    assert(plan.contains("partial_max") && plan.contains("partial_sum"),
      s"election/rollup not map-side combined:\n$plan")
  }

  test("spl02 split leakage: equi-joins only, windowless 2-row rollup") {
    val df = graft.queries.PipelineOps.defs("spl02_split_leakage")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"leak search degenerated from equi-joins:\n$plan")
    assert(!plan.contains("Window"), s"rollup must not window:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"rollup not map-side combined:\n$plan")
  }

  test("d19 quality keep: windowless partial-agg election, no cartesian") {
    // the per-cluster argmax must be a partial-aggregable max(struct),
    // never a window over cluster members; the score stays in-row
    val df = graft.queries.PipelineOps.defs("d19_quality_keep")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("Window"),
      s"election degenerated to a window over members:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join sneaked in:\n$plan")
    assert(plan.contains("partial_max"),
      s"keep election not map-side combined:\n$plan")
  }

  test("d21 soft dedup: broadcast weight attach, no window, no cartesian") {
    // the per-doc weight attach must be a broadcast left join of the
    // (tiny) clustered-id weight table onto the map-side token scan —
    // the corpus itself must not shuffle again after d11's propagation
    val df = graft.queries.PipelineOps.defs("d21_soft_dedup_weights")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("Window"),
      s"weight attach must not window the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join sneaked in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table not broadcast onto the corpus scan:\n$plan")
  }

  test("p07 weighted release: broadcast weight join, windowless partial-agg card") {
    // d21's weight table broadcasts onto the map-side token/split
    // scan; the card is one partial-agg'd rollup — no window, no
    // cartesian, no second corpus-keyed shuffle after the labels
    val df = graft.queries.PipelineOps.defs("p07_weighted_release")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"card must not window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join sneaked in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table not broadcast onto the corpus scan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"card not map-side combined:\n$plan")
  }

  test("d23 bloom dedup gate: sketch probe filters before the semi join, no cartesian") {
    val df = graft.queries.PipelineOps.defs("d23_bloom_dedup_gate")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian grew:\n$plan")
    // the map-side sketch probe must sit in the plan (a UDF filter on
    // the batch side, BELOW the exact-confirm semi join)
    assert(plan.contains("UDF"), s"bloom probe filter missing:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact confirm join missing:\n$plan")
    // the per-doc rollup joins back broadcast — batch sizes never
    // shuffle to meet the dup counts
    assert(plan.contains("BroadcastHashJoin"),
      s"rollup join-back not broadcast:\n$plan")
  }

  test("t21 C4 line gate: pure map — no join, no window, no hash exchange") {
    // line filter + doc cascade are all in-row; the only exchange
    // permitted is the presentation sort's range partitioning
    val df = graft.queries.PipelineOps.defs("t21_c4_line_gate")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"in-row operator grew a join:\n$plan")
    assert(!plan.contains("Window"), s"in-row operator grew a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"in-row operator grew an aggregation shuffle:\n$plan")
  }

  test("s19 NN-descent: edge-keyed equi-joins only, bounded per-vertex heap, no corpus self-join") {
    // the refinement's promise: candidates come from the edge list
    // joining ITSELF on the middle vertex plus two id point-lookups
    // into the embedding table — never a corpus x corpus shape
    val df = graft.queries.PipelineOps.defs("s19_nn_descent")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"NN-descent degenerated to a non-equi join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-vertex top-k must be a bounded heap:\n$plan")
  }

  test("s20 graph-ANN serve: serve session scans the cold artifact + id lookups — no build subtree") {
    // the build-vs-serve pin: once the graph artifact exists (built by
    // the memoized index job), a serve session must execute ONLY the
    // beam-search dataflow — the stored adjacency parquet plus id
    // point-lookups into the embedding table. A kmeans/kNN/NN-descent
    // subtree in any serve-time plan means the index is being rebuilt
    // per session (the r9 design flag). Per-round localCheckpoints
    // hide the early rounds from the final plan, so the pin captures
    // EVERY plan the serve session executes via a listener.
    graft.queries.PipelineOps.defs("s20_graph_ann_serve")(spark, dir).count() // ensure the artifact is built
    val plans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { plans.add(qe.executedPlan.toString); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.queries.PipelineOps.defs("s20_graph_ann_serve")(spark, dir).count()
      // the listener bus is async — wait until the artifact-scan plan
      // lands, then a grace beat for any stragglers
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      import scala.jdk.CollectionConverters._
      while (!plans.asScala.exists(_.contains("graft-s20")) &&
          System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(300)
      val got = plans.asScala.toVector
      assert(got.exists(_.contains("graft-s20")),
        "serve never scanned the stored graph artifact")
      assert(got.exists(_.contains("embeddings")),
        "serve lost its id point-lookups into the embedding table")
      got.foreach { p =>
        assert(!p.contains("cluster#"),
          s"a serve-time plan contains a kmeans build subtree:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("t23 html extraction: pure map — no join, no window, no hash exchange") {
    // page build + block classification + reassembly are all in-row;
    // the only exchange permitted is the presentation sort
    val df = graft.queries.PipelineOps.defs("t23_html_extract")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"in-row operator grew a join:\n$plan")
    assert(!plan.contains("Window"), s"in-row operator grew a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"in-row operator grew an aggregation shuffle:\n$plan")
  }

  test("samp06 curriculum: map-side score/bin, broadcast 1-row thresholds, no corpus join") {
    // the threshold frame is one row (the suite's accepted stat-frame
    // BNLJ); everything else is in-row + two partial-agg exchanges
    // (the percentile pass and the (epoch, bin) rollup)
    val df = graft.queries.PipelineOps.defs("samp06_curriculum_schedule")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct)".r
      .findFirstIn(plan).isDefined, s"curriculum grew a corpus join:\n$plan")
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 1, s"more than the 1-row threshold crossJoin:\n$plan")
    assert(!plan.contains("Window"), s"curriculum grew a window:\n$plan")
  }

  test("samp08 temperature grid: one corpus pass — checkpointed mass, broadcast normalizer") {
    // the lang-mass rollup is localCheckpointed; the grid and its
    // per-tau normalizers derive from it, so no parquet scan survives
    // in the final plan and the join-back is a broadcast over the
    // tau-count frame
    val df = graft.queries.PipelineOps.defs("samp08_temperature_grid")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("FileScan parquet"),
      s"grid re-scanned the corpus after the mass rollup:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed mass frame as the scan barrier:\n$plan")
    assert(!"(SortMergeJoin|ShuffledHashJoin|CartesianProduct)".r
      .findFirstIn(plan).isDefined, s"grid grew a shuffle join:\n$plan")
    assert(!plan.contains("Window"), s"grid grew a window:\n$plan")
  }

  test("samp07 doremi: one corpus pass — checkpoint barrier, no downstream rescan") {
    // the domain rollup is localCheckpointed (the corpus is read
    // exactly once); everything after it — corpus mean, normalizer,
    // mixture — derives from the tiny checkpointed frame, so the
    // final plan must contain NO parquet scan at all, only the two
    // 1-row stat BNLJs over the checkpoint RDD
    val df = graft.queries.PipelineOps.defs("samp07_doremi_reweight")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("FileScan parquet"),
      s"doremi re-scanned the corpus after the domain rollup:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed domain frame as the scan barrier:\n$plan")
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct)".r
      .findFirstIn(plan).isDefined, s"doremi grew a corpus join:\n$plan")
    // 3 BNLJs: the ref and z stat crossJoins plus the normalizer
    // branch re-deriving raw (its own ref crossJoin) — all over the
    // domain-count checkpoint frame, zero corpus work
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 3, s"more than the tiny-frame stat crossJoins:\n$plan")
    assert(!plan.contains("Window"), s"doremi grew a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"post-checkpoint stats grew a hash shuffle:\n$plan")
  }

  test("p11 media release: decode-once barrier — no second media scan, banded self-join only") {
    // payload decode happens in ONE mapPartitions pass behind the
    // feats checkpoint; downstream may only scan the embeddings
    // parquet (the caption side) — a second media scan means the
    // composition re-decodes
    val df = graft.queries.MediaCatalogOps.defs("p11_media_release")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("ExistingRDD"),
      s"expected the decode-once checkpoint barrier:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"a post-barrier scan — media re-decoded or captions re-joined:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"release grew a cartesian:\n$plan")
    assert(!plan.contains("Window"), s"release grew a window:\n$plan")
  }

  test("sink04 tar audit: one shard-keyed rollup over the binary scan, no join") {
    // the audit is a flatMap over whole-shard rows feeding one
    // partial-agg shuffle — shard files are the parallelism unit
    val dir0 = java.nio.file.Files.createTempDirectory("sink04plan").toString
    import spark.implicits._
    val docs = Seq((1L, "en", "s", "a b"), (2L, "fr", "s", "c"))
      .toDF("doc_id", "lang", "source", "text")
    graft.queries.PipelineOps.tarShardWrite(docs, dir0, shards = 2)
    val plan = planOf(graft.queries.PipelineOps.tarShardAudit(spark, dir0))
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"tar audit grew a join:\n$plan")
    assert(!plan.contains("Window"), s"tar audit grew a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shard-keyed aggregation shuffle:\n$plan")
  }

  test("t24 zipf audit: one corpus pass — checkpointed vocab, TakeOrdered cut") {
    // the term rollup is localCheckpointed (the corpus is read once);
    // totals and the top-v fit both derive from the vocab frame, so
    // the final plan has NO parquet scan; the top-v cut must be a
    // TakeOrdered, never a global sort materialization
    val df = graft.queries.PipelineOps.defs("t24_zipf_audit")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("FileScan parquet"),
      s"zipf audit re-scanned the corpus after the term rollup:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed vocab frame as the scan barrier:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-v cut should be a TakeOrdered:\n$plan")
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct)".r
      .findFirstIn(plan).isDefined, s"zipf audit grew a corpus join:\n$plan")
    val bnlj = plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 1, s"more than the 1-row totals crossJoin:\n$plan")
  }

  test("cur05 source concentration: one corpus rollup, windows on the tiny frame") {
    // one source-keyed hash exchange reduces the corpus; the rank
    // windows and the fold run on the sources-count frame (their
    // single-partition exchange is over ~20 rows)
    val df = graft.queries.PipelineOps.defs("cur05_source_concentration")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"concentration audit grew a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one source-keyed aggregation shuffle:\n$plan")
  }

  test("d25 lsh calibration: shingle equi-join only, in-row config explode") {
    // the pair table is d03's inverted-index equi-join (never a
    // cartesian); the 5-config explode is in-row and the rollup is
    // one tiny partial-agg — no window, no broadcast-loop join
    val df = graft.queries.PipelineOps.defs("d25_lsh_calibration")(spark, dir)
    val plan = planOf(df)
    assert(!"(CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"calibration grew a cartesian:\n$plan")
    assert(!plan.contains("Window"), s"calibration grew a window:\n$plan")
    assert(plan.contains("Generate explode"),
      s"config explode should be in-row:\n$plan")
  }

  test("cur04 source overlap: NO fingerprint self-join — reduce-side rollups only") {
    // the classic implementation self-joins the fingerprint table
    // (f² on a boilerplate fp); this kernel must instead reduce to
    // per-fp source lists and explode pairs in-row: zero joins, three
    // hash exchanges ((fp, source) rollup, fp grouping, pair rollup)
    val df = graft.queries.PipelineOps.defs("cur04_source_overlap")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"overlap matrix grew a join:\n$plan")
    assert(!plan.contains("Window"), s"overlap matrix grew a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 3,
      s"more than the three reduce-side exchanges:\n$plan")
  }

  test("u05 dp release: in-row clip, one cell rollup, map-side noise — no join") {
    // the clip is in-row before the partial agg, the Laplace draw is
    // a projection over the cells-count result: one hash exchange,
    // nothing else
    val df = graft.queries.PipelineOps.defs("u05_dp_release")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"dp release grew a join:\n$plan")
    assert(!plan.contains("Window"), s"dp release grew a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one cell-keyed aggregation shuffle:\n$plan")
  }

  test("p10 crawl chain: ZERO joins — pure map into one lang rollup") {
    // extract → line gate → intra-doc dedup are all in-row, so the
    // whole composition is a map feeding exactly one partial-agg
    // shuffle (plus the 5-row presentation sort)
    val df = graft.queries.PipelineOps.defs("p10_crawl_v1")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"the crawl chain grew a join:\n$plan")
    assert(!plan.contains("Window"), s"the crawl chain grew a window:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one aggregation shuffle:\n$plan")
  }

  test("d22 intra-doc dedup: pure map — no join, no window, no hash exchange") {
    // the whole operator is in-row; the only exchange permitted is the
    // presentation sort's range partitioning
    val df = graft.queries.PipelineOps.defs("d22_intradoc_dedup")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"in-row operator grew a join:\n$plan")
    assert(!plan.contains("Window"), s"in-row operator grew a window:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"in-row operator grew an aggregation shuffle:\n$plan")
  }

  test("p09 curation v4: exactly one corpus-keyed shuffle join in the whole composition") {
    // stages 1-2 are in-row; the only non-broadcast join allowed is
    // the d23 confirm semi-join on chunk hashes; the gate verdict and
    // the card join back broadcast
    val df = graft.queries.PipelineOps.defs("p09_curation_v4")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"cartesian grew:\n$plan")
    val shuffleJoins = "(SortMergeJoin|ShuffledHashJoin)".r.findAllIn(plan).size
    assert(shuffleJoins <= 1,
      s"expected at most one corpus-keyed shuffle join, got $shuffleJoins:\n$plan")
    assert(plan.contains("UDF"), "bloom probe prefilter missing from the composition")
  }

  test("t22 tfidf keywords: broadcast df join, per-doc bounded heap, no cartesian") {
    // the df table and the 1-row N stat must broadcast; the per-doc
    // top-k must be a WindowGroupLimit over (score desc) — never a
    // global sort; no real cartesian (the 1-row N crossJoin is a
    // broadcast nested loop by construction)
    val df = graft.queries.PipelineOps.defs("t22_tfidf_keywords")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), "df table join is not broadcast")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert("WindowGroupLimit \\[doc_id[^\\]]*\\], \\[score".r.findFirstIn(plan).isDefined,
      s"per-doc top-k must be a bounded heap over score:\n$plan")
  }

  test("p08 training order: pure map + one partial-agg rollup, no join, no window") {
    val df = graft.queries.PipelineOps.defs("p08_training_order")(spark, dir)
    val plan = planOf(df)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
      .findFirstIn(plan).isDefined, s"manifest audit grew a join:\n$plan")
    assert(!plan.contains("Window"), s"manifest audit grew a window:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one rollup shuffle, got $exchanges:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "rollup must partial-aggregate map-side")
  }

  test("d24 alternating CC round: equi-joins on node ids only, no cartesian") {
    // one large-star + small-star round over an edge frame — the plan
    // the driver loop repeats; both stars must meet their min tables
    // through equi-joins (the loop's eager actions hide this from the
    // entry's final plan, so the round is pinned directly)
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val plan = planOf(graft.queries.PipelineOps.ccSmallStar(
      graft.queries.PipelineOps.ccLargeStar(e)))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"star round grew a cartesian:\n$plan")
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findFirstIn(plan).isDefined, "node-id equi-join missing")
  }

  test("d15 skew-robust incremental dedup: prefix equi-joins only, no cartesian") {
    val df = graft.queries.PipelineOps.defs("d15_incremental_skew")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), s"cartesian in the prefix path:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$plan")
  }

  test("sink02 sharded output: reading one shard prunes to one partition directory") {
    // the shard layout exists so trainers can read shard i without
    // touching the other N-1 directories
    graft.queries.PipelineOps.defs("sink02_sharded_output")(spark, dir).collect()
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      "graft-sink02-" + dir.replaceAll("[^A-Za-z0-9.-]", "_")).getPath
    val one = spark.read.parquet(out).filter(col("shard") === 3)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(shard"),
      s"shard predicate did not become a partition filter:\n$scan")
  }

  test("lm01 LM scoring: model joins broadcast, corpus gram stream never sort-merges") {
    // the trigram/bigram count tables are the small side — if either
    // scoring join degrades to a sort-merge, the full corpus gram
    // stream (the 100 TB-scale explode) shuffles on string keys
    val df = graft.queries.PipelineOps.defs("lm01_ngram_lm_score")(spark, dir)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"both model joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus gram stream shuffled into a sort-merge join:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "map-side partial aggregation missing on the per-doc rollup")
  }

  test("chunk01 sliding windows: pure map-side generation, no exchange before the output sort") {
    val df = graft.queries.PipelineOps.defs("chunk01_sliding_windows")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("documents"), "documents scan missing from plan")
    // exactly the output-ordering exchange (rangepartitioning for the
    // orderBy) — any hashpartitioning exchange means the chunker
    // introduced a shuffle a 100 TB run would pay per-document
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunk generation must not shuffle:\n$plan")
    assert(plan.contains("Generate explode"), "sequence+explode window generation missing")
  }

  test("dec02 contamination audit: eval grams broadcast, corpus explode map-side, no corpus self-join") {
    val df = graft.queries.PipelineOps.defs("dec02_contamination_audit")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("documents"), "documents scan missing from plan")
    assert(plan.contains("BroadcastHashJoin"),
      "the tiny eval gram set must broadcast against the corpus stream")
    assert(!plan.contains("CartesianProduct"), "gram join degenerated to a cartesian")
  }

  test("dec03 semantic contamination: broadcast eval block, single corpus pass, partial-agg argmax") {
    val df = graft.queries.PipelineOps.defs("dec03_semantic_contamination")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("embeddings"), "embeddings scan missing from plan")
    // the eval block is deliberately broadcast-nested-loop (tiny side x
    // full scan, the s01 brute-force shape); what must NOT appear is a
    // shuffled corpus-x-corpus join or a window over all pairs
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "eval block must broadcast against the corpus scan")
    assert(!plan.contains("Window"), "argmax must be max(struct), not a window")
    assert(!plan.contains("SortMergeJoin"), "corpus must never sort-merge here")
  }

  test("lm02 ccnet buckets: threshold table broadcast back, no corpus-wide window sort") {
    val df = graft.queries.PipelineOps.defs("lm02_ccnet_buckets")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("documents"), "documents scan missing from plan")
    assert(plan.contains("percentile"), "tercile thresholds must be partial-aggregable percentile")
    assert(!plan.contains("Window"),
      "bucketing must assign via broadcast thresholds, never ntile over the corpus")
    assert(plan.contains("BroadcastHashJoin"), "threshold/model tables must broadcast")
  }

  test("sel01 quality floor select: bounded-heap floor rank + TakeOrdered cut") {
    val df = graft.queries.PipelineOps.defs("sel01_quality_floor_select")(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      "floor rank must run as a bounded heap (rank <= literal), not a full per-lang sort")
    assert(plan.contains("TakeOrderedAndProject"),
      "the budget cut must be top-N, not a global sort + limit")
    assert(!plan.contains("CartesianProduct"))
  }

  test("bp01 boxplot: partial-aggregable percentile + broadcast join-back, no per-group value collection") {
    // round-6 verdict: the old bp01 ran the BoxplotInfoAgg UDAF, which
    // Kryo-collects every (value, info) pair per group — 5.7x on a
    // single-row-group scan. The scale form is the oracle CTE's own
    // shape: exact quartiles via builtin percentile (map-side combine),
    // whiskers/outliers via ONE broadcast join-back against the 5-row
    // quartile frame. Only actual outliers are ever collected.
    val df = graft.queries.EngineOps.defs("bp01_boxplot_outliers")(spark, dir)
    val plan = planOf(df)
    assert(!plan.toLowerCase.contains("boxplot"),
      s"UDAF value-collection is back in the bp01 plan:\n$plan")
    assert(plan.contains("percentile"), "builtin percentile aggregation missing")
    assert(plan.contains("BroadcastHashJoin"),
      "quartile join-back must broadcast the tiny per-group frame")
    assert(!plan.contains("CartesianProduct"), "join-back degenerated to a cartesian")
  }
}
