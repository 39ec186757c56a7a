package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `.explain("formatted")` for selected queries so
  * pushdown/broadcast/codegen can be reviewed (`java ... graft.Plans
  * [sfDir] [query...]`). The scale checklist per plan: filters reach the
  * parquet scan (PushedFilters), projections prune (ReadSchema),
  * dimension joins broadcast, aggregations have partial map-side phases,
  * and hot paths sit inside WholeStageCodegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q10_join_star", "q15_local_supplier",
        "q70_asof_join", "q71_band_join", "d04_dedup_minhash",
        "d06_dedup_embedding", "d09_prefix_filter_jaccard",
        "d10_winnowing_dedup", "p01_pipeline_e2e", "s01_cosine_topk",
        "s03_ann_lsh", "s04_kmeans_cluster", "t03_token_stats",
        "t07_bpe_token_count", "mm03_image_features")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
