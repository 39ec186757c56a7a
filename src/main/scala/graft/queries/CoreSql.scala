package graft.queries

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface: the SQL classes shaper admits through its
  * statement gate (SURVEY.md §2.A) — aggregation, joins of every type,
  * window functions, grouping sets/rollup/cube, set ops, pivot/unpivot,
  * subqueries, string/date functions. Shaper delegates all of these to
  * DuckDB (reference: server/core/sql_validation.go:93-177 admits them;
  * no Go code constrains semantics), so our build exposes Spark SQL's
  * native implementations and the DuckDB oracle checks parity.
  *
  * Determinism rules used throughout (driver hashes values after sorting
  * columns by name): every float aggregate is `round(...)`-ed identically
  * on both sides, every result has a total ORDER BY, and ranking windows
  * always carry a unique tiebreak key.
  *
  * Scale notes: all queries are declarative DataFrame plans — Catalyst
  * pushes filters/projections to the parquet scan, aggregations get
  * map-side partial agg, and small dimension sides are broadcast
  * explicitly. No driver-side loops, no collect.
  */
object CoreSql {

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- aggregation ---------------------------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      // TPC-H Q1 shape: single fact scan, 2-key groupBy → partial agg map-side,
      // 6-row result. At 100 TB this is scan-bound; filter pushes to parquet.
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q02_agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q03_having" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), round(avg("c_acctbal"), 2).as("avg_bal"))
        .filter(col("n_cust") > 50)
        .orderBy("c_nationkey")
    }),

    "q04_filtered_agg" -> ((s, d) => {
      // FILTER-clause aggregation (conditional agg) — codegen-friendly
      // `sum(when(...))`, no UDF.
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
          round(sum(when(col("o_totalprice") > 100000.0, col("o_totalprice"))), 2).as("big_total"))
        .orderBy("o_orderpriority")
    }),

    "q05_stats" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("l_linestatus")
    }),

    "q06_percentiles" -> ((s, d) => {
      // Exact linear-interpolation percentile — matches DuckDB quantile_cont
      // (reference uses quantile_cont in BOXPLOT, custom_types.go:104-129).
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("q1"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("q2"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("q3"))
        .orderBy("l_returnflag")
    }),

    // ---- joins ---------------------------------------------------------
    "q10_join_star" -> ((s, d) => {
      // Star join: fact ⋈ broadcast dims. nation/region are broadcast at any
      // SF; customer joins shuffle on the key (AQE handles skew at scale).
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum(revenue), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    "q11_top_orders" -> ((s, d) => {
      // partial aggregation BELOW the join: revenue reduces per order key
      // on the 4x-larger fact side first, so the join moves one row per
      // order instead of one per line item — Catalyst doesn't push aggs
      // through joins on its own, so this is written in explicitly
      val li = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(revenue).as("rev"))
      val o = t(s, d, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate"),
          round(col("rev"), 2).as("order_revenue"))
        .orderBy(col("order_revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    "q12_semi_join" -> ((s, d) => {
      // EXISTS → left_semi: no row multiplication, streams the build side.
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 300000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q13_anti_join" -> ((s, d) => {
      // NOT EXISTS → left_anti (customers with no orders before 1996).
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q14_outer_join" -> ((s, d) => {
      // Left outer + null-aware aggregation over the optional side.
      val n = t(s, d, "nation")
      val sup = t(s, d, "supplier")
      n.join(sup, col("n_nationkey") === col("s_nationkey"), "left")
        .groupBy("n_nationkey", "n_name")
        .agg(
          count(col("s_suppkey")).as("n_suppliers"),
          round(coalesce(sum("s_acctbal"), lit(0.0)), 2).as("total_bal"))
        .orderBy("n_nationkey")
    }),

    "q15_local_supplier" -> ((s, d) => {
      // TPC-H Q5 shape: multi-way join with an extra equality between two
      // dimension keys (customer nation == supplier nation) + date filter.
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      val n = broadcast(t(s, d, "nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q16_values_join" -> ((s, d) => {
      // Inline VALUES relation joined to a fact — broadcast by construction.
      import s.implicits._
      val weights = Seq(
        ("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3),
        ("4-NOT SPECIFIED", 2), ("5-LOW", 1)).toDF("prio", "weight")
      t(s, d, "orders")
        .join(broadcast(weights), col("o_orderpriority") === col("prio"))
        .groupBy("weight")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("weight")
    }),

    // ---- subqueries ----------------------------------------------------
    "q20_scalar_subquery" -> ((s, d) => {
      // Scalar subquery: Catalyst plans the avg as a broadcast single-row join.
      val p = t(s, d, "part")
      val avgPrice = p.agg(avg("p_retailprice").as("ap"))
      p.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("ap") * 1.02)
        .select(col("p_partkey"), col("p_name"), round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy("p_partkey")
    }),

    "q21_correlated" -> ((s, d) => {
      // Correlated "above own brand average" — decorrelated into a join on
      // the correlation key (exactly what Catalyst/DuckDB do internally).
      val p = t(s, d, "part")
      val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
        .agg(avg("p_retailprice").as("brand_avg"))
      p.join(brandAvg, col("p_brand") === col("b_brand"))
        .filter(col("p_retailprice") > col("brand_avg") * 1.02)
        .select(col("p_partkey"), col("p_brand"), round(col("p_retailprice"), 2).as("price"))
        .orderBy("p_partkey")
    }),

    "q22_in_subquery" -> ((s, d) => {
      val n = t(s, d, "nation")
      val r = t(s, d, "region").filter(col("r_name") === "AMERICA")
      val amNations = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      t(s, d, "customer")
        .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // ---- grouping sets / rollup / cube --------------------------------
    "q25_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "q26_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    "q27_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    // ---- set operations ------------------------------------------------
    "q30_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    "q31_except" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")
    }),

    "q32_union" -> ((s, d) => {
      t(s, d, "customer")
        .select(col("c_name").as("name"), lit("customer").as("kind"))
        .filter(col("c_acctbal") > 9900.0)
        .union(t(s, d, "supplier")
          .select(col("s_name").as("name"), lit("supplier").as("kind"))
          .filter(col("s_acctbal") > 9000.0))
        .orderBy("kind", "name")
    }),

    // ---- window functions ----------------------------------------------
    "q35_rank_in_group" -> ((s, d) => {
      // Top-3 suppliers by revenue per nation. Revenue rounded before
      // ranking and a unique tiebreak key → deterministic across engines.
      val rev = t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(round(sum(revenue), 2).as("supp_revenue"))
      val sup = t(s, d, "supplier")
      val w = Window.partitionBy("s_nationkey")
        .orderBy(col("supp_revenue").desc, col("s_suppkey").asc)
      sup.join(rev, col("s_suppkey") === col("l_suppkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("s_nationkey", "rk", "s_suppkey", "s_name", "supp_revenue")
        .orderBy("s_nationkey", "rk")
    }),

    "q36_running_sum" -> ((s, d) => {
      // Running total per supplier over a unique total order — the rows
      // frame makes FP accumulation order identical on both engines.
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .filter(col("l_suppkey") <= 5)
        .withColumn("running_qty", round(sum("l_quantity").over(w), 2))
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "running_qty")
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    }),

    "q37_lag_lead" -> ((s, d) => {
      // Per-customer order deltas.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        .filter(col("o_custkey") <= 100)
        .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
        .withColumn("next_date", lead("o_orderdate", 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice"), 2).as("price"), col("prev_price"), col("next_date"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "q38_first_last" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer")
        .withColumn("richest", first("c_name").over(w))
        .withColumn("poorest", last("c_name").over(w))
        .select("c_nationkey", "richest", "poorest").distinct()
        .orderBy("c_nationkey")
    }),

    "q39_ntile_share" -> ((s, d) => {
      // Quartiles + share-of-total per market segment.
      val seg = t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(round(sum("c_acctbal"), 2).as("seg_bal"))
      val w = Window.orderBy(col("seg_bal").desc, col("c_mktsegment"))
      val wAll = Window.partitionBy()
      seg
        .withColumn("quartile", ntile(2).over(w))
        .withColumn("share", round(col("seg_bal") / sum("seg_bal").over(wAll), 4))
        .orderBy("c_mktsegment")
    }),

    // ---- pivot / unpivot ----------------------------------------------
    "q40_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy("o_orderpriority")
    }),

    "q41_unpivot" -> ((s, d) => {
      // Wide per-brand metrics → long (metric, value) pairs.
      // avg_price goes through exact integer cents: a double avg() is
      // accumulation-ORDER-dependent at the last ulp, and Brand#15's
      // mean sits exactly on a .xx5 rounding boundary — any relayout
      // or split-count change would flip the rounded value against the
      // oracle. Summing cents is order-free; the single double
      // division afterwards is IEEE-deterministic on both engines.
      val wide = t(s, d, "part")
        .groupBy("p_brand")
        .agg(
          round(sum(round(col("p_retailprice") * 100, 0).cast("long")).cast("double")
            / count(lit(1)) / 100.0, 2).as("avg_price"),
          round(avg(col("p_size").cast("double")), 2).as("avg_size"))
      wide.unpivot(Array(col("p_brand")),
          Array(col("avg_price"), col("avg_size")), "metric", "value")
        .orderBy("p_brand", "metric")
    }),

    // ---- strings / dates / case ---------------------------------------
    "q45_string_funcs" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").like("%gear%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("snake"))
        .orderBy("p_partkey")
    }),

    "q46_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(
          date_trunc("month", col("o_orderdate")).as("month"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("month")
    }),

    "q47_case_buckets" -> ((s, d) => {
      t(s, d, "part")
        .withColumn("bucket",
          when(col("p_retailprice") < 500.0, "cheap")
            .when(col("p_retailprice") < 1200.0, "mid")
            .otherwise("expensive"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(avg("p_size").cast("double"), 2).as("avg_size"))
        .orderBy("bucket")
    }),

    "q48_string_agg" -> ((s, d) => {
      // Ordered string aggregation (DuckDB string_agg ORDER BY parity via
      // array_sort ∘ collect_list — collect order is nondeterministic, the
      // sort fixes it).
      t(s, d, "supplier")
        .groupBy("s_nationkey")
        .agg(concat_ws(",", array_sort(collect_list("s_name"))).as("suppliers"))
        .orderBy("s_nationkey")
    }),

    // ---- CTE / SQL-text path -------------------------------------------
    "q50_cte" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("cte_orders")
      t(s, d, "customer").createOrReplaceTempView("cte_customer")
      s.sql("""
        WITH big AS (
          SELECT o_custkey, count(*) AS n_big
          FROM cte_orders WHERE o_totalprice > 200000.0
          GROUP BY o_custkey
        )
        SELECT c.c_mktsegment, count(*) AS n_cust, sum(b.n_big) AS n_orders
        FROM big b JOIN cte_customer c ON b.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        ORDER BY c.c_mktsegment""")
    }),

    "q66_json_funcs" -> ((s, d) => {
      // JSON column surface: extract a typed field from the props JSON
      // string and aggregate it (get_json_object ↔ json_extract)
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(
          sum("k").cast("long").as("sum_k"),
          round(avg("k"), 4).as("avg_k"),
          count(when(col("k") > 50, 1)).as("n_high"))
        .orderBy("event_type")
    }),

    "q67_quantified_subquery" -> ((s, d) => {
      // ALL/ANY comparisons: parts pricier than every part of brand B1
      t(s, d, "part").createOrReplaceTempView("qs_part")
      s.sql("""
        SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
        FROM qs_part
        WHERE p_retailprice > (SELECT max(p_retailprice) FROM qs_part WHERE p_brand = 'Brand#1')
        ORDER BY p_partkey""")
    }),

    "q68_grouping_fn" -> ((s, d) => {
      // GROUPING() disambiguates rollup NULLs from data NULLs
      t(s, d, "orders").createOrReplaceTempView("gf_orders")
      s.sql("""
        SELECT o_orderstatus,
               CAST(grouping(o_orderstatus) AS INTEGER) AS is_total,
               count(*) AS n
        FROM gf_orders
        GROUP BY ROLLUP (o_orderstatus)
        ORDER BY is_total, o_orderstatus NULLS FIRST""")
    }),

    "q61_range_frame" -> ((s, d) => {
      // RANGE frame over event-time: rolling 1-hour event count per user
      t(s, d, "events").createOrReplaceTempView("rf_events")
      s.sql("""
        SELECT user_id, ts, CAST(count(*) OVER (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_hour
        FROM rf_events WHERE user_id <= 3
        ORDER BY user_id, ts""")
    }),

    "q62_moving_avg" -> ((s, d) => {
      // 7-row centered moving average of daily order totals
      val daily = t(s, d, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum("o_totalprice").as("total"))
      val w = Window.orderBy("day").rowsBetween(-3, 3)
      daily.select(col("day"), round(avg("total").over(w), 2).as("ma7"))
        .orderBy("day").limit(100)
    }),

    "q63_null_handling" -> ((s, d) => {
      // coalesce/nullif over an outer join with real nulls
      val n = t(s, d, "nation")
      val sup = t(s, d, "supplier").filter(col("s_acctbal") > 9000.0)
      n.join(sup, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_name"),
          coalesce(col("s_name"), lit("none")).as("top_supplier"),
          when(col("s_acctbal").isNull, -1.0)
            .otherwise(round(col("s_acctbal"), 2)).as("bal"),
          nullif(col("n_regionkey"), lit(0)).as("nz_region"))
        .orderBy("n_name", "top_supplier")
    }),

    "q64_regexp" -> ((s, d) => {
      t(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          col("p_name").rlike("^(red|blue)").as("is_colored"))
        .orderBy("p_partkey").limit(500)
    }),

    "q65_date_arith" -> ((s, d) => {
      // interval arithmetic + month boundaries + day diffs
      t(s, d, "orders")
        .filter(col("o_orderdate") + expr("INTERVAL 30 DAY") >=
          lit("2001-08-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          (col("o_orderdate") + expr("INTERVAL 30 DAY")).as("due"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"))
        .orderBy("o_orderkey")
    }),

    "q60_array_funcs" -> ((s, d) => {
      // array surface over the embeddings table: size, slice, sort,
      // element access, contains — DuckDB list functions 1:1
      t(s, d, "embeddings").createOrReplaceTempView("af_emb")
      // list_position/list_unique run through the DuckDB-dialect rewrite
      // (renamed/expanded), the rest are Spark-native — both sides of
      // each column verified edge-exact against DuckDB
      s.sql(graft.sqlfront.Dialect.rewrite("""
        SELECT vec_id,
               size(embedding) AS dim,
               round(CAST(element_at(embedding, 1) AS DOUBLE), 4) AS first_val,
               round(CAST(array_max(embedding) AS DOUBLE), 4) AS max_val,
               round(CAST(array_min(embedding) AS DOUBLE), 4) AS min_val,
               round(CAST(element_at(array_sort(embedding), 32) AS DOUBLE), 4) AS med_lo,
               list_position(array(CAST(vec_id AS DOUBLE), CAST(7 AS DOUBLE)), CAST(7 AS DOUBLE)) AS pos_found,
               list_unique(array(label, label, NULL)) AS n_uniq
        FROM af_emb WHERE vec_id < 50 ORDER BY vec_id"""))
    }),

    "q58_recursive_cte" -> ((s, d) => {
      // WITH RECURSIVE (Spark 4.x native): org hierarchy walk — here a
      // numeric series as the portable fixture both engines accept.
      s.sql("""
        WITH RECURSIVE t(n) AS (
          SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100
        )
        SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS cnt FROM t""")
    }),

    "q59_pivot_stmt" -> ((s, d) => {
      // DuckDB PIVOT statement form through the dynamic-pivot handler
      t(s, d, "orders").createOrReplaceTempView("pv_orders")
      graft.sqlfront.PivotStmt.execute(s,
        "PIVOT pv_orders ON o_orderstatus USING count(*) GROUP BY o_orderpriority")
        .orderBy("o_orderpriority")
    }),

    "q42_values_pivot" -> ((s, d) => {
      // FROM (VALUES ...) PIVOT through the dialect: rewriteValuesAlias
      // must recognize PIVOT as a clause keyword and land the
      // col0-naming alias on the VALUES derived table BEFORE the clause
      // (advice r2 — executed against the DuckDB oracle here, not just
      // unit-tested). coalesce on both sides: DuckDB fills absent pivot
      // cells with 0 for count, Spark with NULL.
      s.sql(graft.sqlfront.Dialect.rewrite(
        """SELECT col0, coalesce(a, 0) AS a, coalesce(b, 0) AS b
           FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a'))
           PIVOT (count(*) FOR col1 IN ('a', 'b'))
           ORDER BY col0"""))
    }),

    // ---- events (stream-shaped fact) -----------------------------------
    "q55_events_weekly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("week", col("ts")).as("week"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("week", "event_type")
    }),

    "q56_sessionize" -> ((s, d) => {
      // Gap-based sessionization: lag + cumulative sum of session starts.
      // Whole-second gap arithmetic on both engines (floor semantics match).
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .withColumn("prev_s", lag(col("ts").cast("long"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_s").isNull || col("ts").cast("long") - col("prev_s") > 1800L, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_sess").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    "q57_event_funnel" -> ((s, d) => {
      // Funnel: users who viewed, then clicked, then purchased (ordered).
      val e = t(s, d, "events")
      def firstOf(tpe: String, alias: String): DataFrame =
        e.filter(col("event_type") === tpe)
          .groupBy("user_id").agg(min("ts").as(alias))
      firstOf("view", "t_view")
        .join(firstOf("click", "t_click"), Seq("user_id"))
        .join(firstOf("purchase", "t_purchase"), Seq("user_id"))
        .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
        .agg(count(lit(1)).as("n_converted"))
    }),

    "q69_qualify" -> ((s, d) => {
      // DuckDB QUALIFY (window filter) through the dialect rewriter —
      // Spark has no QUALIFY, so Dialect.rewriteQualify wraps the
      // predicate as a projected flag. Top spender per nation.
      t(s, d, "customer").createOrReplaceTempView("qf_customer")
      s.sql(graft.sqlfront.Dialect.rewrite("""
        SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal
        FROM qf_customer
        QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_custkey ASC) = 1
        ORDER BY c_nationkey"""))
    }),

    "q70_asof_join" -> ((s, d) => {
      // As-of join (DuckDB ASOF JOIN): each purchase matched to the
      // latest view at-or-before it per user. Spark-first plan: union
      // both sides, one shuffle on user_id, sort by (ts, side), then
      // last(ignoreNulls) carries the most recent view forward — the
      // merge-join shape that scales linearly instead of a range
      // self-join. Right side pre-deduped per (user_id, ts) so ties
      // are deterministic on both engines.
      val e = t(s, d, "events")
      val views = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("value").as("v_value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      // the carried right-side columns travel as ONE struct so a single
      // last(ignoreNulls) keeps (ts, value) from the SAME view row — two
      // independent windows would desynchronize when a view's value is
      // NULL (ignoreNulls skips back on one column but not the other)
      val unioned = purchases
        .select(col("user_id"), col("ts"), lit(1).as("is_l"), col("event_id"),
          col("value"),
          lit(null).cast("struct<v_ts:timestamp,v_value:double>").as("vrow"))
        .unionByName(views.select(col("user_id"), col("ts"), lit(0).as("is_l"),
          lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
          struct(col("ts").as("v_ts"), col("v_value")).as("vrow")))
      // view rows at the same ts sort before purchases (is_l asc), so
      // the match is inclusive (ts <= purchase ts) like ASOF's >=
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("is_l").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      unioned
        .withColumn("vlast", last("vrow", ignoreNulls = true).over(w))
        .filter(col("is_l") === 1 && col("vlast").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("value"), col("vlast.v_ts").as("view_ts"),
          round(col("vlast.v_value"), 2).as("view_value"))
        .orderBy("event_id")
    }),

    "q71_band_join" -> ((s, d) => {
      // Range (band) join against a tiny literal dimension: non-equi
      // predicate, broadcast nested-loop — the correct physical plan
      // when one side is a handful of bands (the fact side never
      // shuffles). Bands are half-open [lo, hi).
      import s.implicits._
      val bands = Seq(("low", 0, 20000), ("mid", 20000, 45000), ("high", 45000, 100000))
        .toDF("band", "lo", "hi")
      t(s, d, "lineitem")
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") && col("l_extendedprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(sum(revenue), 2).as("revenue"))
        .orderBy("band")
    }),

    "q76_lateral_join" -> ((s, d) => {
      // correlated LATERAL subqueries — native in Spark 4 and DuckDB
      // alike; Catalyst decorrelates to a plain aggregate + join, so
      // the plan is a broadcast join, not a per-row re-execution
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT r.r_name,
               t.n_nations,
               cast(round(t2.max_bal, 2) as decimal(12,2)) AS max_bal
        FROM region r,
        LATERAL (SELECT count(*) AS n_nations
                 FROM nation n WHERE n.n_regionkey = r.r_regionkey) t,
        LATERAL (SELECT max(c_acctbal) AS max_bal
                 FROM customer c JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
                 WHERE n2.n_regionkey = r.r_regionkey) t2
        ORDER BY r.r_name""")
    }),

    "q75_window_extras" -> ((s, d) => {
      // remaining ranking-window surface: percent_rank / cume_dist /
      // nth_value, all native in both engines
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, d, "customer")
        .filter(col("c_custkey") <= 200)
        .select(col("c_nationkey"), col("c_custkey"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"),
          round(nth_value(col("c_acctbal"), 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("second_bal"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "q74_strftime" -> ((s, d) => {
      // DuckDB strftime through the dialect's C-format -> Java-pattern
      // bridge; grouped so the oracle is tiny and total-ordered
      t(s, d, "orders").createOrReplaceTempView("sft_orders")
      s.sql(graft.sqlfront.Dialect.rewrite("""
        SELECT strftime(o_orderdate, '%Y-%m') AS ym,
               strftime(o_orderdate, '%d %H:%M:%S') AS dhms,
               count(*) AS n
        FROM sft_orders
        GROUP BY 1, 2 ORDER BY ym, dhms"""))
    }),

    "q73_distinct_on" -> ((s, d) => {
      // DuckDB/Postgres DISTINCT ON through the dialect rewriter:
      // latest order per customer (ORDER BY includes a unique tiebreak
      // so both engines pick the same row).
      t(s, d, "orders").createOrReplaceTempView("don_orders")
      s.sql(graft.sqlfront.Dialect.rewrite("""
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
        FROM don_orders
        WHERE o_custkey <= 100
        ORDER BY o_custkey, o_orderdate DESC, o_orderkey"""))
    }),

    "q72_approx_distinct" -> ((s, d) => {
      // HLL sketch (approx_count_distinct, rsd=0.01) vs exact — the
      // sketch is the 100 TB path (mergeable, constant memory); the
      // entry asserts the estimate lands within 5% so the oracle is
      // engine-independent (a >5σ event would have to occur to fail).
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_orderkey", 0.01).as("approx"),
          countDistinct("l_orderkey").as("exact"))
        .select(col("l_returnflag"),
          (abs(col("approx") - col("exact")) / col("exact") <= 0.05).as("within_5pct"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_agg_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q03_having" -> """
      SELECT c_nationkey, count(*) AS n_cust, round(avg(c_acctbal), 2) AS avg_bal
      FROM customer GROUP BY c_nationkey HAVING count(*) > 50 ORDER BY c_nationkey""",

    "q04_filtered_agg" -> """
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS n_finished,
             count(*) FILTER (o_orderstatus = 'O') AS n_open,
             round(sum(o_totalprice) FILTER (o_totalprice > 100000.0), 2) AS big_total
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q05_stats" -> """
      SELECT l_linestatus,
             round(stddev_samp(l_quantity), 4) AS sd_qty,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             round(min(l_extendedprice), 2) AS min_price,
             round(max(l_extendedprice), 2) AS max_price
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q06_percentiles" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.25), 4) AS q1,
             round(quantile_cont(l_quantity, 0.5), 4) AS q2,
             round(quantile_cont(l_quantity, 0.75), 4) AS q3
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q10_join_star" -> """
      SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",

    "q11_top_orders" -> """
      SELECT o_orderkey, o_orderdate,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS order_revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate
      ORDER BY order_revenue DESC, o_orderkey ASC LIMIT 10""",

    "q12_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""",

    "q13_anti_join" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
      ORDER BY c_custkey""",

    "q14_outer_join" -> """
      SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers,
             round(coalesce(sum(s_acctbal), 0.0), 2) AS total_bal
      FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",

    "q15_local_supplier" -> """
      SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q16_values_join" -> """
      SELECT v.weight, count(*) AS n_orders
      FROM orders
      JOIN (VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
                   ('4-NOT SPECIFIED', 2), ('5-LOW', 1)) v(prio, weight)
        ON o_orderpriority = v.prio
      GROUP BY v.weight ORDER BY v.weight""",

    "q20_scalar_subquery" -> """
      SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
      FROM part
      WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part) * 1.02
      ORDER BY p_partkey""",

    "q21_correlated" -> """
      SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
      FROM part p
      WHERE p_retailprice > (SELECT avg(p2.p_retailprice) * 1.02 FROM part p2
                             WHERE p2.p_brand = p.p_brand)
      ORDER BY p_partkey""",

    "q22_in_subquery" -> """
      SELECT c_mktsegment, count(*) AS n_cust
      FROM customer
      WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA')
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q25_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q26_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "q27_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q30_intersect" -> """
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",

    "q31_except" -> """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",

    "q32_union" -> """
      SELECT c_name AS name, 'customer' AS kind FROM customer WHERE c_acctbal > 9900.0
      UNION ALL
      SELECT s_name, 'supplier' FROM supplier WHERE s_acctbal > 9000.0
      ORDER BY kind, name""",

    "q35_rank_in_group" -> """
      WITH rev AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS supp_revenue
        FROM lineitem GROUP BY l_suppkey
      ), ranked AS (
        SELECT s_nationkey, s_suppkey, s_name, supp_revenue,
               row_number() OVER (PARTITION BY s_nationkey
                                  ORDER BY supp_revenue DESC, s_suppkey ASC) AS rk
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
      )
      SELECT s_nationkey, rk, s_suppkey, s_name, supp_revenue
      FROM ranked WHERE rk <= 3 ORDER BY s_nationkey, rk""",

    "q36_running_sum" -> """
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
             round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      FROM lineitem WHERE l_suppkey <= 5
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""",

    "q37_lag_lead" -> """
      SELECT o_custkey, o_orderkey, o_orderdate, round(o_totalprice, 2) AS price,
             round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
             lead(o_orderdate, 1) OVER w AS next_date
      FROM orders WHERE o_custkey <= 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderdate, o_orderkey""",

    "q38_first_last" -> """
      SELECT DISTINCT c_nationkey,
             first_value(c_name) OVER w AS richest,
             last_value(c_name) OVER w AS poorest
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY c_nationkey""",

    "q39_ntile_share" -> """
      WITH seg AS (
        SELECT c_mktsegment, round(sum(c_acctbal), 2) AS seg_bal
        FROM customer GROUP BY c_mktsegment
      )
      SELECT c_mktsegment, seg_bal,
             ntile(2) OVER (ORDER BY seg_bal DESC, c_mktsegment) AS quartile,
             round(seg_bal / sum(seg_bal) OVER (), 4) AS share
      FROM seg ORDER BY c_mktsegment""",

    "q40_pivot" -> """
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS "F",
             count(*) FILTER (o_orderstatus = 'O') AS "O",
             count(*) FILTER (o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q41_unpivot" -> """
      WITH wide AS (
        -- exact integer cents, mirroring the Spark side: order-free sum,
        -- one deterministic double division, then the 2-decimal round
        SELECT p_brand,
               round(CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS DOUBLE)
                     / count(*) / 100.0, 2) AS avg_price,
               round(avg(CAST(p_size AS DOUBLE)), 2) AS avg_size
        FROM part GROUP BY p_brand
      )
      SELECT p_brand, 'avg_price' AS metric, avg_price AS value FROM wide
      UNION ALL
      SELECT p_brand, 'avg_size', avg_size FROM wide
      ORDER BY p_brand, metric""",

    "q45_string_funcs" -> """
      SELECT p_partkey, upper(p_name) AS uname, substr(p_name, 1, 8) AS prefix,
             CAST(length(p_name) AS INTEGER) AS name_len,
             replace(p_name, ' ', '_') AS snake
      FROM part WHERE p_name LIKE '%gear%' ORDER BY p_partkey""",

    "q46_date_funcs" -> """
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY 1, 2 ORDER BY month""",

    "q47_case_buckets" -> """
      SELECT CASE WHEN p_retailprice < 500.0 THEN 'cheap'
                  WHEN p_retailprice < 1200.0 THEN 'mid'
                  ELSE 'expensive' END AS bucket,
             count(*) AS n, round(avg(CAST(p_size AS DOUBLE)), 2) AS avg_size
      FROM part GROUP BY 1 ORDER BY bucket""",

    "q48_string_agg" -> """
      SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS suppliers
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",

    "q50_cte" -> """
      WITH big AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 200000.0
        GROUP BY o_custkey
      )
      SELECT c.c_mktsegment, count(*) AS n_cust, CAST(sum(b.n_big) AS BIGINT) AS n_orders
      FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    "q66_json_funcs" -> """
      SELECT event_type,
             CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
             count(*) FILTER (CAST(json_extract(props, '$.k') AS BIGINT) > 50) AS n_high
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q67_quantified_subquery" -> """
      SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price
      FROM part
      WHERE p_retailprice > ALL (SELECT p_retailprice FROM part WHERE p_brand = 'Brand#1')
      ORDER BY p_partkey""",

    "q68_grouping_fn" -> """
      SELECT o_orderstatus,
             CAST(grouping(o_orderstatus) AS INTEGER) AS is_total,
             count(*) AS n
      FROM orders
      GROUP BY ROLLUP (o_orderstatus)
      ORDER BY is_total, o_orderstatus NULLS FIRST""",

    "q61_range_frame" -> """
      SELECT user_id, ts, count(*) OVER (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
      FROM events WHERE user_id <= 3
      ORDER BY user_id, ts""",

    "q62_moving_avg" -> """
      WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day, sum(o_totalprice) AS total
        FROM orders GROUP BY 1
      )
      SELECT day, round(avg(total) OVER (
        ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 2) AS ma7
      FROM daily ORDER BY day LIMIT 100""",

    "q63_null_handling" -> """
      SELECT n_name,
             coalesce(s_name, 'none') AS top_supplier,
             CASE WHEN s_acctbal IS NULL THEN -1.0 ELSE round(s_acctbal, 2) END AS bal,
             nullif(n_regionkey, 0) AS nz_region
      FROM nation LEFT JOIN (SELECT * FROM supplier WHERE s_acctbal > 9000.0) s
        ON n_nationkey = s_nationkey
      ORDER BY n_name, top_supplier""",

    "q64_regexp" -> """
      SELECT p_partkey,
             regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             regexp_matches(p_name, '^(red|blue)') AS is_colored
      FROM part ORDER BY p_partkey LIMIT 500""",

    "q65_date_arith" -> """
      SELECT o_orderkey, o_orderdate,
             o_orderdate + INTERVAL 30 DAY AS due,
             last_day(o_orderdate) AS month_end,
             CAST(date_diff('day', o_orderdate, DATE '2002-01-01') AS INTEGER) AS days_to_2002
      FROM orders
      WHERE o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '2001-08-01 00:00:00'
      ORDER BY o_orderkey""",

    "q60_array_funcs" -> """
      SELECT vec_id,
             CAST(len(embedding) AS INTEGER) AS dim,
             round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
             round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
             round(CAST(list_min(embedding) AS DOUBLE), 4) AS min_val,
             round(CAST(list_sort(embedding)[32] AS DOUBLE), 4) AS med_lo,
             CAST(list_position([CAST(vec_id AS DOUBLE), CAST(7 AS DOUBLE)], CAST(7 AS DOUBLE)) AS BIGINT) AS pos_found,
             CAST(list_unique([label, label, NULL]) AS INTEGER) AS n_uniq
      FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""",

    "q58_recursive_cte" -> """
      WITH RECURSIVE t(n) AS (
        SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 100
      )
      SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS cnt FROM t""",

    "q59_pivot_stmt" -> """
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS "F",
             count(*) FILTER (o_orderstatus = 'O') AS "O",
             count(*) FILTER (o_orderstatus = 'P') AS "P"
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q42_values_pivot" -> """
      SELECT col0, coalesce(a, 0) AS a, coalesce(b, 0) AS b
      FROM (VALUES (1, 'a'), (2, 'b'), (3, 'a'))
      PIVOT (count(*) FOR col1 IN ('a', 'b'))
      ORDER BY col0""",

    "q55_events_weekly" -> """
      SELECT date_trunc('week', ts) AS week, event_type, count(*) AS n,
             round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY week, event_type""",

    "q56_sessionize" -> """
      WITH g AS (
        SELECT user_id,
               CASE WHEN lag(epoch_ms(ts) // 1000) OVER w IS NULL
                         OR epoch_ms(ts) // 1000 - lag(epoch_ms(ts) // 1000) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
      SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
      FROM g GROUP BY user_id ORDER BY user_id""",

    "q57_event_funnel" -> """
      WITH v AS (SELECT user_id, min(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id),
           c AS (SELECT user_id, min(ts) AS t_click FROM events WHERE event_type = 'click' GROUP BY user_id),
           p AS (SELECT user_id, min(ts) AS t_purchase FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      SELECT count(*) AS n_converted
      FROM v JOIN c USING (user_id) JOIN p USING (user_id)
      WHERE t_view < t_click AND t_click < t_purchase""",

    "q69_qualify" -> """
      SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal
      FROM customer
      QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey ASC) = 1
      ORDER BY c_nationkey""",

    "q70_asof_join" -> """
      WITH v AS (
        SELECT user_id, ts, max(value) AS v_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
      ), p AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type = 'purchase'
      )
      SELECT p.event_id, p.user_id, p.ts, round(p.value, 2) AS value,
             v.ts AS view_ts, round(v.v_value, 2) AS view_value
      FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY event_id""",

    "q71_band_join" -> """
      SELECT band, count(*) AS n,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN (VALUES ('low', 0, 20000), ('mid', 20000, 45000), ('high', 45000, 100000))
           b(band, lo, hi)
        ON l_extendedprice >= lo AND l_extendedprice < hi
      GROUP BY band ORDER BY band""",

    "q76_lateral_join" -> """
      SELECT r.r_name,
             t.n_nations,
             CAST(round(t2.max_bal, 2) AS DECIMAL(12,2)) AS max_bal
      FROM region r,
      LATERAL (SELECT count(*) AS n_nations
               FROM nation n WHERE n.n_regionkey = r.r_regionkey) t,
      LATERAL (SELECT max(c_acctbal) AS max_bal
               FROM customer c JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
               WHERE n2.n_regionkey = r.r_regionkey) t2
      ORDER BY r.r_name""",

    "q75_window_extras" -> """
      SELECT c_nationkey, c_custkey,
             round(percent_rank() OVER w, 4) AS pr,
             round(cume_dist() OVER w, 4) AS cd,
             round(nth_value(c_acctbal, 2) OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS second_bal
      FROM customer
      WHERE c_custkey <= 200
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
      ORDER BY c_nationkey, c_custkey""",

    "q74_strftime" -> """
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             strftime(o_orderdate, '%d %H:%M:%S') AS dhms,
             count(*) AS n
      FROM orders
      GROUP BY 1, 2 ORDER BY ym, dhms""",

    "q73_distinct_on" -> """
      SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
      FROM orders
      WHERE o_custkey <= 100
      ORDER BY o_custkey, o_orderdate DESC, o_orderkey""",

    "q72_approx_distinct" -> """
      SELECT l_returnflag, true AS within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
