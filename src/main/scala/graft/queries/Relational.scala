package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational query surface of the rebuild.
  *
  * Covers SURVEY.md §2.2 (every filter leaf P4-P15), §2.3 (joins J1 and the
  * Hive-delegated join surface) and §2.4 (aggregation / window / sort / set
  * ops / scalar functions that the reference's test suite exercises through
  * Hive). Everything here is declarative DataFrame code so Catalyst pushes
  * filters + projections into the parquet scan and picks join strategies
  * (broadcast for the small dimension tables) on its own.
  *
  * Reference citations: filter leaves mirror
  * IcebergFilterFactory.java:45-154; the join mirrors
  * TestJoinTablesWithHadoopCatalog.java:121-126 (inner equi-join projecting
  * columns from both sides).
  */
object Relational extends QueryPack {

  val queries: Map[String, Q] = Map(
    // ----- scans + projection (S2/S4/P1) -----
    "q01_scan_project" -> ((s, d) =>
      t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")),

    "q02_scan_full" -> ((s, d) =>
      t(s, d, "region")),

    // ----- filter leaves (P4-P15) -----
    "q10_filter_eq" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_returnflag")),

    "q11_filter_lt" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") < 5.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "q12_filter_lte" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") <= 3.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "q13_filter_gt_gte" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45.0 && col("l_extendedprice") >= 900.0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    "q14_filter_in" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
        .select("p_partkey", "p_brand")),

    "q15_filter_between" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_totalprice").between(1000.0, 5000.0))
        .select("o_orderkey", "o_totalprice")),

    "q16_filter_isnull" -> ((s, d) =>
      // testdata has no physical nulls; manufacture them with nullif so the
      // IsNull path is exercised on a non-empty result (P11).
      t(s, d, "lineitem")
        .withColumn("flag_or_null", nullif(col("l_returnflag"), lit("R")))
        .filter(col("flag_or_null").isNull)
        .select("l_orderkey", "l_linenumber", "flag_or_null")),

    "q17_filter_notnull_not" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("flag_or_null", nullif(col("l_returnflag"), lit("R")))
        .filter(col("flag_or_null").isNotNull && !(col("l_quantity") <= 25.0))
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "q18_filter_nullsafe_eq" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("flag_or_null", nullif(col("l_returnflag"), lit("R")))
        .filter(col("flag_or_null") <=> lit("A"))
        .select("l_orderkey", "l_linenumber")),

    "q19_filter_and_or" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(
          (col("l_returnflag") === "A" || col("l_returnflag") === "N") &&
            col("l_quantity") < 10.0 && col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    "q1a_filter_constant" -> ((s, d) =>
      // constant-folded predicate (P15): Catalyst drops `1 = 1`.
      t(s, d, "nation")
        .filter(lit(1) === lit(1) && col("n_regionkey") === 2)
        .select("n_nationkey", "n_name")),

    "q1b_filter_like" -> ((s, d) =>
      // prefix/suffix/substring pattern filters: the prefix form pushes to
      // parquet as StringStartsWith (the StartsWith pruning leaf end to end)
      t(s, d, "part")
        .filter(col("p_type").startsWith("PRO") ||
          col("p_name").endsWith("ing") ||
          col("p_brand").contains("#1"))
        .select("p_partkey", "p_type", "p_brand")),

    // ----- joins (J1 + delegated surface) -----
    "q20_join_inner" -> ((s, d) => {
      // Mirrors the reference's flagship join
      // (TestJoinTablesWithHadoopCatalog.java:121-126): inner equi-join
      // projecting columns from both sides. customer is SF-proportional,
      // so no forced hint — statistics + AQE broadcast it while it fits
      // and fall back to shuffle at cluster scale.
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
    }),

    "q21_join_agg" -> ((s, d) => {
      // Money sums go through DECIMAL: per-row cast to decimal(18,4) makes
      // the sum exact and order-independent (double sums are not — partial
      // aggregation order varies across partitions and engines), and the
      // final 2dp round hits .xx50 halves identically in Spark and DuckDB.
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
        .orderBy("c_mktsegment")
    }),

    "q22_join_left" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    "q23_join_semi" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 10000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    "q24_join_anti" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    "q25_join_star" -> ((s, d) => {
      // star-schema join: fact lineitem with dims chained supplier ->
      // nation -> region. nation/region are fixed-cardinality (25/5) and
      // carry hints; supplier scales with SF so its join side is left to
      // statistics + AQE (broadcast at small SF, shuffle at cluster scale).
      val li = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      val na = t(s, d, "nation")
      val re = t(s, d, "region")
      li.join(su, li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("total_price"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),

    "q27_join_full" -> ((s, d) => {
      // full outer: both filtered sides have unmatched rows, so BOTH null
      // extensions are exercised (a full outer can't broadcast either
      // side — Spark shuffles it, which is also the only 100 TB shape)
      val c = t(s, d, "customer").filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = t(s, d, "orders").filter(col("o_totalprice") > 30000.0)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_big_orders"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_acctbal"),
          col("o_custkey"), col("n_big_orders"))
    }),

    "q26_join_fact_fact" -> ((s, d) => {
      // fact-fact self-join: BOTH sides are SF-proportional, so no side is
      // ever broadcastable at cluster scale — this is the query shape that
      // must plan SortMergeJoin on the shuffled orderkey (the rest of the
      // suite joins facts to dims and legitimately broadcasts). Pairing is
      // within an order (~4 lines/order), so output is O(n), not O(n²);
      // AQE's skew-join splitting covers a hot orderkey. Plan asserted in
      // ExplainAuditSpec with broadcasting disabled (= the cluster-scale
      // planner state at sf0.1+).
      val a = t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber").as("ln_a"),
        col("l_returnflag").as("flag_a"), col("l_quantity").as("qty_a"))
      val b = t(s, d, "lineitem").select(
        col("l_orderkey").as("okey_b"), col("l_linenumber").as("ln_b"),
        col("l_returnflag").as("flag_b"), col("l_quantity").as("qty_b"))
      a.join(b, a("l_orderkey") === b("okey_b") && a("ln_a") < b("ln_b"))
        .groupBy(col("flag_a"), col("flag_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("qty_a") * col("qty_b")).cast("decimal(18,2)"))
            .cast("double").as("qty_cross"))
        .orderBy("flag_a", "flag_b")
    }),

    // ----- aggregation -----
    "q30_agg_group" -> ((s, d) =>
      // TPC-H Q1 shape: the flagship aggregation.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"), // integer-valued: exact
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_base_price"),
          round(sum(col("l_discount").cast("decimal(18,4)")).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q31_agg_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    "q32_agg_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
        .filter(col("n") >= 3)),

    "q33_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    "q34_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    "q35_agg_minmax" -> ((s, d) =>
      t(s, d, "part")
        .groupBy(col("p_brand"))
        .agg(
          min(col("p_retailprice")).as("min_price"),
          max(col("p_retailprice")).as("max_price"),
          min(col("p_size")).as("min_size"),
          max(col("p_size")).as("max_size"))
        .orderBy("p_brand")),

    "q36_approx_agg" -> ((s, d) =>
      // sketch aggregates — the only viable cardinality/quantile path at
      // 100 TB (exact distinct shuffles every key; HLL/KLL are map-side
      // mergeable, constant memory). Approximate values are engine-
      // specific → rows-only check; RelationalSpec bounds the error vs
      // exact.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_median_price"),
          percentile_approx(col("l_quantity"), lit(0.95), lit(10000))
            .as("approx_p95_qty"))
        .orderBy("l_returnflag")),

    "q37_salted_agg" -> ((s, d) => {
      // skew-resistant two-phase aggregation: salt the hot key so the
      // first shuffle spreads one key over 16 reducers, then merge
      // partials. Result-identical to the direct groupBy (the oracle
      // proves it); the pattern is what survives a power-law key at
      // 100 TB where a single reducer would OOM. Spark's AQE skew
      // handling covers joins; aggregation salting is still manual.
      val salted = t(s, d, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(
          sum(col("l_quantity")).as("part_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("part_price"),
          count(lit(1)).as("part_n"))
      salted.groupBy(col("l_returnflag"))
        .agg(
          sum(col("part_qty")).as("sum_qty"),
          round(sum(col("part_price")), 2).cast("double")
            .as("sum_price"),
          sum(col("part_n")).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q38_grouping_sets" -> ((s, d) => {
      // explicit GROUPING SETS (beyond rollup/cube's fixed lattices) via
      // the SQL surface over a registered view
      t(s, d, "orders").createOrReplaceTempView("gs_orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
               FROM gs_orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    }),

    "q44_pivot" -> ((s, d) =>
      // pivot: one output column per return flag (Catalyst rewrites this
      // to conditional aggregation — exactly the oracle's formulation)
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .orderBy("l_linestatus")),

    // UNPIVOT (melt): the q44 wide form stacked back to long — combos
    // the pivot padded with NULL are dropped, so the round trip lands
    // exactly on the direct group-by the oracle runs. Catalyst plans
    // Expand over the aggregate (one pass, no extra shuffle).
    "q77_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .unpivot(Array(col("l_linestatus")),
          Array(col("A"), col("N"), col("R")), "returnflag", "sum_qty")
        .filter(col("sum_qty").isNotNull)
        .orderBy("l_linestatus", "returnflag")),

    "q45_explode" -> ((s, d) =>
      // lateral explode: one row per word of p_name, counted corpus-wide
      t(s, d, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy("word")),

    // exact PERCENTILES per group (the quantile member of the stats
    // family; q36 holds the approx-sketch counterpart for the scales
    // where exact sorting stops paying). Both engines interpolate at
    // rank p·(n−1); 4dp rounding absorbs ulp-level interpolation-order
    // differences, same policy as q39.
    "q76_percentiles" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          expr("round(percentile(l_quantity, 0.25), 4)").as("p25_qty"),
          expr("round(percentile(l_quantity, 0.5), 4)").as("p50_qty"),
          expr("round(percentile(l_quantity, 0.9), 4)").as("p90_qty"))
        .orderBy("l_returnflag")),

    "q39_stats_agg" -> ((s, d) =>
      // statistical aggregates: variance/stddev/correlation. Double
      // accumulation is merge-order-dependent at the ulp level, so values
      // round to 4dp — plenty for the statistics, tight enough to catch
      // real errors.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 4)
            .as("cov_qty_disc"))
        .orderBy("l_returnflag")),

    // ----- distinct / set ops -----
    "q40_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "q41_union" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 40000.0).select(col("o_orderkey"))
        .union(o.filter(col("o_orderstatus") === "F").select(col("o_orderkey")))
        .distinct()
    }),

    "q46_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 40000.0)
        .select(col("o_orderkey"), lit("high").as("bucket"))
        .unionAll(o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("final").as("bucket")))
    }),

    "q42_intersect" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        .intersect(li.filter(col("l_quantity") > 40.0).select(col("l_orderkey")))
    }),

    "q43_except" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.select(col("l_orderkey")).distinct()
        .except(li.filter(col("l_returnflag") === "R").select(col("l_orderkey")))
    }),

    "q47_except_all" -> ((s, d) => {
      // bag-semantics difference: multiplicities subtract
      val li = t(s, d, "lineitem")
      li.select(col("l_orderkey"))
        .exceptAll(li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")))
    }),

    "q48_intersect_all" -> ((s, d) => {
      // bag-semantics intersection: min of the two multiplicities
      val li = t(s, d, "lineitem")
      li.filter(col("l_returnflag") === "R").select(col("l_orderkey"))
        .intersectAll(
          li.filter(col("l_returnflag") === "N").select(col("l_orderkey")))
    }),

    // ----- sort / top-k -----
    "q50_sort_limit" -> ((s, d) =>
      // top-k: Spark plans TakeOrderedAndProject (no full sort shuffle).
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(25)),

    "q51_sort_multi" -> ((s, d) =>
      t(s, d, "supplier")
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc)
        .select("s_suppkey", "s_nationkey", "s_acctbal")),

    // ----- window functions -----
    "q60_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc,
        col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    "q61_window_running" -> ((s, d) => {
      // RANGE frame, not ROWS: (l_orderkey, l_linenumber) is not unique in
      // the synthetic data, so a ROWS frame is nondeterministic on ties —
      // RANGE gives every peer the same running value in every engine.
      // Quantities are integer-valued doubles, so the sum is exact.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_orderkey").asc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem")
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
    }),

    "q62_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price")
    }),

    "q63_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("o_orderstatus"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
        .orderBy("o_orderstatus", "quartile")
    }),

    "q64_window_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .withColumn("first_key", first(col("o_orderkey")).over(w))
        .withColumn("last_key", last(col("o_orderkey")).over(w))
        .select("o_custkey", "o_orderkey", "first_key", "last_key")
    }),

    // rank-family window functions: dense_rank / percent_rank / cume_dist.
    // All three are deterministic under ORDER BY ties (they depend on rank
    // and partition size, not physical row order). percent_rank/cume_dist
    // are exact IEEE divisions — identical doubles on both engines — but
    // their ROUNDED forms are not hashable (k/(n-1) lands on exact
    // .xxxxxx5 halves at some partition sizes), hence the floor scaling.
    "q65_window_ranks" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").asc)
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          dense_rank().over(w).as("dr"),
          // floor-scaled, NOT round: percent_rank = k/(n-1) lands on
          // exact .xxxxxx5 halves at some partition sizes (seen at
          // sf0.1, n-1 = 1600), where Spark and DuckDB round opposite
          // ways; floor of the identical IEEE double always agrees
          floor(percent_rank().over(w) * 1000000).as("pr_e6"),
          floor(cume_dist().over(w) * 1000000).as("cd_e6"))
    }),

    // numeric RANGE-offset frame: each order counts its customer's orders
    // within ±1000 of its own price — value-based frames are deterministic
    // under ties (peers share the frame), unlike ROWS offsets
    "q66_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 1000L)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near"))
    }),

    // ----- scalar functions -----
    "q70_scalar_string" -> ((s, d) =>
      t(s, d, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          length(col("c_name")).as("name_len"),
          substring(col("c_mktsegment"), 1, 3).as("seg3"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("seg_key"))),

    "q71_scalar_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          // exact 4dp product recovered via decimal before the 2dp round —
          // double round() disagrees across engines on .xx50 halves
          round((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)"), 2).cast("double").as("disc_price"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_quantity")).as("qty_ceil"))),

    "q72_scalar_case" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 30000.0, "high")
            .when(col("o_totalprice") > 10000.0, "mid")
            .otherwise("low").as("price_band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_or_open"))),

    "q73_scalar_date" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).cast("date")
            .as("month_start"))),

    "q74_array_agg" -> ((s, d) =>
      // array construction + functions: collect per group (sorted for
      // determinism — collect_list order is partition-dependent), then
      // array ops over the result
      t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_sort(collect_list(col("n_name"))).as("nations"))
        .select(
          col("n_regionkey"),
          size(col("nations")).as("n_nations"),
          element_at(col("nations"), 1).as("first_nation"),
          array_contains(col("nations"), "CHINA").as("has_china"),
          concat_ws(",", col("nations")).as("joined"))
        .orderBy("n_regionkey")),

    "q75_string_fns" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_partkey").cast("string"), 10, "0").as("padded_key"),
          replace(col("p_brand"), lit("Brand#"), lit("B")).as("brand_short"),
          instr(col("p_name"), " ").as("first_space"),
          split(col("p_brand"), "#").getItem(1).as("brand_num"),
          reverse(col("p_brand")).as("brand_rev"),
          translate(col("p_brand"), "#", "-").as("brand_dash"))),

    // ----- subqueries -----
    "q80_scalar_subquery" -> ((s, d) => {
      val o = t(s, d, "orders")
      val avgPrice = o.agg(avg(col("o_totalprice")).as("a"))
      o.join(broadcast(avgPrice), o("o_totalprice") > avgPrice("a"))
        .select("o_orderkey", "o_totalprice")
    }),

    "q81_in_subquery" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val bigParts = t(s, d, "part").filter(col("p_size") >= 40)
        .select(col("p_partkey"))
      li.join(bigParts, li("l_partkey") === bigParts("p_partkey"), "left_semi")
        .select("l_orderkey", "l_partkey", "l_linenumber")
    }),

    "q82_correlated_subquery" -> ((s, d) => {
      // correlated scalar-aggregate subquery ("orders above their own
      // customer's average"), written as its decorrelated plan: one
      // per-custkey aggregate reused via an equi-join — exactly what
      // Catalyst rewrites the correlated form into, and the only shape
      // that scales (the correlated subquery re-evaluated per row is a
      // driver-side loop in naive engines).
      val o = t(s, d, "orders")
      val perCust = o.groupBy(col("o_custkey").as("k"))
        .agg(avg(col("o_totalprice")).as("cust_avg"))
      o.join(perCust, o("o_custkey") === perCust("k"))
        .filter(col("o_totalprice") > col("cust_avg") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          // floor of the SAME double both engines compute (round() halves
          // diverge; floor only disagrees if the doubles differ — they
          // can't: sum/count then *100 is one IEEE evaluation order)
          floor(col("cust_avg") * 100).as("cust_avg_cents"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
    "q02_scan_full" ->
      "SELECT * FROM region",
    "q10_filter_eq" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'",
    "q11_filter_lt" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5.0",
    "q12_filter_lte" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity <= 3.0",
    "q13_filter_gt_gte" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity > 45.0 AND l_extendedprice >= 900.0",
    "q14_filter_in" ->
      "SELECT p_partkey, p_brand FROM part WHERE p_brand IN ('Brand#11','Brand#22','Brand#33')",
    "q15_filter_between" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice BETWEEN 1000.0 AND 5000.0",
    "q16_filter_isnull" ->
      "SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'R') AS flag_or_null FROM lineitem WHERE nullif(l_returnflag, 'R') IS NULL",
    "q17_filter_notnull_not" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE nullif(l_returnflag, 'R') IS NOT NULL AND NOT (l_quantity <= 25.0)",
    "q18_filter_nullsafe_eq" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE nullif(l_returnflag, 'R') IS NOT DISTINCT FROM 'A'",
    "q19_filter_and_or" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem WHERE (l_returnflag = 'A' OR l_returnflag = 'N') AND l_quantity < 10.0 AND l_discount > 0.05",
    "q1a_filter_constant" ->
      "SELECT n_nationkey, n_name FROM nation WHERE 1 = 1 AND n_regionkey = 2",
    "q1b_filter_like" ->
      "SELECT p_partkey, p_type, p_brand FROM part WHERE p_type LIKE 'PRO%' OR p_name LIKE '%ing' OR p_brand LIKE '%#1%'",
    "q76_percentiles" ->
      ("SELECT l_returnflag, count(*) AS n, " +
        "round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty, " +
        "round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty, " +
        "round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q39_stats_agg" ->
      ("SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, " +
        "round(var_samp(l_quantity), 4) AS var_qty, " +
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, " +
        "round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q46_union_all" ->
      ("SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 40000.0 " +
        "UNION ALL SELECT o_orderkey, 'final' AS bucket FROM orders WHERE o_orderstatus = 'F'"),
    "q20_join_inner" ->
      "SELECT o_orderkey, c_name, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey",
    "q21_join_agg" ->
      "SELECT c_mktsegment, count(*) AS n_items, CAST(round(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "q22_join_left" ->
      "SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey",
    "q23_join_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 10000.0)",
    "q24_join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q25_join_star" ->
      "SELECT r_name, n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price, count(*) AS n_items FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name",
    "q26_join_fact_fact" ->
      ("SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b, count(*) AS n_pairs, " +
        "CAST(sum(CAST(a.l_quantity * b.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_cross " +
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_linenumber < b.l_linenumber " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q30_agg_group" ->
      "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price, round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc, count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q31_agg_distinct" ->
      "SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders, count(DISTINCT l_suppkey) AS n_supps FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q32_agg_having" ->
      "SELECT o_custkey, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total FROM orders GROUP BY o_custkey HAVING count(*) >= 3",
    "q33_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q34_cube" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST",
    "q35_agg_minmax" ->
      "SELECT p_brand, min(p_retailprice) AS min_price, max(p_retailprice) AS max_price, min(p_size) AS min_size, max(p_size) AS max_size FROM part GROUP BY p_brand ORDER BY p_brand",
    "q37_salted_agg" ->
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price, count(*) AS n_rows FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "q38_grouping_sets" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST",
    "q44_pivot" ->
      "SELECT l_linestatus, sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS A, sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS N, sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS R FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus",
    "q77_unpivot" ->
      ("SELECT l_linestatus, l_returnflag AS returnflag, " +
        "sum(l_quantity) AS sum_qty FROM lineitem " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q45_explode" ->
      "SELECT word, count(*) AS n FROM (SELECT unnest(regexp_split_to_array(p_name, ' ')) AS word FROM part) GROUP BY word ORDER BY word",
    "q40_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q41_union" ->
      "SELECT o_orderkey FROM orders WHERE o_totalprice > 40000.0 UNION SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
    "q42_intersect" ->
      "SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R' INTERSECT SELECT l_orderkey FROM lineitem WHERE l_quantity > 40.0",
    "q43_except" ->
      "SELECT DISTINCT l_orderkey FROM lineitem EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'",
    "q47_except_all" ->
      "SELECT l_orderkey FROM lineitem EXCEPT ALL SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'",
    "q48_intersect_all" ->
      ("SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R' " +
        "INTERSECT ALL SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'N'"),
    "q27_join_full" ->
      ("SELECT c_custkey, c_acctbal, o_custkey, n_big_orders FROM " +
        "(SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0) c " +
        "FULL JOIN (SELECT o_custkey, count(*) AS n_big_orders FROM orders " +
        "WHERE o_totalprice > 30000.0 GROUP BY o_custkey) o " +
        "ON c.c_custkey = o.o_custkey"),
    "q63_window_ntile" ->
      ("SELECT o_orderstatus, quartile, count(*) AS n, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total FROM (" +
        "SELECT o_orderstatus, o_totalprice, ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile FROM orders) " +
        "GROUP BY o_orderstatus, quartile ORDER BY o_orderstatus, quartile"),
    "q64_window_first_last" ->
      ("SELECT o_custkey, o_orderkey, " +
        "first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key, " +
        "last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key " +
        "FROM orders"),
    "q66_window_range_frame" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, " +
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near " +
        "FROM orders"),
    "q65_window_ranks" ->
      ("SELECT c_custkey, c_nationkey, c_acctbal, " +
        "dense_rank() OVER w AS dr, " +
        "CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_e6, " +
        "CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_e6 " +
        "FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC)"),
    "q50_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25",
    "q51_sort_multi" ->
      "SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier ORDER BY s_nationkey ASC, s_acctbal DESC",
    "q60_window_rank" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn <= 2",
    "q61_window_running" ->
      "SELECT l_suppkey, l_orderkey, l_linenumber, sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey ASC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty FROM lineitem",
    "q62_window_lag" ->
      "SELECT o_custkey, o_orderkey, o_totalprice, lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC) AS prev_price FROM orders",
    "q70_scalar_string" ->
      "SELECT c_custkey, upper(c_name) AS name_upper, CAST(length(c_name) AS INT) AS name_len, substring(c_mktsegment, 1, 3) AS seg3, concat_ws('-', c_mktsegment, c_custkey) AS seg_key FROM customer",
    "q71_scalar_math" ->
      "SELECT l_orderkey, l_linenumber, CAST(round(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4)), 2) AS DOUBLE) AS disc_price, abs(l_quantity - 25.0) AS qty_dev, l_orderkey % 7 AS key_mod, CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil FROM lineitem",
    "q72_scalar_case" ->
      "SELECT o_orderkey, CASE WHEN o_totalprice > 30000.0 THEN 'high' WHEN o_totalprice > 10000.0 THEN 'mid' ELSE 'low' END AS price_band, coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open FROM orders",
    "q73_scalar_date" ->
      "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo, CAST(quarter(o_orderdate) AS INT) AS qtr, CAST(day(o_orderdate) AS INT) AS dom, CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start FROM orders",
    "q74_array_agg" ->
      ("SELECT n_regionkey, len(nations) AS n_nations, nations[1] AS first_nation, " +
        "list_contains(nations, 'CHINA') AS has_china, array_to_string(nations, ',') AS joined " +
        "FROM (SELECT n_regionkey, list_sort(list(n_name)) AS nations FROM nation GROUP BY n_regionkey) " +
        "ORDER BY n_regionkey"),
    "q75_string_fns" ->
      ("SELECT p_partkey, lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key, " +
        "replace(p_brand, 'Brand#', 'B') AS brand_short, " +
        "CAST(instr(p_name, ' ') AS INT) AS first_space, " +
        "regexp_split_to_array(p_brand, '#')[2] AS brand_num, " +
        "reverse(p_brand) AS brand_rev, " +
        "translate(p_brand, '#', '-') AS brand_dash FROM part"),
    "q80_scalar_subquery" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)",
    "q81_in_subquery" ->
      "SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)",
    "q82_correlated_subquery" ->
      // the genuinely-correlated form: DuckDB evaluates it as written,
      // the Spark side is the decorrelated join Catalyst would produce
      ("SELECT o_orderkey, o_custkey, o_totalprice, " +
        "CAST(floor((SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 100) AS BIGINT) AS cust_avg_cents " +
        "FROM orders o WHERE o_totalprice > " +
        "(SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) * 1.5")
  )
}
