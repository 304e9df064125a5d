package graft.queries

import org.apache.spark.sql.functions._

/** Faithful TPC-H query shapes adapted to the driver's synthetic schema
  * (dates span 1995-2001; p_type values are single words). These are the
  * canonical multi-join/agg plans the engine must execute well at scale:
  * selective date predicates push to the scans, dimensions broadcast, the
  * fact table shuffles at most once per aggregation. Money math runs
  * through DECIMAL for engine-portable results (see Relational).
  */
object TpcH extends QueryPack {

  private def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** Discounted line revenue — mirrors the oracle side's single `disc`
    * definition so a precision change happens in exactly one place per
    * side. */
  private def discRevenue =
    money(col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  val queries: Map[String, Q] = Map(

    // Q1: pricing summary report (full form, incl. tax + charge)
    "h01_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(money(col("l_extendedprice"))), 2).cast("double")
            .as("sum_base_price"),
          round(sum(discRevenue), 2)
            .cast("double").as("sum_disc_price"),
          // three 2dp factors → the exact product has SIX decimal digits;
          // a 4dp cast rounds at half-boundaries the engines resolve
          // differently, a 6dp cast is exact in both
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).cast("decimal(18,6)")), 2)
            .cast("double").as("sum_charge"),
          round(sum(money(col("l_discount"))).cast("double") / count(lit(1)), 6)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q3: shipping priority — revenue of undelivered orders per segment
    "h03_shipping_priority" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) < lit("1998-03-15"))
      val l = t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")) > lit("1998-03-15"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(discRevenue), 2)
          .cast("double").as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          to_date(col("o_orderdate")).as("o_date"))
        .orderBy(col("revenue").desc, col("o_date").asc, col("l_orderkey").asc)
        .limit(10)
    }),

    // Q5: local supplier volume — revenue per nation where the supplier
    // and customer share the nation
    "h05_local_supplier" -> ((s, d) => {
      val re = t(s, d, "region").filter(col("r_name") === "ASIA")
      val na = t(s, d, "nation")
      val su = t(s, d, "supplier")
      val cu = t(s, d, "customer")
      val or = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
          to_date(col("o_orderdate")) < lit("1997-01-01"))
      val li = t(s, d, "lineitem")
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(su, li("l_suppkey") === su("s_suppkey"))
        .join(cu, or("o_custkey") === cu("c_custkey") &&
          su("s_nationkey") === cu("c_nationkey"))
        .join(broadcast(na), su("s_nationkey") === na("n_nationkey"))
        .join(broadcast(re), na("n_regionkey") === re("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(discRevenue), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // Q6: forecasting revenue change — single-scan selective aggregate
    "h06_forecast_revenue" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(
          to_date(col("l_shipdate")) >= lit("1996-01-01") &&
            to_date(col("l_shipdate")) < lit("1997-01-01") &&
            col("l_discount").between(0.03, 0.05) &&
            col("l_quantity") < 24)
        .agg(round(sum(money(col("l_extendedprice") * col("l_discount"))), 2)
          .cast("double").as("revenue"))),

    // Q10: returned item reporting — customers who returned items
    "h10_returned_items" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val or = t(s, d, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
          to_date(col("o_orderdate")) < lit("1996-04-01"))
      val cu = t(s, d, "customer")
      val na = t(s, d, "nation")
      li.join(or, li("l_orderkey") === or("o_orderkey"))
        .join(cu, or("o_custkey") === cu("c_custkey"))
        .join(broadcast(na), cu("c_nationkey") === na("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(round(sum(discRevenue), 2)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // Q14: promotion effect — share of promo revenue in a month
    "h14_promo_effect" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-09-01") &&
          to_date(col("l_shipdate")) < lit("1996-10-01"))
      val pa = t(s, d, "part")
      li.join(pa, li("l_partkey") === pa("p_partkey"))
        .agg(
          round(sum(when(col("p_type") === "PROMO",
            discRevenue)
            .otherwise(money(lit(0.0)))), 2).cast("double")
            .as("promo_revenue"),
          round(sum(discRevenue), 2)
            .cast("double").as("total_revenue"))
    })
  )

  val oracleSql: Map[String, String] = {
    val disc = "CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,4))"
    Map(
      "h01_pricing_summary" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price, " +
          s"CAST(round(sum($disc), 2) AS DOUBLE) AS sum_disc_price, " +
          "CAST(round(sum(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge, " +
          "round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc, " +
          "count(*) AS count_order " +
          "FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      "h03_shipping_priority" ->
        (s"SELECT l_orderkey, CAST(round(sum($disc), 2) AS DOUBLE) AS revenue, CAST(o_orderdate AS DATE) AS o_date " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "WHERE c_mktsegment = 'BUILDING' AND CAST(o_orderdate AS DATE) < DATE '1998-03-15' " +
          "AND CAST(l_shipdate AS DATE) > DATE '1998-03-15' " +
          "GROUP BY l_orderkey, o_orderdate " +
          "ORDER BY revenue DESC, o_date ASC, l_orderkey ASC LIMIT 10"),
      "h05_local_supplier" ->
        (s"SELECT n_name, CAST(round(sum($disc), 2) AS DOUBLE) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "WHERE r_name = 'ASIA' AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' " +
          "AND CAST(o_orderdate AS DATE) < DATE '1997-01-01' " +
          "GROUP BY n_name ORDER BY revenue DESC, n_name ASC"),
      "h06_forecast_revenue" ->
        ("SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue " +
          "FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' " +
          "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' " +
          "AND l_discount BETWEEN 0.03 AND 0.05 AND l_quantity < 24"),
      "h10_returned_items" ->
        (s"SELECT c_custkey, c_name, c_acctbal, n_name, CAST(round(sum($disc), 2) AS DOUBLE) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN nation ON c_nationkey = n_nationkey " +
          "WHERE l_returnflag = 'R' AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' " +
          "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' " +
          "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
          "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"),
      "h14_promo_effect" ->
        (s"SELECT CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN $disc ELSE CAST(0.0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS promo_revenue, " +
          s"CAST(round(sum($disc), 2) AS DOUBLE) AS total_revenue " +
          "FROM lineitem JOIN part ON l_partkey = p_partkey " +
          "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01' AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'")
    )
  }
}
