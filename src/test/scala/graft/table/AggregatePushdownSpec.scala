package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** DSv2 aggregate pushdown: group-less COUNT(*) / COUNT(col) / MIN /
  * MAX answered exactly from manifest metadata — the plan collapses to
  * a one-row LocalTableScan, zero tasks, zero file I/O. Anything the
  * metadata cannot answer EXACTLY (filters, grouping, strings, doubles,
  * distinct) falls back to the normal scan. */
class AggregatePushdownSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = true),
    StructField("amt", DecimalType(9, 2), nullable = true),
    StructField("nv", LongType, nullable = true),
    StructField("dbl", DoubleType, nullable = true)))

  private lazy val wh = tmpDir("graft-aggpd")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g6", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g6.warehouse", wh)
    val tb = GraftTable.create(s"$wh/db/agg_t", schema)
    def df(rows: Seq[Row]): DataFrame = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // snapshot 1: ids 1-50, nv null below 25, amt = id * 1.25
    tb.append(df((1L to 50L).map(i => Row(i, s"g${i % 3}",
      new java.math.BigDecimal(i * 125, new java.math.MathContext(9))
        .movePointLeft(2),
      if (i < 25) null else java.lang.Long.valueOf(i),
      java.lang.Double.valueOf(i * 0.5)))), Some(1000L))
    // snapshot 2: ids 51-60, nv ALL null (an all-null file must be
    // skipped by MIN/MAX, not refuse the pushdown)
    tb.append(df((51L to 60L).map(i => Row(i, s"g${i % 3}",
      new java.math.BigDecimal(i * 125).movePointLeft(2),
      null, java.lang.Double.valueOf(i * 0.5)))), Some(2000L))
  }

  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val rest = plan match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    }
    plan +: rest
  }

  private def isLocal(df: DataFrame): Boolean = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    nodes.exists(_.isInstanceOf[LocalTableScanExec]) &&
      !nodes.exists(_.isInstanceOf[BatchScanExec])
  }

  test("count/min/max collapse to a local one-row scan — no file I/O") {
    val q = spark.sql("SELECT count(*) AS n, min(id) AS lo, max(id) AS hi, " +
      "count(nv) AS nn FROM g6.db.agg_t")
    assert(isLocal(q), "aggregate was not answered from metadata:\n" +
      q.queryExecution.executedPlan)
    assert(q.collect().toSeq == Seq(Row(60L, 1L, 60L, 26L)))
  }

  test("decimal bounds push down with exact scale") {
    val q = spark.sql("SELECT min(amt) AS lo, max(amt) AS hi FROM g6.db.agg_t")
    assert(isLocal(q))
    val Array(r) = q.collect()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("1.25")) == 0)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("75.00")) == 0)
  }

  test("all-null-column aggregate answers SQL null from metadata") {
    // restrict to the all-null snapshot? simpler: a column null in SOME
    // files still answers; a column null in EVERY row answers null
    val tb2 = GraftTable.create(s"$wh/db/agg_nulls", schema)
    tb2.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 5L).map(i => Row(i, null, null, null, null)), 1), schema),
      Some(1000L))
    val q = spark.sql("SELECT min(nv) AS lo, count(nv) AS nn " +
      "FROM g6.db.agg_nulls")
    assert(isLocal(q))
    assert(q.collect().toSeq == Seq(Row(null, 0L)))
  }

  test("a file-aligned WHERE is claimed: filtered count from metadata") {
    // ids 51-60 sit in two files (51-55, 56-60): `id > 55` drops every
    // file except 56-60, which PROVES all-match (min=56, no nulls) — the
    // filter is served by file selection alone and the count is a
    // manifest sum (the "count WHERE partition slice" question at 100 TB)
    val q = spark.sql("SELECT count(*) AS n, min(id) AS lo " +
      "FROM g6.db.agg_t WHERE id > 55")
    assert(isLocal(q), "provable filtered aggregate fell back to a scan:\n" +
      q.queryExecution.executedPlan)
    assert(q.collect().toSeq == Seq(Row(5L, 56L)))
  }

  test("a file-straddling WHERE falls back to the real scan, stays exact") {
    // `id > 53` keeps file 51-55 but cannot prove it (rows 51-53 fail):
    // the claim refuses, Spark re-applies the filter post-scan
    val q = spark.sql("SELECT count(*) AS n FROM g6.db.agg_t WHERE id > 53")
    assert(!isLocal(q), "unprovable filtered aggregate must NOT come " +
      "from totals")
    assert(q.collect().toSeq == Seq(Row(7L)))
  }

  test("a partition-slice WHERE on an identity layout is claimed") {
    val pschema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("region", StringType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/agg_fpart", pschema,
      partitionBy = Seq("region"))
    tb.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 30L).map(i => Row(i, s"r${i % 3}")), 2), pschema),
      Some(1000L))
    val q = spark.sql("SELECT count(*) AS n, min(k) AS lo, max(k) AS hi " +
      "FROM g6.db.agg_fpart WHERE region = 'r1'")
    assert(isLocal(q), "partition-slice count fell back to a scan:\n" +
      q.queryExecution.executedPlan)
    val ks = (1L to 30L).filter(_ % 3 == 1)
    assert(q.collect().toSeq == Seq(Row(ks.size.toLong, ks.min, ks.max)))
    // the filtered rows themselves also ride the claim (no re-filter
    // needed) and stay exact
    val rows = spark.sql(
      "SELECT k FROM g6.db.agg_fpart WHERE region = 'r1'")
    assert(rows.collect().map(_.getLong(0)).sorted.toSeq == ks)
  }

  private def mkDaysTable(name: String, spec: String): GraftTable = {
    val tschema = StructType(Seq(
      StructField("eid", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("val", LongType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/$name", tschema,
      partitionBy = Seq(spec))
    val rows = (1 to 36).map(i => Row(i.toLong,
      java.sql.Timestamp.valueOf(
        f"2026-02-${i % 6 + 1}%02d ${i % 12}%02d:15:00"),
      if (i % 5 == 0) null else java.lang.Long.valueOf(i.toLong)))
    tb.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), tschema), Some(1000L))
    tb
  }

  test("GROUP BY CAST(ts AS DATE) over a days(ts) layout is metadata-only") {
    val tb = mkDaysTable("agg_days", "days(ts)")
    val q = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n, " +
      "count(val) AS nv, min(eid) AS lo FROM g6.db.agg_days " +
      "GROUP BY 1 ORDER BY day")
    assert(isLocal(q), "daily counts over days(ts) fell back to a scan:\n" +
      q.queryExecution.executedPlan)
    tb.read(spark).createOrReplaceTempView("agg_days_raw")
    val want = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n, " +
      "count(val) AS nv, min(eid) AS lo FROM agg_days_raw " +
      "GROUP BY 1 ORDER BY day").collect().toSeq
    assert(q.collect().toSeq == want)
  }

  test("GROUP BY CAST(ts AS DATE) over an hours(ts) layout aggregates " +
      "hour partitions into days") {
    val tb = mkDaysTable("agg_hours", "hours(ts)")
    val q = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n " +
      "FROM g6.db.agg_hours GROUP BY 1 ORDER BY day")
    assert(isLocal(q), "daily counts over hours(ts) fell back:\n" +
      q.queryExecution.executedPlan)
    tb.read(spark).createOrReplaceTempView("agg_hours_raw")
    val want = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n " +
      "FROM agg_hours_raw GROUP BY 1 ORDER BY day").collect().toSeq
    assert(q.collect().toSeq == want)
  }

  test("misaligned grouping refuses: months layout, date_trunc, non-UTC") {
    val tb = mkDaysTable("agg_months", "months(ts)")
    // a month partition spans many dates — the cast grouping CANNOT be
    // served from month ordinals and must fall back (exactly)
    val q = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n " +
      "FROM g6.db.agg_months GROUP BY 1 ORDER BY day")
    assert(!isLocal(q), "months-layout cast grouping must fall back")
    tb.read(spark).createOrReplaceTempView("agg_months_raw")
    assert(q.collect().toSeq == spark.sql(
      "SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM agg_months_raw " +
        "GROUP BY 1 ORDER BY day").collect().toSeq)
    // date_trunc is not v2-translatable — never offered, falls back
    val qt = spark.sql("SELECT date_trunc('DAY', ts) AS d, count(*) AS n " +
      "FROM g6.db.agg_days GROUP BY 1 ORDER BY d")
    assert(!isLocal(qt))
    assert(qt.collect().map(_.getLong(1)).sum == 36L)
    // CAST over TimestampType follows the session tz; ordinals are UTC —
    // a non-UTC session must refuse (and recompute exactly)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val qz = spark.sql("SELECT CAST(ts AS DATE) AS day, count(*) AS n " +
        "FROM g6.db.agg_days GROUP BY 1")
      assert(!isLocal(qz), "non-UTC session must not use UTC ordinals")
      assert(qz.collect().map(_.getLong(1)).sum == 36L)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("GROUP BY a days-partitioned DATE column answers from ordinals") {
    val dschema = StructType(Seq(
      StructField("d", DateType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val tb = GraftTable.create(s"$wh/db/agg_dcol", dschema,
      partitionBy = Seq("days(d)"))
    val rows = (1 to 20).map(i => Row(
      java.sql.Date.valueOf(f"2026-03-${i % 4 + 1}%02d"), i.toLong))
    tb.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), dschema), Some(1000L))
    val q = spark.sql("SELECT d, count(*) AS n FROM g6.db.agg_dcol " +
      "GROUP BY d ORDER BY d")
    assert(isLocal(q), "date-column grouping fell back:\n" +
      q.queryExecution.executedPlan)
    assert(q.collect().map(_.getLong(1)).toSeq == Seq(5L, 5L, 5L, 5L))
  }

  test("strings and doubles refuse (truncation / NaN unsoundness)") {
    val qs = spark.sql("SELECT max(grp) AS g FROM g6.db.agg_t")
    assert(!isLocal(qs))
    assert(qs.collect().head.getString(0) == "g2")
    val qd = spark.sql("SELECT min(dbl) AS d FROM g6.db.agg_t")
    assert(!isLocal(qd))
    assert(qd.collect().head.getDouble(0) == 0.5)
  }

  test("GROUP BY and DISTINCT fall back") {
    val qg = spark.sql(
      "SELECT grp, count(*) AS n FROM g6.db.agg_t GROUP BY grp")
    assert(!isLocal(qg))
    assert(qg.collect().map(_.getLong(1)).sum == 60L)
    val qd = spark.sql("SELECT count(DISTINCT grp) AS n FROM g6.db.agg_t")
    assert(!isLocal(qd))
    assert(qd.collect().head.getLong(0) == 3L)
  }

  test("time travel answers the pinned snapshot's totals") {
    val q = spark.sql(
      "SELECT count(*) AS n, max(id) AS hi FROM g6.db.agg_t VERSION AS OF 1")
    assert(isLocal(q))
    assert(q.collect().toSeq == Seq(Row(50L, 50L)))
  }

  test("Dataset API aggregates push down the same way") {
    val q = spark.read.table("g6.db.agg_t")
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"))
    assert(isLocal(q))
    assert(q.collect().toSeq == Seq(Row(60L, 1L)))
  }

  test("GROUP BY an identity partition column answers from metadata") {
    val pschema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("region", StringType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/agg_part", pschema,
      partitionBy = Seq("region"))
    tb.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 30L).map(i => Row(i, s"r${i % 3}")), 2), pschema),
      Some(1000L))
    val q = spark.sql("SELECT region, count(*) AS n, min(k) AS lo, " +
      "max(k) AS hi FROM g6.db.agg_part GROUP BY region ORDER BY region")
    assert(isLocal(q), "partition-grouped aggregate fell back to a scan:\n" +
      q.queryExecution.executedPlan)
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exp = (1L to 30L).groupBy(i => s"r${i % 3}").toSeq.sortBy(_._1)
      .map { case (g, ks) => (g, ks.size.toLong, ks.min, ks.max) }
    assert(got == exp)
    // grouping by a NON-partition column falls back and stays exact
    val qf = spark.sql(
      "SELECT k % 2 AS b, count(*) AS n FROM g6.db.agg_part GROUP BY k % 2")
    assert(!isLocal(qf))
    assert(qf.collect().map(_.getLong(1)).sum == 30L)
  }

  test("driver query v45 is plan-gated to the metadata answer") {
    val q = graft.SparkEntry.queries("v45_graft_agg_stats")(
      spark, "/root/testdata/sf0.001")
    assert(isLocal(q),
      "v45_graft_agg_stats fell back to a file scan:\n" +
        q.queryExecution.executedPlan)
  }

  test("driver query v48 is plan-gated to the partition-grouped answer") {
    val q = graft.SparkEntry.queries("v48_graft_agg_group")(
      spark, "/root/testdata/sf0.001")
    assert(isLocal(q),
      "v48_graft_agg_group fell back to a file scan:\n" +
        q.queryExecution.executedPlan)
  }

  test("driver query v50 is plan-gated to the filtered metadata answer") {
    val q = graft.SparkEntry.queries("v50_graft_agg_filtered")(
      spark, "/root/testdata/sf0.001")
    assert(isLocal(q),
      "v50_graft_agg_filtered fell back to a file scan:\n" +
        q.queryExecution.executedPlan)
  }

  test("driver query v51 is plan-gated to the daily metadata answer") {
    val q = graft.SparkEntry.queries("v51_graft_agg_daily")(
      spark, "/root/testdata/sf0.001")
    assert(isLocal(q),
      "v51_graft_agg_daily fell back to a file scan:\n" +
        q.queryExecution.executedPlan)
  }
}
