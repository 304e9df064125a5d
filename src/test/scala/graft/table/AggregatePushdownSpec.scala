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

  test("a WHERE clause falls back to the real scan and stays exact") {
    val q = spark.sql("SELECT count(*) AS n FROM g6.db.agg_t WHERE id > 55")
    assert(!isLocal(q), "filtered aggregate must NOT come from totals")
    assert(q.collect().toSeq == Seq(Row(5L)))
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
}
