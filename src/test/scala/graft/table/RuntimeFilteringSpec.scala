package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Dynamic (runtime) file pruning on graft DSv2 scans: the selective
  * predicate of a star join lives on the DIMENSION side, so static
  * pushdown can't prune the fact scan — Spark's dynamic partition
  * pruning hands the dim's join keys to the scan at execution time
  * (`SupportsRuntimeV2Filtering`), and `GraftRuntimeFilterScan` re-runs
  * the manifest walk (bucket transform + footer stats + blooms) over
  * them. On a fact table bucketed by the join key this scans only the
  * matching buckets' files. */
class RuntimeFilteringSpec extends SparkSpecBase {

  private val factSchema = StructType(Seq(
    StructField("fk", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))
  private val dimSchema = StructType(Seq(
    StructField("dk", LongType, nullable = false),
    StructField("seg", StringType, nullable = true)))

  private lazy val wh = tmpDir("graft-rtf")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g5", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g5.warehouse", wh)

    // fact: 1600 rows over 40 keys, bucketed bucket(16, fk) -> 16 files
    val fact = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 1600L).map(i => Row(i % 40 + 1, i * 3)), 4), factSchema)
    GraftTable.create(s"$wh/db/fact_rt", factSchema,
      partitionBy = Seq("bucket(16,fk)")).append(fact, Some(1000L))
    // dim: one row per key, three segments
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 40L).map(i => Row(i, s"seg${i % 20}")), 2), dimSchema)
    GraftTable.create(s"$wh/db/dim_rt", dimSchema).append(dim, Some(1000L))
  }

  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val rest = plan match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allNodes(r.child)
      case other => other.children.flatMap(allNodes)
    }
    plan +: rest
  }

  private def factScans(df: DataFrame)
      : Seq[org.apache.spark.sql.classic.GraftRuntimeFilterScan] =
    allNodes(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b
    }.map(_.scan).collect {
      case s: org.apache.spark.sql.classic.GraftRuntimeFilterScan
          if s.readSchema().fieldNames.contains("fk") ||
            s.readSchema().fieldNames.contains("val") => s
    }

  /** Files in one bucket's directory (the append writes one file per
    * input partition per bucket, so counts are relative, not absolute). */
  private lazy val allFactFiles: Int =
    factScans(spark.read.table("g5.db.fact_rt")).head.plannedFileCount

  test("dim-side filter prunes fact files at runtime through the join") {
    // seg5 keeps dim keys {5, 25} -> at most 2 of 16 fact buckets survive
    val fact = spark.read.table("g5.db.fact_rt")
    val dim = spark.read.table("g5.db.dim_rt").filter(col("seg") === "seg5")
    val j = fact.join(dim, col("fk") === col("dk"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("s"))
    val Array(r) = j.collect()

    // parity against the same computation with no DSv2/DPP in the way
    val exp = (1L to 1600L).map(i => (i % 40 + 1, i * 3))
      .filter { case (k, _) => k == 5L || k == 25L }
    assert(r.getLong(0) == exp.size.toLong)
    assert(r.getLong(1) == exp.map(_._2).sum)

    // the runtime filter must land exactly where the equivalent STATIC
    // filter lands (same manifest walk, same keys — ground truth)
    val static = factScans(
      spark.read.table("g5.db.fact_rt").filter(col("fk").isin(5L, 25L)))
      .head.plannedFileCount
    val scans = factScans(j)
    assert(scans.nonEmpty, "fact scan not found in the executed plan")
    val kept = scans.map(_.plannedFileCount).min
    assert(kept == static,
      s"runtime filter kept $kept of $allFactFiles files; the static " +
        s"IN-filter walk keeps $static")
    assert(static < allFactFiles,
      "fixture degenerate: the static filter prunes nothing")
  }

  test("plan carries a dynamic pruning expression on the fact side") {
    val fact = spark.read.table("g5.db.fact_rt")
    val dim = spark.read.table("g5.db.dim_rt").filter(col("seg") === "seg7")
    val j = fact.join(dim, col("fk") === col("dk")).select(col("val"))
    j.collect()
    val scans = allNodes(j.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[
        org.apache.spark.sql.classic.GraftRuntimeFilterScan] => b
    }
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "no runtime filter was injected on the graft fact scan:\n" +
        j.queryExecution.executedPlan.toString)
  }

  test("runtime pruning never drops rows: full-key dim keeps every file") {
    val fact = spark.read.table("g5.db.fact_rt")
    val dim = spark.read.table("g5.db.dim_rt").filter(col("dk") <= 40L)
    val j = fact.join(dim, col("fk") === col("dk"))
    assert(j.count() == 1600L)
  }

  test("static pushdown still prunes without any join (wrapper intact)") {
    val f = spark.read.table("g5.db.fact_rt").filter(col("fk") === 7L)
    assert(f.count() == 40L)
    // one key -> one bucket: the transform walk must cut deep (exact
    // count depends on how the writer laid files into that bucket)
    val scans = factScans(f)
    assert(scans.nonEmpty && scans.head.plannedFileCount <= allFactFiles / 4,
      s"static bucket pruning through the wrapper broke: " +
        s"${scans.map(_.plannedFileCount)} of $allFactFiles")
  }

  test("key-grouped scans never take the runtime-filter wrapper") {
    val kg = spark.read.option("key-grouped", "true").table("g5.db.fact_rt")
    val scans = allNodes(kg.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.nonEmpty)
    assert(scans.forall(
      !_.isInstanceOf[org.apache.spark.sql.classic.GraftRuntimeFilterScan]),
      "key-grouped scan must stay bucket-aligned, not runtime-filterable")
  }

  test("self-join of the same table still reuses one scan (equality)") {
    val a = spark.read.table("g5.db.dim_rt")
    val b = spark.read.table("g5.db.dim_rt")
    val scans = allNodes(
      a.join(b.withColumnRenamed("dk", "dk2").withColumnRenamed("seg", "s2"),
        col("dk") === col("dk2")).queryExecution.executedPlan)
      .collect { case s: BatchScanExec => s.scan }
    assert(scans.size >= 2)
    assert(scans.head == scans(1),
      "identical reads of one table must compare equal for scan reuse")
  }
}
