package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** ANALYZE-maintained NDV statistics ([[GraftTable.analyze]]) and the
  * DSv2 scan's manifest-exact `SupportsReportStatistics`: Catalyst's
  * cost-based optimizer must see real rowCounts and distinct counts from
  * a graft scan — the difference between a guessed and an informed join
  * order at 100 TB.
  */
class CboStatsSpec extends SparkSpecBase {

  private lazy val wh = tmpDir("graft-cbo")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g11", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g11.warehouse", wh)
  }

  private def mk(name: String, df: org.apache.spark.sql.DataFrame): GraftTable = {
    val t = GraftTable.create(s"$wh/db/$name", df.schema)
    t.append(df, Some(1000L))
    GraftTable.load(s"$wh/db/$name")
  }

  test("analyze: NDV near-exact on small sets; incremental union after appends") {
    import spark.implicits._
    val t = mk("an_t", (1L to 500L).map(i => (i, s"v${i % 37}"))
      .toDF("id", "v"))
    val analyzed = t.analyze(spark)
    val ndv = analyzed.columnNdv
    // HLL on a few hundred values is exact or near-exact
    assert(math.abs(ndv("id") - 500L) <= 10, s"ndv(id)=${ndv("id")}")
    assert(math.abs(ndv("v") - 37L) <= 2, s"ndv(v)=${ndv("v")}")
    assert(analyzed.properties(s"${GraftTable.PropStatsSnapPrefix}id") == "1")

    // append NEW distinct values; re-analyze sketches ONLY the new files
    // and unions with the stored sketch — the estimate must cover both
    analyzed.append((501L to 700L).map(i => (i, s"w${i % 11}"))
      .toDF("id", "v"), Some(2000L))
    val re = GraftTable.load(t.dir).analyze(spark)
    val ndv2 = re.columnNdv
    assert(math.abs(ndv2("id") - 700L) <= 15, s"ndv2(id)=${ndv2("id")}")
    assert(math.abs(ndv2("v") - 48L) <= 3, s"ndv2(v)=${ndv2("v")}")
    assert(re.properties(s"${GraftTable.PropStatsSnapPrefix}id") == "2")
    // a third analyze with nothing new is a metadata-only no-op pass
    val re2 = GraftTable.load(t.dir).analyze(spark)
    assert(re2.columnNdv == ndv2)
  }

  test("analyze: a column first analyzed LATER still covers the whole table") {
    import spark.implicits._
    // analyze only id at snapshot 1; then ask for v with NO new commits —
    // the per-column sketch gate must sketch v over ALL files, not the
    // empty fresh set (the global-snapshot-gate bug)
    val t = mk("an_l", (1L to 300L).map(i => (i, s"v${i % 23}"))
      .toDF("id", "v"))
    t.analyze(spark, Seq("id")): Unit
    val re = GraftTable.load(t.dir).analyze(spark, Seq("v"))
    assert(math.abs(re.columnNdv("v") - 23L) <= 2,
      s"late-analyzed column missed rows: ${re.columnNdv.get("v")}")
    // rename migrates the stats (values unchanged ⇒ sketch still valid);
    // a re-analyze under the new name stays incremental
    val renamed = re.renameColumn("v", "w")
    assert(renamed.columnNdv.contains("w") && !renamed.columnNdv.contains("v"))
    assert(math.abs(renamed.columnNdv("w") - 23L) <= 2)
    // drop removes them
    val dropped = renamed.dropColumn("w")
    assert(!dropped.columnNdv.contains("w"))
  }

  test("analyze: a column SUBSET never poisons another column's coverage") {
    import spark.implicits._
    // sketch both at snap 1; append NEW values; re-analyze ONLY id —
    // v's watermark must NOT advance, so a later analyze of v still
    // sketches the snap-2 files (the global-gate poisoning bug)
    val t = mk("an_s", (1L to 200L).map(i => (i, s"v${i % 10}"))
      .toDF("id", "v"))
    t.analyze(spark): Unit
    GraftTable.load(t.dir)
      .append((201L to 400L).map(i => (i, s"w${i % 15}")).toDF("id", "v"),
        Some(2000L)): Unit
    val mid = GraftTable.load(t.dir).analyze(spark, Seq("id"))
    assert(mid.properties(s"${GraftTable.PropStatsSnapPrefix}id") == "2")
    assert(mid.properties(s"${GraftTable.PropStatsSnapPrefix}v") == "1",
      "subset analyze advanced another column's watermark")
    val fin = mid.analyze(spark, Seq("v"))
    assert(math.abs(fin.columnNdv("v") - 25L) <= 2,
      s"v's coverage was poisoned: ${fin.columnNdv.get("v")}")
  }

  test("CALL analyze_table surfaces NDVs through the procedure catalog") {
    import spark.implicits._
    mk("an_p", (1L to 100L).map(i => (i, s"g${i % 5}")).toDF("id", "v"))
    val got = spark.sql(
      "CALL g11.system.analyze_table('db.an_p', columns => 'v')").collect()
    assert(got.length == 1 && got.head.getString(0) == "v")
    assert(math.abs(got.head.getLong(1) - 5L) <= 1, got.mkString(","))
  }

  test("scan statistics: exact rowCount; NDV colStats visible under CBO") {
    import spark.implicits._
    val t = mk("st_t", (1L to 400L).map(i => (i, i % 20)).toDF("id", "k"))
    t.analyze(spark): Unit
    val df = spark.sql("SELECT id, k FROM g11.db.st_t")
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.get
    val stats = rel.stats
    assert(stats.rowCount.contains(BigInt(400)),
      s"rowCount=${stats.rowCount}")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val rel2 = spark.sql("SELECT id, k FROM g11.db.st_t")
        .queryExecution.optimizedPlan.collectFirst {
          case r: DataSourceV2ScanRelation => r
        }.get
      val attr = rel2.stats.attributeStats.toSeq
        .map { case (a, s) => a.name -> s }.toMap
      assert(attr.get("k").flatMap(_.distinctCount)
        .exists(n => (n - BigInt(20)).abs <= 2),
        s"k colStat=${attr.get("k")}")
    } finally spark.conf.unset("spark.sql.cbo.enabled")

    // a statically-pruned scan reports the KEPT entries' counts, not the
    // table's — append a second file and filter it away
    GraftTable.load(t.dir)
      .append((1000L to 1100L).map(i => (i, 99L)).toDF("id", "k"),
        Some(2000L)): Unit
    val pruned = spark.sql("SELECT id FROM g11.db.st_t WHERE id <= 400")
    val prel = pruned.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r
    }.get
    assert(prel.stats.rowCount.contains(BigInt(400)),
      s"pruned rowCount=${prel.stats.rowCount} (expected the first " +
        "file's 400 rows only)")
  }

  test("3-table join reorders under CBO with stats; stays as written without") {
    import spark.implicits._
    // fact: 600 rows, b_k over 200 values, c_k over 10 values;
    // dim_small holds only 3 of the 10 c_k values → fact ⋈ dim_small is
    // the cheaper first join (est 180 rows vs 600 for fact ⋈ dim_big)
    mk("f_t", (1L to 600L).map(i => (i, i % 200, i % 10))
      .toDF("id", "b_k", "c_k"))
    mk("db_t", (0L until 200L).map(i => (i, s"b$i")).toDF("b_k", "b_v"))
    mk("dc_t", (0L until 3L).map(i => (i, s"c$i")).toDF("c_k", "c_v"))
    Seq("f_t", "db_t", "dc_t").foreach(n =>
      GraftTable.load(s"$wh/db/$n").analyze(spark): Unit)
    val q = "SELECT f.id, b.b_v, c.c_v FROM g11.db.f_t f " +
      "JOIN g11.db.db_t b ON f.b_k = b.b_k " +
      "JOIN g11.db.dc_t c ON f.c_k = c.c_k"
    def scanOrder(): Seq[String] = spark.sql(q).queryExecution.optimizedPlan
      .collect { case r: DataSourceV2ScanRelation => r.relation.name }
    val plain = scanOrder()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val reordered =
      try scanOrder()
      finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    assert(plain.map(n => n.split('.').last) ==
      Seq("f_t", "db_t", "dc_t"), s"baseline order drifted: $plain")
    assert(reordered != plain,
      s"CBO join reorder had no effect: $reordered — scan stats " +
        "(rowCount + NDV) are not reaching the optimizer")
    // the selective dim joins FIRST under cost-based ordering
    assert(reordered.map(n => n.split('.').last).indexOf("dc_t") <
      reordered.map(n => n.split('.').last).indexOf("db_t"),
      s"expected dc_t before db_t, got $reordered")
  }
}
