package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** SQL views over graft catalogs (Iceberg view parity): versioned
  * warehouse-stored view metadata, statements intercepted at parse time,
  * reads spliced at resolution — see [[GraftViews]]. All view SQL runs
  * on an EXTENSIONS session (the statements need GraftViewParser). */
class GraftViewsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private lazy val wh = tmpDir("graft-views")
  private lazy val sE = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    s.conf.set("spark.sql.catalog.gvw", "graft.table.GraftSparkCatalog")
    s.conf.set("spark.sql.catalog.gvw.warehouse", wh)
    s
  }

  test("CREATE VIEW + SELECT: stored SQL re-plans against current state") {
    val t = GraftTable.create(s"$wh/db/base", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "a"), Some(1000L))
    sE.sql("CREATE VIEW gvw.db.av AS " +
      "SELECT data, count(*) AS n FROM gvw.db.base GROUP BY data")
    assert(sE.sql("SELECT * FROM gvw.db.av ORDER BY data").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    // a view is TEXT, not a materialization: new data shows up
    t.append(mkDf(4L -> "b"), Some(2000L))
    assert(sE.sql("SELECT n FROM gvw.db.av WHERE data = 'b'").collect()
      .head.getLong(0) == 2L)
    // usable inside bigger queries (joins, subqueries)
    assert(sE.sql("SELECT sum(n) FROM gvw.db.av").collect()
      .head.getLong(0) == 4L)
  }

  test("column aliases, OR REPLACE versioning, ALTER VIEW AS, history") {
    val t = GraftTable.create(s"$wh/db/base2", schema)
    t.append(mkDf(1L -> "x"), Some(1000L))
    sE.sql("CREATE VIEW gvw.db.cv (k, v) AS SELECT id, data FROM gvw.db.base2")
    assert(sE.sql("SELECT k, v FROM gvw.db.cv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "x")))
    // CREATE without REPLACE refuses; IF NOT EXISTS no-ops
    intercept[Exception] {
      sE.sql("CREATE VIEW gvw.db.cv AS SELECT 1 AS one") }
    sE.sql("CREATE VIEW IF NOT EXISTS gvw.db.cv AS SELECT 1 AS one")
    assert(sE.sql("SELECT k FROM gvw.db.cv").collect().length == 1,
      "IF NOT EXISTS must not have replaced the view")
    // OR REPLACE = version 2; ALTER AS = version 3; history retained
    sE.sql("CREATE OR REPLACE VIEW gvw.db.cv AS " +
      "SELECT id * 10 AS k FROM gvw.db.base2")
    assert(sE.sql("SELECT k FROM gvw.db.cv").collect()
      .map(_.getLong(0)).toSeq == Seq(10L))
    sE.sql("ALTER VIEW gvw.db.cv AS SELECT id * 100 AS k FROM gvw.db.base2")
    assert(sE.sql("SELECT k FROM gvw.db.cv").collect()
      .map(_.getLong(0)).toSeq == Seq(100L))
    val meta = GraftViews.load(wh, "db", "cv")
    assert(meta.currentVersionId == 3L)
    assert(meta.versions.map(_.versionId) == Seq(1L, 2L, 3L))
    assert(meta.versions.head.aliases == Seq("k", "v"))
  }

  test("nested views expand; cycles refuse loudly") {
    val t = GraftTable.create(s"$wh/db/base3", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    sE.sql("CREATE VIEW gvw.db.n1 AS SELECT id FROM gvw.db.base3 WHERE id > 1")
    sE.sql("CREATE VIEW gvw.db.n2 AS SELECT id * 2 AS id2 FROM gvw.db.n1")
    assert(sE.sql("SELECT id2 FROM gvw.db.n2").collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
    // cycle: n1 replaced to read n2 (which reads n1) — loud error
    sE.sql("CREATE OR REPLACE VIEW gvw.db.n1 AS SELECT id2 AS id FROM gvw.db.n2")
    val e = intercept[Exception] { sE.sql("SELECT * FROM gvw.db.n2").collect() }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }

  test("SHOW VIEWS (with pattern), DROP VIEW, name-collision guards") {
    GraftTable.create(s"$wh/db2/t1", schema)
    sE.sql("CREATE VIEW gvw.db2.va AS SELECT 1 AS one")
    sE.sql("CREATE VIEW gvw.db2.vb AS SELECT 2 AS two")
    assert(sE.sql("SHOW VIEWS IN gvw.db2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq ==
      Seq(("db2", "va", false), ("db2", "vb", false)))
    assert(sE.sql("SHOW VIEWS IN gvw.db2 LIKE 'v*a'").collect()
      .map(_.getString(1)).toSeq == Seq("va"))
    // drop + IF EXISTS discipline
    sE.sql("DROP VIEW gvw.db2.vb")
    intercept[Exception] { sE.sql("DROP VIEW gvw.db2.vb") }
    sE.sql("DROP VIEW IF EXISTS gvw.db2.vb")
    assert(sE.sql("SHOW VIEWS IN gvw.db2").collect().map(_.getString(1))
      .toSeq == Seq("va"))
    // a view cannot shadow a table, a table cannot shadow a view
    intercept[Exception] {
      sE.sql("CREATE VIEW gvw.db2.t1 AS SELECT 1 AS one") }
    intercept[Exception] {
      sE.sql("CREATE TABLE gvw.db2.va (id BIGINT) USING graft") }
    // SELECTing a dropped view fails as an unresolved relation
    intercept[Exception] { sE.sql("SELECT * FROM gvw.db2.vb").collect() }
  }

  test("DSv2 ViewCatalog API: list/load/exists/drop round-trip") {
    sE.sql("CREATE VIEW gvw.db4.api (a) AS SELECT 42 AS x")
    val cat = sE.sessionState.catalogManager.catalog("gvw")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db4"), "api")
    assert(cat.viewExists(ident))
    assert(cat.listViews("db4").map(_.name()).toSeq == Seq("api"))
    val v = cat.loadView(ident)
    assert(v.query().contains("SELECT 42"))
    assert(v.columnAliases().toSeq == Seq("a"))
    assert(v.schema().fieldNames.toSeq == Seq("a"))
    intercept[org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException] {
      cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
        ident, "SELECT 1", "gvw", Array("db4"), v.schema(),
        Array.empty, Array.empty, Array.empty,
        new java.util.HashMap[String, String]()))
    }
    assert(cat.dropView(ident))
    assert(!cat.viewExists(ident) && !cat.dropView(ident))
  }

  test("views compose with time travel and MoR-pending tables") {
    val t = GraftTable.create(s"$wh/db3/m", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t.deletePositional(spark, org.apache.spark.sql.functions.col("id") === 2L,
      Some(2000L))
    t.deleteDeferred(spark, org.apache.spark.sql.functions.col("id") === 3L,
      Some(3000L))
    // the view body reads the MoR-pending table through the extensions
    // splice — every delete form applies
    sE.sql("CREATE VIEW gvw.db3.live AS " +
      "SELECT id FROM gvw.db3.m")
    assert(sE.sql("SELECT id FROM gvw.db3.live").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // a view body may pin a snapshot (VERSION AS OF inside the text)
    sE.sql("CREATE VIEW gvw.db3.v1 AS " +
      "SELECT id FROM gvw.db3.m VERSION AS OF 1 ORDER BY id")
    assert(sE.sql("SELECT id FROM gvw.db3.v1").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("view text referencing a session temp view refuses (CREATE and ALTER)") {
    val t = GraftTable.create(s"$wh/db4/base", schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    mkDf(5L -> "t").createOrReplaceTempView("scratch_tmp")
    sE.createDataFrame(
      sE.sparkContext.parallelize(Seq(Row(5L, "t")), 1), schema)
      .createOrReplaceTempView("scratch_tmp_e")
    // stored text re-plans per session — a captured temp name would
    // silently resolve differently (or fail) elsewhere; refuse upfront
    val e = intercept[Exception] {
      sE.sql("CREATE VIEW gvw.db4.bad AS SELECT id FROM scratch_tmp_e")
    }
    assert(e.getMessage.contains("temporary"))
    assert(!GraftViews.exists(wh, "db4", "bad"))
    // a subquery reference is caught too
    intercept[Exception] {
      sE.sql("CREATE VIEW gvw.db4.bad2 AS SELECT id FROM gvw.db4.base " +
        "WHERE id IN (SELECT id FROM scratch_tmp_e)")
    }
    assert(!GraftViews.exists(wh, "db4", "bad2"))
    // ALTER enforces the same rule on the new text
    sE.sql("CREATE VIEW gvw.db4.ok AS SELECT id FROM gvw.db4.base")
    intercept[Exception] {
      sE.sql("ALTER VIEW gvw.db4.ok AS SELECT id FROM scratch_tmp_e")
    }
    assert(GraftViews.load(wh, "db4", "ok").versions.size == 1)
    sE.catalog.dropTempView("scratch_tmp_e")
    spark.catalog.dropTempView("scratch_tmp")
  }

  test("concurrent view upserts: the claim makes the loser fail loudly") {
    val t = GraftTable.create(s"$wh/db5/base", schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    sE.sql("CREATE VIEW gvw.db5.cc AS SELECT id FROM gvw.db5.base")
    // simulate a racing committer holding the claim
    val claim = java.nio.file.Paths.get(wh, "db5", "cc", ".view-claim")
    java.nio.file.Files.createFile(claim)
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        sE.sql("ALTER VIEW gvw.db5.cc AS SELECT data FROM gvw.db5.base")
      }
      assert(e.getMessage.contains("concurrent"))
      // nothing appended: the stored version list is untouched
      assert(GraftViews.load(wh, "db5", "cc").versions.size == 1)
    } finally java.nio.file.Files.deleteIfExists(claim)
    // claim released: the same ALTER lands as version 2
    sE.sql("ALTER VIEW gvw.db5.cc AS SELECT data FROM gvw.db5.base")
    assert(GraftViews.load(wh, "db5", "cc").versions.size == 2)
  }

  test("a stale claim (crashed committer) is adopted, not a permanent block") {
    val t = GraftTable.create(s"$wh/db6/base", schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    sE.sql("CREATE VIEW gvw.db6.st AS SELECT id FROM gvw.db6.base")
    // an orphaned claim whose mtime is past the staleness window
    val claim = java.nio.file.Paths.get(wh, "db6", "st", ".view-claim")
    java.nio.file.Files.createFile(claim)
    java.nio.file.Files.setLastModifiedTime(claim,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - GraftViews.StaleClaimMs - 1000L))
    // DDL adopts it and proceeds; the claim is cleaned up after
    sE.sql("ALTER VIEW gvw.db6.st AS SELECT data FROM gvw.db6.base")
    assert(GraftViews.load(wh, "db6", "st").versions.size == 2)
    assert(!java.nio.file.Files.exists(claim))
  }
}
