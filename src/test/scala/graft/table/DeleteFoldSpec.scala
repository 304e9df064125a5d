package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** The equality/predicate DELETE-DEBT fold ([[GraftTable.rewriteDeleteFiles]]
  * + `CALL rewrite_delete_files`): pending entries materialize by
  * rewriting ONLY their covered files — visible rows hash-identical, the
  * read plan loses its anti-joins/residual filters, `__deletes` drains,
  * uncovered files (and their deletion vectors) untouched, and the
  * operations that refuse pending equality state proceed. */
class DeleteFoldSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def rows(t: GraftTable): Set[(Long, String)] =
    t.read(spark).select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def paths(t: GraftTable): Set[String] =
    Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.map(_.path).toSet

  test("fold rewrites ONLY covered files; rows identical; plans lose the anti-join") {
    val dir = tmpDir("fold_mixed")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))        // snap 1
    t.append(mkDf(3L -> "c", 4L -> "d"), Some(2000L))        // snap 2
    // predicate entry covering snaps ≤ 2
    t.deleteDeferred(spark, col("id") === 2L, Some(3000L))   // snap 3
    // equality entry covering snaps ≤ 3
    t.deleteEquality(spark, mkDf(3L -> "x").select("id"),
      Seq("id"), Some(4000L))                                // snap 4
    // an UNCOVERED append after every entry, with its own DV debt
    t.append(mkDf(5L -> "e", 6L -> "f"), Some(5000L))        // snap 5
    t.deletePositional(spark, col("id") === 6L, Some(6000L)) // snap 6
    val t1 = GraftTable.load(s"$dir/t")
    val before = rows(t1)
    assert(before == Set(1L -> "a", 4L -> "d", 5L -> "e"))
    val uncovered = paths(t1).filter(p =>
      p.contains("part-00005")) // the snap-5 file(s)
    assert(uncovered.nonEmpty)
    // pre-fold read plan carries the equality ANTI-JOIN
    assert(t1.read(spark).queryExecution.optimizedPlan.toString
      .contains("Join"), "control: pending equality must plan an anti-join")

    val allBefore = paths(t1) // capture: paths() re-reads the live log
    val snap = t1.rewriteDeleteFiles(spark, Some(7000L)).get
    val t2 = GraftTable.load(s"$dir/t")
    // rows hash-identical, both forms drained
    assert(rows(t2) == before)
    assert(t2.pendingDeletes.isEmpty && t2.equalityDeletes.isEmpty)
    // positional debt of the UNCOVERED file survives as its vector
    assert(t2.positionalDeletes.nonEmpty)
    // only covered files rewritten: the snap-5 file(s) carry untouched
    assert(uncovered.subsetOf(paths(t2)),
      "uncovered files must not be rewritten")
    assert(snap.summary("rewritten-data-files").toLong ==
      (allBefore -- uncovered).size)
    // read plan: no join left (the residual DV filter is in-reader)
    assert(!t2.read(spark).queryExecution.optimizedPlan.toString
      .contains("Join"), "post-fold plan must lose the anti-join")
    // idempotent: nothing pends, nothing committed
    assert(t2.rewriteDeleteFiles(spark).isEmpty)
  }

  test("entries whose covered files are all gone drain metadata-only") {
    val dir = tmpDir("fold_dead")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.deleteDeferred(spark, col("id") === 2L, Some(2000L))
    // CoW delete rewrites the only covered file → the entry's covered
    // set empties but the (degraded) entry carries
    t.delete(spark, col("id") === 1L, Some(3000L))
    val t1 = GraftTable.load(s"$dir/t")
    if (t1.pendingDeletes.nonEmpty) {
      val filesBefore = paths(t1)
      val snap = t1.rewriteDeleteFiles(spark, Some(4000L)).get
      assert(snap.summary("rewritten-data-files") == "0",
        "dead entries must drain without data I/O")
      val t2 = GraftTable.load(s"$dir/t")
      assert(t2.pendingDeletes.isEmpty && t2.equalityDeletes.isEmpty)
      assert(paths(t2) == filesBefore)
      assert(rows(t2) == rows(t1))
    }
  }

  test("branch publish proceeds after folding fork-inherited delete debt") {
    val dir = tmpDir("fold_branch")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t.createBranch("audit", Some(2000L))
    val bt = GraftTable.load(s"$dir/t").branch("audit")
    // deferred forms refuse parent-era (../../) files — a compact
    // re-owns them into the branch's own sequence (two files so the
    // single-file no-op guard doesn't skip it), and the audit pass
    // then stages its curation as a pending predicate entry
    bt.append(mkDf(4L -> "d"), Some(2200L))
    assert(GraftTable.load(bt.dir)
      .compact(spark, smallerThanBytes = Long.MaxValue, Some(2500L))
      .isDefined)
    GraftTable.load(bt.dir)
      .deleteDeferred(spark, col("id") === 2L, Some(3000L))
    assert(GraftTable.load(bt.dir).pendingDeletes.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      GraftTable.load(s"$dir/t").publishBranch("audit", Some(4000L))
    }
    assert(e.getMessage.contains("rewriteDeleteFiles"), e.getMessage)
    // the surgical fold on the BRANCH unblocks publish — no full
    // compact, and the parent (whose head must stay at the fork) is
    // untouched
    assert(GraftTable.load(bt.dir).rewriteDeleteFiles(spark, Some(4500L))
      .isDefined)
    GraftTable.load(s"$dir/t").publishBranch("audit", Some(5000L))
    val pub = GraftTable.load(s"$dir/t")
    assert(rows(pub) == Set(1L -> "a", 3L -> "c", 4L -> "d"))
    assert(pub.pendingDeletes.isEmpty,
      "published state must carry the drained entry set")
  }

  test("CALL rewrite_delete_files: folds via SQL, no-op returns no rows") {
    val wh = tmpDir("fold_sql_wh")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gfold", "graft.table.GraftSparkCatalog")
    s2.conf.set("spark.sql.catalog.gfold.warehouse", wh)
    val cat = new GraftCatalog(wh)
    val t = cat.createTable("db.t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"),
      Seq("id"), Some(2000L))
    val res = s2.sql("CALL gfold.system.rewrite_delete_files('db.t')")
      .collect()
    assert(res.length == 1 && res.head.getLong(1) >= 1L, res.mkString)
    assert(GraftTable.load(s"$wh/db/t").equalityDeletes.isEmpty)
    // nothing pending: the next call commits nothing
    assert(s2.sql("CALL gfold.system.rewrite_delete_files('db.t')")
      .collect().isEmpty)
  }
}
