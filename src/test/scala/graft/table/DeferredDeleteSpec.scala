package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Merge-on-read (deferred predicate) DELETE semantics: metadata-only
  * commits, read-time filtering scoped to the files that existed at
  * delete time, materialization through compaction, and the conservative
  * refusals that keep every other surface sound.
  */
class DeferredDeleteSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-mor").toString

  private def ids(t: GraftTable, snap: Option[Long] = None): Seq[Long] =
    t.read(spark, snap).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("metadata-only commit hides rows; time travel still sees them") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "drop", 3L -> "c"), Some(1000L))
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t/data"))
      .filter(_.toString.endsWith(".parquet")).count()

    val snap = t.deleteDeferred(spark, col("data") === "drop", Some(2000L))
    assert(snap.get.operation == "delete")
    assert(snap.get.summary("deferred") == "true")
    // NO files written or rewritten — the commit is pure metadata
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t/data"))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(after == before, s"deferred delete wrote files: $before -> $after")

    assert(ids(t) == Seq(1L, 3L))
    assert(ids(t, Some(1L)) == Seq(1L, 2L, 3L), "time travel lost the row")
    assert(ids(t) == Seq(1L, 3L), "statelessness after TT")
  }

  test("scoping: rows appended AFTER the delete survive the predicate") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> "x"), Some(1000L))
    t.deleteDeferred(spark, col("data") === "x", Some(2000L))
    assert(ids(t) == Nil)
    // the SAME predicate value arrives again in new data — it must live
    t.append(mkDf(10L -> "x", 11L -> "y"), Some(3000L))
    assert(ids(t) == Seq(10L, 11L),
      "a deferred delete leaked onto rows appended after it")
    // stacking: a second deferred delete covers files up to ITS commit
    t.deleteDeferred(spark, col("data") === "y", Some(4000L))
    assert(ids(t) == Seq(10L))
    assert(t.pendingDeletes.size == 2)
  }

  test("compaction materializes: rows physically gone, predicates cleared") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "drop"), Some(1000L))
    t.append(mkDf(3L -> "drop", 4L -> "d"), Some(2000L))
    t.deleteDeferred(spark, col("data") === "drop", Some(3000L))
    assert(ids(t) == Seq(1L, 4L))

    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    assert(t.pendingDeletes.isEmpty, "full compaction must clear predicates")
    assert(ids(t) == Seq(1L, 4L))
    // physically gone: raw read of current files shows no 'drop' rows
    val mf = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    val raw = spark.read.parquet(mf.files.map(f => s"${t.dir}/${f.path}"): _*)
    assert(raw.filter(col("data") === "drop").count() == 0)
    // copy-on-write DML allowed again after materialization
    t.update(spark, col("id") === 4L, Map("data" -> lit("d2")), Some(5000L))
    assert(t.read(spark).filter(col("data") === "d2").count() == 1)
  }

  test("single-file table can still materialize (no compaction wedge)") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "keep", 2L -> "drop"), Some(1000L)) // ONE data file
    assert(t.deleteDeferred(spark, col("data") === "drop", Some(2000L)).isDefined)
    // compact must rewrite the single file rather than no-op, or the
    // pending set could never clear and CoW DML would be blocked forever
    assert(t.compact(spark, smallerThanBytes = Long.MaxValue, Some(3000L)).isDefined)
    assert(t.pendingDeletes.isEmpty)
    assert(ids(t) == Seq(1L))
    assert(t.update(spark, col("id") === 1L,
      Map("data" -> lit("k2")), Some(4000L)).isDefined)
  }

  test("compaction force-includes pending-covered files above the threshold") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "keep", 2L -> "drop"), Some(1000L))
    t.deleteDeferred(spark, col("data") === "drop", Some(2000L))
    // appended AFTER the delete → not covered by the pending predicate
    t.append(mkDf(3L -> "post"), Some(3000L))
    val before = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.map(_.path).toSet
    // threshold below every real file size: nothing qualifies by size, so
    // without force-inclusion compact() would no-op and the pending set —
    // the thing CoW DML's error message says compact() clears — could
    // never materialize
    assert(t.compact(spark, smallerThanBytes = 1L, Some(4000L)).isDefined,
      "compact must rewrite pending-covered files regardless of size")
    assert(t.pendingDeletes.isEmpty)
    assert(ids(t) == Seq(1L, 3L))
    val after = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.map(_.path).toSet
    // the uncovered post-delete file was carried untouched; the covered
    // file was rewritten (its old path is gone)
    assert(before.intersect(after).size == 1,
      s"exactly the uncovered file should carry over: $before -> $after")
    assert(t.update(spark, col("id") === 1L,
      Map("data" -> lit("k2")), Some(5000L)).isDefined)
  }

  test("provably-no-op deferred delete commits nothing") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    // id = 99 is outside every file's min/max — no commit, no pending tax
    assert(t.deleteDeferred(spark, col("id") === 99L, Some(2000L)).isEmpty)
    assert(t.pendingDeletes.isEmpty)
    assert(t.log.snapshots.size == 1)
    // CoW DML stays available
    assert(t.delete(spark, col("id") === 2L, Some(3000L)).isDefined)
  }

  test("copy-on-write DML composes while pending: no resurrection, counts degrade") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t.deleteDeferred(spark, col("id") === 2L, Some(2000L))
    assert(t.pendingDeletedCount.contains(1L))

    // CoW update of a COVERED file: the rewrite reads survivors only —
    // the predicate-dead row (id=2) is never resurrected, and the
    // touched entry degrades its dead count (degrade, never lie)
    assert(t.update(spark, col("id") === 1L,
      Map("data" -> lit("z")), Some(3000L)).isDefined)
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap == Map(1L -> "z", 3L -> "c"))
    assert(t.pendingDeletes.nonEmpty, "entry must survive (conservative)")
    assert(t.pendingDeletedCount.isEmpty, "touched entry must degrade")
    assert(t.read(spark).count() == 2L, "count falls back to scan, stays right")

    // CoW delete composes the same way
    assert(t.delete(spark, col("id") === 3L, Some(4000L)).isDefined)
    assert(t.read(spark).collect().map(_.getLong(0)).toSeq == Seq(1L))

    // merge upsert: the dead key may be re-inserted (new file isn't
    // covered by the old predicate) and the old copy stays dead
    t.merge(spark, mkDf(2L -> "back"), "id", Some(5000L))
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap == Map(1L -> "z", 2L -> "back"))
    // compaction clears the degraded entries
    t.compact(spark, Long.MaxValue, Some(6000L))
    assert(t.pendingDeletes.isEmpty)
    assert(t.read(spark).count() == 2L)
  }

  test("SQL path applies pending deletes; count(*) stays metadata-exact") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "drop", 3L -> "c"), Some(1000L))
    t.deleteDeferred(spark, col("data") === "drop", Some(2000L))

    GraftCatalog.injectRule(spark)
    GraftRelation.dataFrame(spark, t).createOrReplaceTempView("mor_t")
    val viaSql = spark.sql("SELECT id FROM mor_t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == Seq(1L, 3L), s"SQL path saw $viaSql")
    // the entry carries its commit-time exact dead count, so count(*)
    // subtracts it from the manifest total WITHOUT scanning
    assert(t.pendingDeletedCount.contains(1L), t.pendingDeletedCount)
    val cq = spark.sql("SELECT count(*) AS n FROM mor_t")
    assert(cq.head().getLong(0) == 2L)
    assert(!cq.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "exact pending count should keep count(*) metadata-only")
    // stacked entry counted against the survivors of the first: only the
    // still-visible id=3 dies, not the already-dead id=2
    t.deleteDeferred(spark, col("id") >= 2L, Some(3000L))
    assert(t.pendingDeletedCount.contains(2L), t.pendingDeletedCount)
    assert(spark.sql("SELECT count(*) FROM mor_t").head().getLong(0) == 1L)
    // an entry committed WITHOUT the count degrades to the scan fallback
    // — still correct, no longer metadata-only
    t.deleteDeferred(spark, col("id") === 1L, Some(4000L),
      exactCount = false)
    assert(t.pendingDeletedCount.isEmpty)
    val cq2 = spark.sql("SELECT count(*) AS n FROM mor_t")
    assert(cq2.head().getLong(0) == 0L)
    assert(cq2.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "unknown dead count must fall back to a real scan")
    // snapshot-pinned SQL time travel still sees the old rows
    val tt = spark.sql("SELECT id FROM mor_t WHERE snapshot__id = 1 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(tt == Seq(1L, 2L, 3L))
  }

  test("rollback across a deferred delete adopts the target's pending set") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.deleteDeferred(spark, col("id") === 2L, Some(2000L))
    assert(ids(t) == Seq(1L))
    // roll back to BEFORE the delete: pending clears, the row returns
    t.rollbackTo(1L, Some(3000L))
    assert(t.pendingDeletes.isEmpty)
    assert(ids(t) == Seq(1L, 2L))
    // roll forward to the delete snapshot again: pending returns
    t.rollbackTo(2L, Some(4000L))
    assert(t.pendingDeletes.size == 1)
    assert(ids(t) == Seq(1L))
  }

  test("partitioned table: deferred delete composes with partition pruning") {
    val dir = tmp()
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cat", StringType, nullable = true)))
    val t = GraftTable.create(s"$dir/t", s2, partitionBy = Seq("cat"))
    val rdd = spark.sparkContext.parallelize(
      Seq(Row(1L, "a"), Row(2L, "a"), Row(3L, "b")), 1)
    t.append(spark.createDataFrame(rdd, s2), Some(1000L))
    t.deleteDeferred(spark, col("id") === 2L, Some(2000L))

    assert(t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // partition-pruned scan still applies the predicate
    val a = t.scan(spark, Some(col("cat") === "a"))
    assert(a.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("null predicate evaluations keep rows (added-column semantics)") {
    val dir = tmp()
    val t0 = GraftTable.create(s"$dir/t", schema)
    t0.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    val t = t0.addColumn("score", DoubleType)
    val rdd = spark.sparkContext.parallelize(
      Seq(Row(3L, "c", 9.0), Row(4L, "d", 1.0)), 1)
    t.append(spark.createDataFrame(rdd, t.schema), Some(2000L))
    // score IS NULL for pre-evolution rows → predicate NULL → row kept
    t.deleteDeferred(spark, col("score") > 5.0, Some(3000L))
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 4L))
  }
}
