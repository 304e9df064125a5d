package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** EQUALITY merge-on-read deletes (Iceberg v2 equality-delete files):
  * O(keys) commits with no candidate scan, snapshot-scoped key
  * anti-joins at read, materialization through compaction, exact CDC
  * retractions, and the conservative refusals shared with the other
  * merge-on-read forms.
  */
class EqualityDeleteSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-eqdel").toString

  private def ids(t: GraftTable, snap: Option[Long] = None): Seq[Long] =
    t.read(spark, snap).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def listSeq[A](st: java.util.stream.Stream[A]): Seq[A] =
    try {
      val b = Seq.newBuilder[A]
      st.iterator().forEachRemaining(x => b += x)
      b.result()
    } finally st.close()

  private def dataFiles(dir: String): Set[String] = {
    val p = java.nio.file.Paths.get(s"$dir/data")
    if (!java.nio.file.Files.exists(p)) return Set.empty
    listSeq(java.nio.file.Files.walk(p))
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
  }

  test("O(keys) commit: no data I/O, reads hide keys, scoping + TT hold") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    val before = dataFiles(s"$dir/t")

    val snap = t.deleteEquality(spark, mkDf(2L -> "x", 9L -> "y").select("id"),
      Seq("id"), Some(2000L))
    assert(snap.get.summary("equality") == "true")
    assert(snap.get.summary("equality-key-rows") == "2")
    assert(dataFiles(s"$dir/t") == before, "an equality delete touched data files")

    assert(ids(t) == Seq(1L, 3L))
    assert(ids(t, Some(1L)) == Seq(1L, 2L, 3L), "time travel lost the row")
    // scoping: the SAME key appended after the delete lives
    t.append(mkDf(2L -> "reborn"), Some(3000L))
    assert(ids(t) == Seq(1L, 2L, 3L), "equality delete leaked onto a later append")
    // empty and all-null key sets are no-ops
    val n0 = t.log.snapshots.size
    assert(t.deleteEquality(spark, mkDf().select("id"), Seq("id")).isEmpty)
    assert(t.log.snapshots.size == n0)
  }

  test("null keys never match; multi-column keys; stacking") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> null, 3L -> "x"), Some(1000L))
    // (id, data) composite keys: the null-data row cannot be matched
    t.deleteEquality(spark, mkDf(1L -> "x", 2L -> null),
      Seq("id", "data"), Some(2000L))
    assert(ids(t) == Seq(2L, 3L), "a null key tuple matched a row")
    // stacked second commit CONSOLIDATES: one entry, depth 2
    t.deleteEquality(spark, mkDf(3L -> "x"), Seq("id", "data"), Some(3000L))
    assert(ids(t) == Seq(2L))
    assert(t.equalityDeletes.size == 1, "stacked commits did not consolidate")
    assert(t.equalityDeletes.head.covs.size == 2)
    assert(t.read(spark).count() == 1L)
  }

  test("compaction materializes; expiration reclaims key files; CDC is exact") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L)) // snap 1
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"),
      Seq("id"), Some(2000L))                                    // snap 2
    t.append(mkDf(2L -> "B", 4L -> "d"), Some(3000L))            // snap 3
    t.deleteEquality(spark, mkDf(4L -> "x", 1L -> "y").select("id"),
      Seq("id"), Some(4000L))                                    // snap 4

    // CDC fold reproduces the final state; the snap-2 retraction is only
    // the OLD copy of id=2, the snap-4 one hits id=1 (snap-1 era) and
    // id=4 (snap-3 era) but NOT the reborn id=2
    val cdc = t.changesCdc(spark, fromSnapshotId = 1L)
      .select("id", "data", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    var state = scala.collection.mutable.Map((1L, "a") -> 1, (2L, "b") -> 1, (3L, "c") -> 1)
    cdc.foreach { case (id, d, tpe) =>
      val k = (id, d)
      if (tpe == "delete") {
        assert(state.getOrElse(k, 0) > 0, s"retraction of absent row $k")
        state(k) = state(k) - 1
      } else state(k) = state.getOrElse(k, 0) + 1
    }
    val folded = state.filter(_._2 > 0).keys.toSeq.sorted
    val expect = t.read(spark).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(folded == expect, s"CDC fold diverged: $folded vs $expect")
    assert(expect.map(_._1) == Seq(2L, 3L))

    val delDir = java.nio.file.Paths.get(s"$dir/t/deletes")
    assert(listSeq(java.nio.file.Files.list(delDir)).nonEmpty)
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(5000L))
    assert(t.equalityDeletes.isEmpty, "compaction left equality entries")
    assert(ids(t) == Seq(2L, 3L))
    t.expireSnapshots(olderThanMillis = Long.MaxValue, retainLast = 1)
    assert(listSeq(java.nio.file.Files.list(delDir)).isEmpty,
      "expire left orphan equality key files")
    assert(ids(t) == Seq(2L, 3L))
  }

  test("mergeEquality: O(source) upsert — appended rows + key tombstone in one commit") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t.append(mkDf(2L -> "b2"), Some(2000L)) // a second live copy of key 2
    val before = dataFiles(s"$dir/t")

    val snap = t.mergeEquality(spark, mkDf(2L -> "B", 4L -> "d"), Seq("id"), Some(3000L))
    assert(snap.get.operation == "merge")
    assert(snap.get.summary("equality") == "true")
    // no pre-existing file touched: exactly the batch was written
    val after = dataFiles(s"$dir/t")
    assert(before.subsetOf(after) && after.size > before.size)

    val rows = t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "d"),
      "upsert missed an old copy or lost a row")
    assert(t.read(spark).count() == 4L)
    // time travel: both old copies of key 2 visible at snapshot 2
    assert(t.read(spark, Some(2L)).filter(col("id") === 2).count() == 2L)

    // stacked upsert supersedes the superseding row
    t.mergeEquality(spark, mkDf(4L -> "D2"), Seq("id"), Some(4000L))
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D2"))
    // empty source: no commit
    val n0 = t.log.snapshots.size
    assert(t.mergeEquality(spark, mkDf(), Seq("id"), Some(5000L)).isEmpty)
    assert(t.log.snapshots.size == n0)

    // CDC fold across the upserts reproduces state
    val cdc = t.changesCdc(spark, fromSnapshotId = 2L)
      .select("id", "data", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    var state = scala.collection.mutable.Map(
      (1L, "a") -> 1, (2L, "b") -> 1, (2L, "b2") -> 1, (3L, "c") -> 1)
    cdc.foreach { case (id, d, tpe) =>
      val k = (id, d)
      if (tpe == "delete") {
        assert(state.getOrElse(k, 0) > 0, s"retraction of absent row $k")
        state(k) = state(k) - 1
      } else state(k) = state.getOrElse(k, 0) + 1
    }
    assert(state.filter(_._2 > 0).keys.toSeq.sorted ==
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D2")), "CDC fold diverged")

    // compaction materializes; reads unchanged
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))
    assert(t.equalityDeletes.isEmpty)
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      == Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D2"))
  }

  test("refusals: deferred stacking, branch; countWhere serves; key-type mismatch") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"), Some(2000L))
    // every form COMPOSES now (MorCompositionSpec covers the matrix):
    // deferred stacks on equality, dead counted over eq-visible rows
    // (on a SECOND table so this test's counts stay independent);
    // only branching still refuses while entries pend
    val tc = GraftTable.create(s"$dir/tc", schema)
    tc.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    tc.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"), Some(2000L))
    tc.deleteDeferred(spark, col("id") === 2, Some(3000L))
    assert(tc.pendingDeletedCount.contains(1L))
    assert(tc.equalityDeletedCount.contains(1L))
    assert(tc.read(spark).count() == 0L)
    intercept[IllegalArgumentException] { t.createBranch("audit") }
    // countWhere serves through the visible-row scan (covered files
    // demote off the metadata fast path)
    assert(t.countWhere(spark, col("id") === 1) == 0L)
    assert(t.countWhere(spark, col("id") === 2) == 1L)
    assert(t.read(spark).count() == 1L)
    // key-type mismatch refuses before writing anything
    intercept[IllegalArgumentException] {
      t.deleteEquality(spark,
        mkDf(2L -> "x").select(col("id").cast("int").as("id")), Seq("id"))
    }
    // rollback adopts the entries
    t.append(mkDf(9L -> "z"), Some(3000L))
    t.rollbackTo(2L, Some(4000L))
    assert(t.equalityDeletes.size == 1, "rollback dropped equality entries")
    assert(ids(t) == Seq(2L))
  }

  test("commit-time consolidation: one artifact, one anti-join, scoping intact") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L))
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"), Some(2000L))
    // the SAME key re-inserted: the old tombstone must not reach it
    t.append(mkDf(1L -> "reborn"), Some(3000L))
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"), Seq("id"), Some(4000L))
    t.deleteEquality(spark, mkDf(3L -> "x").select("id"), Seq("id"), Some(5000L))
    // 3-deep stacking → ONE consolidated entry, ONE key parquet set,
    // depth 3, dead counts summed exactly
    assert(t.equalityDeletes.size == 1)
    val e = t.equalityDeletes.head
    assert(e.covs.size == 3, s"covs=${e.covs}")
    assert(t.equalityDeletedCount.contains(3L), t.equalityDeletedCount)
    // per-row scoping: key 1's tombstone (covered snap 1) must not hide
    // the snap-3 re-insert; keys 2/3 (covered ≥ 3) must hide originals
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap == Map(1L -> "reborn", 4L -> "d"))
    // read plan: exactly ONE anti-join per covered file group, not one
    // per folded commit. The fixture has two groups (snap-1 file: all 3
    // covs apply; snap-3 file: covs {3,4} apply) → 2 anti-joins, where
    // unconsolidated stacking would pay 3 + 2 = 5
    val plan = t.read(spark).queryExecution.executedPlan.toString
    val antiJoins = "LeftAnti".r.findAllIn(plan).length
    assert(antiJoins == 2, s"expected 2 anti-joins (one per group), got " +
      s"$antiJoins in:\n$plan")
    // time travel through the consolidated representation
    assert(ids(t, Some(3L)) == Seq(1L, 2L, 3L, 4L))
    // compaction still materializes
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))
    assert(t.equalityDeletes.isEmpty)
    assert(t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap == Map(1L -> "reborn", 4L -> "d"))
  }

  test("exact metadata-only count(*) while equality entries pend") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L))
    // delete 2 keys; entry records dead = 2 at commit
    t.deleteEquality(spark, mkDf(2L -> "x", 3L -> "x").select("id"),
      Seq("id"), Some(2000L))
    assert(t.equalityDeletedCount.contains(2L), t.equalityDeletedCount)
    // same-key re-delete stacks but kills nothing NEW (already dead under
    // the prior entry) — and a missing key kills nothing either
    t.deleteEquality(spark, mkDf(3L -> "x", 99L -> "x").select("id"),
      Seq("id"), Some(3000L))
    assert(t.equalityDeletedCount.contains(2L), t.equalityDeletedCount)
    // upsert: replaces id=4 (1 dead) and appends id=7; total stays exact
    t.mergeEquality(spark, mkDf(4L -> "D", 7L -> "new"), Seq("id"),
      Some(4000L))
    assert(t.equalityDeletedCount.contains(3L), t.equalityDeletedCount)

    GraftCatalog.injectRule(spark)
    GraftRelation.dataFrame(spark, t).createOrReplaceTempView("eq_cnt_t")
    // visible = {1→a, 4→D, 7→new}: 6 manifest records − 3 dead
    val cq = spark.sql("SELECT count(*) AS n FROM eq_cnt_t")
    assert(cq.head().getLong(0) == 3L)
    assert(cq.head().getLong(0) == t.read(spark).count(),
      "metadata count disagrees with the scan")
    assert(!cq.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "exact equality counts should keep count(*) metadata-only")

    // an entry committed without the count degrades count(*) to a scan
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"),
      Some(5000L), exactCount = false)
    assert(t.equalityDeletedCount.isEmpty)
    val cq2 = spark.sql("SELECT count(*) AS n FROM eq_cnt_t")
    assert(cq2.head().getLong(0) == 2L)
    assert(cq2.queryExecution.executedPlan.toString.contains("Scan parquet"),
      "unknown equality dead count must fall back to a real scan")
  }
}
