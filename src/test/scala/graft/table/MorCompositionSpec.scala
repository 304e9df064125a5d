package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** CROSS-FORM merge-on-read composition: positional (deletion-vector)
  * and equality delete entries stacking on ONE table — the pipeline
  * shape where a CDC equality-upsert mirror and a positional curation
  * job share a corpus table without a compact() between them. The
  * invariants under test:
  *
  *  - reads subtract both forms (in either stacking order), time travel
  *    sees through both;
  *  - victim computations always run against FULLY VISIBLE rows, so the
  *    two forms' dead sets stay DISJOINT and
  *    `totalRecords − dv − equality` stays exact;
  *  - an equality-dead row is never re-recorded in a vector, never
  *    resurrected by a positional update, and never re-retracted by CDC;
  *  - the whole-file drop fast path demotes to a vector rewrite while
  *    equality entries pend (counts would otherwise double);
  *  - CDC reconstruction across composed commits reproduces the state;
  *  - rollback adopts BOTH kinds of entries; expire keeps both kinds of
  *    artifacts while referenced and reclaims them after;
  *  - compact() materializes both in one pass.
  */
class MorCompositionSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-morcomp").toString

  private def ids(t: GraftTable, snap: Option[Long] = None): Seq[Long] =
    t.read(spark, snap).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def rows(t: GraftTable): Map[Long, String] =
    t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** The exact-count identity that must hold while forms stack. */
  private def assertExactCounts(t: GraftTable, hint: String): Unit = {
    val total = t.log.current
      .map(s => Manifest.read(s"${t.dir}/${s.manifestList}").totalRecords)
      .getOrElse(0L)
    val eq = t.equalityDeletedCount
    assert(eq.isDefined, s"$hint: equality dead count degraded")
    assert(total - t.positionalDeletedCount - eq.get == t.read(spark).count(),
      s"$hint: metadata count (total=$total dv=${t.positionalDeletedCount} " +
        s"eq=${eq.get}) != scan")
  }

  private def artifacts(dir: String, suffix: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$dir/deletes")
    if (!java.nio.file.Files.exists(p)) return Nil
    val st = java.nio.file.Files.walk(p)
    try {
      val b = Seq.newBuilder[String]
      st.iterator().forEachRemaining(x =>
        if (x.toString.endsWith(suffix)) b += x.toString)
      b.result()
    } finally st.close()
  }

  test("equality upsert stacks on a DV-pending table; counts stay exact") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L))
    // curation job lands first: DV kills id=2
    t.deletePositional(spark, col("id") === 2L, Some(2000L))
    assert(t.positionalDeletes.nonEmpty)
    assertExactCounts(t, "after positional")
    // CDC mirror upserts id=3 and inserts id=5 — stacks, no compact()
    val snap = t.mergeEquality(spark,
      mkDf(3L -> "C2", 5L -> "e"), Seq("id"), Some(3000L))
    assert(snap.isDefined)
    assert(t.positionalDeletes.nonEmpty && t.equalityDeletes.nonEmpty,
      "both forms must pend together")
    assert(rows(t) == Map(1L -> "a", 3L -> "C2", 4L -> "d", 5L -> "e"))
    assertExactCounts(t, "after stacked upsert")
    // time travel sees through both
    assert(ids(t, Some(1L)) == Seq(1L, 2L, 3L, 4L))
    assert(ids(t, Some(2L)) == Seq(1L, 3L, 4L))
    // another positional pass on the stacked table: kills the UPSERTED
    // row's new copy (a post-entry file, outside every tombstone's scope)
    t.deletePositional(spark, col("id") === 5L, Some(4000L))
    assert(rows(t) == Map(1L -> "a", 3L -> "C2", 4L -> "d"))
    assertExactCounts(t, "after second positional")
    // compact materializes everything in one pass
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(5000L))
    assert(t.positionalDeletes.isEmpty && t.equalityDeletes.isEmpty)
    assert(rows(t) == Map(1L -> "a", 3L -> "C2", 4L -> "d"))
  }

  test("equality-dead rows are never re-vectored, resurrected, or double-counted") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    // equality kills id=2 first
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"), Seq("id"), Some(2000L))
    assert(t.equalityDeletedCount.contains(1L))
    // positional predicate covers ids {1,2}: only the VISIBLE id=1 may
    // be vectored — id=2 is already equality-dead
    t.deletePositional(spark, col("id") <= 2L, Some(3000L))
    assert(t.positionalDeletedCount == 1L,
      s"equality-dead row re-vectored: dv=${t.positionalDeletedCount}")
    assert(ids(t) == Seq(3L))
    assertExactCounts(t, "after composed delete")
    // positional update matching id=2 must NOT resurrect it
    val up = t.updatePositional(spark, col("id") === 2L,
      Map("data" -> lit("zombie")), Some(4000L))
    assert(up.isEmpty, "updatePositional resurrected an equality-dead row")
    assert(ids(t) == Seq(3L))
  }

  test("whole-file drop demotes to a vector rewrite while equality entries pend") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L)) // one file
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"), Some(2000L))
    // predicate provably matches ALL rows of the file — without the
    // demotion this would drop the file and count id=1 twice
    val before = t.log.current.map(s =>
      Manifest.read(s"${t.dir}/${s.manifestList}").files.map(_.path).toSet).get
    t.deletePositional(spark, col("id") <= 2L, Some(3000L))
    val after = t.log.current.map(s =>
      Manifest.read(s"${t.dir}/${s.manifestList}").files.map(_.path).toSet).get
    assert(after == before, "a file was dropped despite pending equality")
    assert(t.positionalDeletedCount == 1L, "only the visible row is vectored")
    assert(ids(t).isEmpty)
    assertExactCounts(t, "after demoted drop")
  }

  test("drop demotion is SCOPED: files beyond every tombstone's reach still drop metadata-only") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a"), Some(1000L)) // file A (snap 1)
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"),
      Some(2000L)) // covers snap ≤ 1
    t.append(mkDf(50L -> "z", 51L -> "z"), Some(3000L)) // file B (snap 3)
    // predicate provably matches ALL of file B; B postdates every
    // covered snapshot, so no tombstone can reach it — the metadata-only
    // drop must survive the equality pendency (no scan, no vector)
    val nDvBefore = t.positionalDeletedCount
    t.deletePositional(spark, col("id") >= 50L, Some(4000L))
    assert(t.positionalDeletedCount == nDvBefore,
      "a non-coverable whole-file drop was demoted to a vector rewrite")
    val files = Manifest.read(
      s"${t.dir}/${t.log.current.get.manifestList}").files.map(_.path)
    assert(files.size == 1, s"file B not dropped: $files")
    assert(ids(t).isEmpty) // id=1 equality-dead, file B dropped
    assertExactCounts(t, "after scoped drop")
  }

  test("new equality entries count dead against DV-visible rows only") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t.deletePositional(spark, col("id") === 1L, Some(2000L))
    // keys cover {1,2}: id=1 is DV-dead, so the entry's dead count is 1
    t.deleteEquality(spark, mkDf(1L -> "x", 2L -> "x").select("id"),
      Seq("id"), Some(3000L))
    assert(t.equalityDeletedCount.contains(1L),
      s"DV-dead row double-counted: ${t.equalityDeletedCount}")
    assert(ids(t) == Seq(3L))
    assertExactCounts(t, "after eq-on-dv")
  }

  test("copy-on-write DML composes with pending equality entries") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L))
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"), Seq("id"), Some(2000L))
    assert(t.equalityDeletedCount.contains(1L))
    // CoW UPDATE on the eq-pending table: the rewrite must NOT
    // resurrect the equality-dead id=2, and touched entries degrade
    // their dead counts honestly (the rewrite materialized part of
    // their victims — never lie)
    t.update(spark, col("id") === 3L, Map("data" -> lit("C")), Some(3000L))
    assert(rows(t) == Map(1L -> "a", 3L -> "C", 4L -> "d"))
    assert(t.equalityDeletes.nonEmpty, "update dropped the entries")
    assert(t.equalityDeletedCount.isEmpty,
      "touched entry kept a now-unsplittable dead count")
    // CoW DELETE under the degraded entry: still correct reads
    val snap = t.delete(spark, col("id") === 4L, Some(4000L))
    assert(snap.get.summary("deleted-records") == "1",
      s"removed miscounted: ${snap.get.summary("deleted-records")}")
    assert(rows(t) == Map(1L -> "a", 3L -> "C"))
    // CoW upsert merge on the stacked state
    t.merge(spark, mkDf(1L -> "A2", 7L -> "g"), "id", Some(5000L))
    assert(rows(t) == Map(1L -> "A2", 3L -> "C", 7L -> "g"))
    // the scan-fallback count paths agree while degraded
    assert(t.read(spark).count() == 3L)
    assert(t.countWhere(spark, col("id") >= 1L) == 3L)
    // compaction clears the degraded entries and nothing changes
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))
    assert(t.equalityDeletes.isEmpty)
    assert(rows(t) == Map(1L -> "A2", 3L -> "C", 7L -> "g"))
  }

  test("CoW drop fast path under equality: covered drops demote, counts honest") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "a"), Some(1000L)) // one file, covered
    t.deleteEquality(spark, mkDf(1L -> "x").select("id"), Seq("id"), Some(2000L))
    // predicate provably matches the whole file: the metadata-only drop
    // must demote (dropping would miscount the eq-dead id=1) — and
    // deleted-records reflects VISIBLE rows only (1, not 2)
    val snap = t.delete(spark, col("data") === "a", Some(3000L))
    assert(snap.get.summary("deleted-records") == "1",
      s"eq-dead row double-counted: ${snap.get.summary("deleted-records")}")
    assert(ids(t).isEmpty)
    // a later file no tombstone reaches still drops metadata-only
    t.append(mkDf(50L -> "z"), Some(4000L))
    val s2 = t.delete(spark, col("id") === 50L, Some(5000L))
    assert(s2.get.summary("dropped-data-files") == "1",
      "non-coverable whole-file drop was demoted")
    assert(ids(t).isEmpty)
  }

  test("CDC reconstruction + no double retraction across composed commits") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L)) // 1
    t.deletePositional(spark, col("id") === 1L, Some(2000L))                // 2
    t.mergeEquality(spark, mkDf(2L -> "B", 5L -> "e"), Seq("id"), Some(3000L)) // 3
    t.deletePositional(spark, col("id") === 3L, Some(4000L))                // 4
    t.deleteEquality(spark, mkDf(4L -> "x").select("id"), Seq("id"), Some(5000L)) // 5
    val head = t.log.current.get.snapshotId

    val cdc = t.changesCdc(spark, 1L, Some(head))
    // each victim is retracted EXACTLY once across the whole chain
    val dels = cdc.filter(col("_change_type") === "delete")
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(dels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), dels.toString)
    // reconstruction: from-state − deletes + inserts per snapshot
    val snaps = cdc.select("snapshot__id").distinct()
      .collect().map(_.getLong(0)).sorted
    val reconstructed = snaps.foldLeft(
      t.read(spark, Some(1L)).drop("snapshot__id"): DataFrame) { (st, sn) =>
      val d = cdc.filter(col("snapshot__id") === sn)
      st.exceptAll(d.filter(col("_change_type") === "delete")
          .drop("_change_type", "snapshot__id"))
        .unionByName(d.filter(col("_change_type") === "insert")
          .drop("_change_type", "snapshot__id"))
    }
    val now = t.read(spark).drop("snapshot__id")
    assert(reconstructed.exceptAll(now).isEmpty &&
      now.exceptAll(reconstructed).isEmpty, "CDC reconstruction diverged")
  }

  test("rollback adopts both entry kinds; expire tracks both artifact kinds") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L)) // 1
    t.deletePositional(spark, col("id") === 1L, Some(2000L))     // 2
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"),
      Seq("id"), Some(3000L))                                    // 3
    val composed = t.log.current.get.snapshotId
    t.append(mkDf(9L -> "z"), Some(4000L))                       // 4
    t.rollbackTo(composed, Some(5000L))                          // 5
    assert(t.positionalDeletes.nonEmpty && t.equalityDeletes.nonEmpty,
      "rollback dropped a composed entry kind")
    assert(ids(t) == Seq(3L))
    assertExactCounts(t, "after rollback")
    // both artifact kinds survive expire while the head references them
    assert(artifacts(s"$dir/t", ".bin").nonEmpty)
    assert(artifacts(s"$dir/t", ".parquet").nonEmpty)
    t.expireSnapshots(olderThanMillis = Long.MaxValue, retainLast = 1)
    assert(t.positionalDeletes.nonEmpty && t.equalityDeletes.nonEmpty)
    assert(ids(t) == Seq(3L), "expire changed visible state")
    assert(artifacts(s"$dir/t", ".bin").nonEmpty,
      "expire reclaimed a referenced deletion vector")
    assert(artifacts(s"$dir/t", ".parquet").nonEmpty,
      "expire reclaimed a referenced equality key file")
    // materialize, expire again: every delete artifact is reclaimed
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))
    t.expireSnapshots(olderThanMillis = Long.MaxValue, retainLast = 1)
    assert(artifacts(s"$dir/t", ".bin").isEmpty &&
      artifacts(s"$dir/t", ".parquet").isEmpty,
      "expire left orphan delete artifacts after materialization")
    assert(ids(t) == Seq(3L))
  }

  /** The three-form exact-count identity (predicate entries included). */
  private def assertTriadCounts(t: GraftTable, hint: String): Unit = {
    val total = t.log.current
      .map(s => Manifest.read(s"${t.dir}/${s.manifestList}").totalRecords)
      .getOrElse(0L)
    val eq = t.equalityDeletedCount
    val pd = t.pendingDeletedCount
    assert(eq.isDefined && pd.isDefined, s"$hint: a dead count degraded")
    assert(total - t.positionalDeletedCount - eq.get - pd.get ==
      t.read(spark).count(),
      s"$hint: metadata count (total=$total dv=${t.positionalDeletedCount} " +
        s"eq=${eq.get} pred=${pd.get}) != scan")
  }

  test("full MoR triad stacks on one table: DV + equality + predicate") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e",
      6L -> "f"), Some(1000L))                                      // 1
    t.deletePositional(spark, col("id") === 1L, Some(2000L))        // 2
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"),
      Seq("id"), Some(3000L))                                       // 3
    // predicate stacks on BOTH: its dead count must see only rows the
    // other forms left visible (id=3 matches; 1 and 2 are already dead)
    t.deleteDeferred(spark, col("id") <= 3L, Some(4000L))           // 4
    assert(t.pendingDeletedCount.contains(1L),
      "predicate dead must be counted over DV+equality-visible rows")
    assertTriadCounts(t, "triad pending")
    assert(ids(t) == Seq(4L, 5L, 6L))
    // time travel sees through each era
    assert(ids(t, Some(1L)) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(ids(t, Some(3L)) == Seq(3L, 4L, 5L, 6L))
    // the OTHER stacking direction: equality and positional land ON a
    // predicate-pending table, dead drawn from predicate-visible rows
    t.deleteEquality(spark, mkDf(3L -> "x", 4L -> "x").select("id"),
      Seq("id"), Some(5000L))                                       // 5
    assert(t.equalityDeletedCount.contains(2L),
      "a predicate-dead row (id=3) must not be re-counted by equality")
    t.deletePositional(spark, col("id") <= 5L, Some(6000L))         // 6
    assert(t.positionalDeletedCount == 2L,
      "only id=5 is newly vectorable (1 already dead, 2/3/4 other-form dead)")
    assertTriadCounts(t, "triad stacked deeper")
    assert(ids(t) == Seq(6L))
    // appended rows are untouched by every covered entry
    t.append(mkDf(1L -> "reborn", 3L -> "reborn"), Some(7000L))     // 7
    assert(ids(t) == Seq(1L, 3L, 6L))
    assertTriadCounts(t, "after re-insert")
    // one compact materializes all three forms
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(8000L))
    assert(t.pendingDeletes.isEmpty && t.positionalDeletes.isEmpty &&
      t.equalityDeletes.isEmpty)
    assert(ids(t) == Seq(1L, 3L, 6L))
  }

  test("positional update never resurrects predicate-dead rows") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "low", 2L -> "low", 3L -> "hi"), Some(1000L))
    t.deleteDeferred(spark, col("data") === "low", Some(2000L))
    assert(t.pendingDeletedCount.contains(2L))
    // the update predicate matches dead rows too — only the VISIBLE one
    // may be vectored + rewritten
    t.updatePositional(spark, col("id") <= 3L,
      Map("data" -> lit("upd")), Some(3000L))
    assert(t.positionalDeletedCount == 1L,
      "a predicate-dead row must never be re-vectored by an update")
    assert(rows(t) == Map(3L -> "upd"),
      "a predicate-dead row was resurrected as an updated copy")
    assertTriadCounts(t, "after positional update on predicate-pending")
  }

  test("CoW on a predicate-pending table: covered drops demote, counts degrade honestly") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    // two files: one all-"x" (drop-provable), one mixed
    t.append(mkDf(1L -> "x", 2L -> "x"), Some(1000L))
    t.append(mkDf(3L -> "x", 4L -> "keep"), Some(2000L))
    t.deleteDeferred(spark, col("id") === 1L, Some(3000L))
    assert(t.pendingDeletedCount.contains(1L))
    // CoW delete whose proof would DROP the first file whole — it is
    // covered by the pending predicate, so it must demote to a rewrite
    // (a metadata-only drop would break the count bookkeeping)
    val s = t.delete(spark, col("data") === lit("x"), Some(4000L))
    assert(s.isDefined)
    assert(s.get.summary("dropped-data-files") == "0",
      "covered whole-file drop must demote to a rewrite")
    assert(s.get.summary("deleted-records") == "2",
      "deleted-records must count VISIBLE victims only (ids 2,3 — 1 was dead)")
    assert(rows(t) == Map(4L -> "keep"))
    assert(t.pendingDeletes.nonEmpty && t.pendingDeletedCount.isEmpty,
      "touched predicate entry must degrade its dead count, not vanish")
    assert(t.read(spark).count() == 1L)
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(5000L))
    assert(t.pendingDeletes.isEmpty && rows(t) == Map(4L -> "keep"))
  }

  test("CDC: single retraction per row across all three forms + reconstruction") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L)) // 1
    t.deleteDeferred(spark, col("id") === 1L, Some(2000L))                  // 2
    t.deletePositional(spark, col("id") <= 2L, Some(3000L))                 // 3: only 2
    t.deleteEquality(spark, mkDf(3L -> "x").select("id"), Seq("id"), Some(4000L)) // 4
    // a second predicate over already-dead rows retracts nothing extra
    t.deleteDeferred(spark, col("id") <= 4L, Some(5000L))                   // 5: only 4
    val head = t.log.current.get.snapshotId
    val cdc = t.changesCdc(spark, 1L, Some(head))
    val dels = cdc.filter(col("_change_type") === "delete")
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(dels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"every victim must be retracted exactly once: $dels")
    assert(t.read(spark).count() == 0L)
  }

  test("rollback adopts all three entry kinds") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"), Some(1000L)) // 1
    t.deletePositional(spark, col("id") === 1L, Some(2000L))                // 2
    t.deleteEquality(spark, mkDf(2L -> "x").select("id"), Seq("id"), Some(3000L)) // 3
    t.deleteDeferred(spark, col("id") === 3L, Some(4000L))                  // 4
    val composed = t.log.current.get.snapshotId
    t.append(mkDf(9L -> "z"), Some(5000L))                                  // 5
    t.rollbackTo(composed, Some(6000L))                                     // 6
    assert(t.positionalDeletes.nonEmpty && t.equalityDeletes.nonEmpty &&
      t.pendingDeletes.nonEmpty, "rollback dropped a triad entry kind")
    assert(ids(t) == Seq(4L))
    assertTriadCounts(t, "after triad rollback")
  }
}
