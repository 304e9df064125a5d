package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** `cherrypick` (Iceberg's cherrypick_snapshot) + the snapshot-pointer
  * procedures: re-apply the files an append snapshot added onto the
  * current state — the WAP recovery move after a rollback discarded a
  * good batch — plus `set_current_snapshot` (forward rollback) and
  * `ancestors_of` (the parent chain). Row-id bands carry with the
  * cherry-picked entries, so restored rows serve the SAME `_row_id`s
  * the discarded history served. */
class CherrypickSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cherry").toString

  private def ids(t: GraftTable): Set[Long] =
    t.read(spark).select("id").collect().map(_.getLong(0)).toSet

  private def rowIds(t: GraftTable): Map[Long, Long] =
    t.readLineage(spark).collect().map(r =>
      r.getLong(0) -> r.getLong(2)).toMap

  test("rollback discards a batch; cherrypick re-applies it with stable row ids") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L)) // snap 1
    t.append(mkDf(3L -> "c", 4L -> "d"), Some(2000L)) // snap 2 (the batch)
    val before = rowIds(t)
    t.rollbackTo(1L, Some(3000L))                     // snap 3: batch gone
    assert(ids(t) == Set(1L, 2L))
    val snap = t.cherrypick(2L, Some(4000L))          // snap 4: batch back
    assert(snap.operation == "cherrypick" &&
      snap.summary("cherrypicked-from") == "2")
    assert(ids(t) == Set(1L, 2L, 3L, 4L))
    // the restored rows serve the SAME _row_id values as before the
    // rollback (bands carried with the entries, watermark monotone)
    assert(rowIds(t) == before, s"row ids drifted: ${rowIds(t)} vs $before")
    // history intact: the discarded head and the rollback both remain
    assert(t.log.snapshots.map(_.snapshotId).toSeq == Seq(1L, 2L, 3L, 4L))
    // time travel still sees each era exactly
    assert(t.read(spark, Some(3L)).count() == 2L)
  }

  test("cherrypick refusals: non-append, already-present, pending MoR state") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))  // snap 1
    t.append(mkDf(3L -> "c"), Some(2000L))             // snap 2
    t.delete(spark, col("id") === 1L, Some(3000L))     // snap 3 (delete)
    // non-append snapshot refuses
    val e1 = intercept[IllegalArgumentException] { t.cherrypick(3L) }
    assert(e1.getMessage.contains("append snapshots only"), e1.getMessage)
    // files already in the current manifest refuse (snap 2 never left)
    val e2 = intercept[IllegalArgumentException] { t.cherrypick(2L) }
    assert(e2.getMessage.contains("already in the current manifest"),
      e2.getMessage)
    // pending merge-on-read state refuses (covered-snap scoping would
    // retroactively apply entries to the re-added file's rows)
    t.rollbackTo(1L, Some(4000L))
    t.deleteDeferred(spark, col("id") === 2L, Some(5000L))
    val e3 = intercept[IllegalArgumentException] { t.cherrypick(2L) }
    assert(e3.getMessage.contains("merge-on-read"), e3.getMessage)
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))
    // after compaction the pick lands
    assert(t.cherrypick(2L, Some(7000L)).operation == "cherrypick")
    assert(ids(t) == Set(1L, 3L))
  }

  test("cherrypick of an expired-parent or reclaimed-file snapshot refuses loudly") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.rollbackTo(1L, Some(3000L))
    // expire the picked snapshot's data file (no surviving manifest
    // references it after the rollback + expire of snap 2)
    t.expireSnapshots(2500L, retainLast = 1)
    val e = intercept[Exception] { t.cherrypick(2L) }
    assert(e.getMessage.contains("no snapshot 2") ||
      e.getMessage.contains("expired") ||
      e.getMessage.contains("parent"), e.getMessage)
  }

  test("CALL cherrypick_snapshot / set_current_snapshot / ancestors_of") {
    val wh = tmpDir("graft-cherry-wh")
    spark.conf.set("spark.sql.catalog.gcp", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gcp.warehouse", wh)
    val t = GraftTable.create(s"$wh/db/t", schema)
    t.append(mkDf(1L -> "a"), Some(1000L))  // snap 1
    t.append(mkDf(2L -> "b"), Some(2000L))  // snap 2
    // set_current_snapshot BACK...
    val back = spark.sql(
      "CALL gcp.system.set_current_snapshot('db.t', 1)").collect()
    assert(back.head.getLong(0) == 2L && back.head.getLong(1) == 3L)
    assert(ids(GraftTable.load(s"$wh/db/t")) == Set(1L))
    // ...and FORWARD again (undo the rollback by re-selecting the head)
    spark.sql("CALL gcp.system.set_current_snapshot('db.t', 2)").collect()
    assert(ids(GraftTable.load(s"$wh/db/t")) == Set(1L, 2L))
    // a WAP recovery through CALL: roll back, cherry-pick the batch
    spark.sql("CALL gcp.system.rollback_to_snapshot('db.t', 1)").collect()
    val cp = spark.sql(
      "CALL gcp.system.cherrypick_snapshot('db.t', 2)").collect()
    assert(cp.head.getLong(0) == 2L && cp.head.getLong(2) == 1L,
      cp.mkString(","))
    assert(ids(GraftTable.load(s"$wh/db/t")) == Set(1L, 2L))
    // ancestors_of walks the parent chain newest-first
    val chain = spark.sql("CALL gcp.system.ancestors_of('db.t')").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(chain.map(_._1) == Seq(6L, 5L, 4L, 3L, 2L, 1L), chain)
    assert(chain.head._2 == "cherrypick" && chain.last._2 == "append")
    // scoped to an explicit start
    val part = spark.sql(
      "CALL gcp.system.ancestors_of('db.t', snapshot_id => 2)").collect()
    assert(part.map(_.getLong(0)).toSeq == Seq(2L, 1L))
  }
}
