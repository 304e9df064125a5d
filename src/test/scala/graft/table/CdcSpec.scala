package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Net-change CDC (`changesCdc`): the defining property is RECONSTRUCTION —
  * folding each snapshot's (deletes, inserts) multisets over the `from`
  * state must reproduce the `to` state exactly, across every op kind.
  */
class CdcSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc").toString

  private def state(t: GraftTable, snap: Long): DataFrame =
    t.read(spark, Some(snap)).drop("snapshot__id")

  /** Multiset equality via exceptAll both ways. */
  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$hint: a=${a.collect().toSeq} b=${b.collect().toSeq}")
  }

  /** Reconstruct: from-state minus deletes plus inserts, applied
    * PER SNAPSHOT in commit order. */
  private def reconstruct(t: GraftTable, from: Long, to: Long): DataFrame = {
    val cdc = t.changesCdc(spark, from, Some(to))
    val snaps = cdc.select("snapshot__id").distinct()
      .collect().map(_.getLong(0)).sorted
    snaps.foldLeft(state(t, from)) { (st, sn) =>
      val d = cdc.filter(col("snapshot__id") === sn)
      val dels = d.filter(col("_change_type") === "delete")
        .drop("_change_type", "snapshot__id")
      val ins = d.filter(col("_change_type") === "insert")
        .drop("_change_type", "snapshot__id")
      st.exceptAll(dels).unionByName(ins)
    }
  }

  test("reconstruction across append / CoW delete / update / merge / compact") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))   // 1
    t.append(mkDf(4L -> "d", 5L -> "e"), Some(2000L))              // 2
    t.delete(spark, col("id") === 2L, Some(3000L))                 // 3 CoW
    t.update(spark, col("id") === 3L, Map("data" -> lit("c2")), Some(4000L)) // 4
    t.merge(spark, mkDf(5L -> "e2", 6L -> "f"), "id", Some(5000L)) // 5
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L)) // 6
    t.overwriteWhere(spark, col("id") >= 5L,
      mkDf(8L -> "h"), Some(7000L))                                // 7 slice
    t.overwrite(mkDf(9L -> "i", 10L -> "j"), Some(8000L))          // 8 full

    val toSnap = t.log.current.get.snapshotId
    assertSameRows(reconstruct(t, 1L, toSnap), state(t, toSnap), "fold 1->head")
    // from mid-chain too
    assertSameRows(reconstruct(t, 3L, toSnap), state(t, toSnap), "fold 3->head")
    assertSameRows(reconstruct(t, 6L, toSnap), state(t, toSnap), "fold 6->head")

    // per-op attribution: the CoW delete emitted exactly row 2 as delete
    val d3 = t.changesCdc(spark, 2L, Some(3L))
    assert(d3.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(d3.filter(col("_change_type") === "insert").count() == 0)
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("incremental aggregate maintenance across a mixed DML chain " +
      "equals a full recompute") {
    // the v22_graft_ivm contract generalized: a grouped (count, sum)
    // view maintained ONLY from per-snapshot CDC deltas must equal the
    // from-scratch aggregate at head, through append / CoW delete /
    // update / merge / compact — updates appear as delete+insert pairs,
    // so the fold needs no special casing, and compaction must
    // contribute nothing.
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> "y", 3L -> "x", 4L -> "y"), Some(1000L)) // 1
    t.append(mkDf(5L -> "x", 6L -> "z"), Some(2000L))                       // 2
    t.delete(spark, col("id") === 3L, Some(3000L))                          // 3
    t.update(spark, col("id") === 2L, Map("data" -> lit("z")), Some(4000L)) // 4
    t.merge(spark, mkDf(6L -> "x", 7L -> "y"), "id", Some(5000L))           // 5
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(6000L))         // 6
    val head = t.log.current.get.snapshotId

    def viewOf(df: DataFrame) = df.groupBy(col("data"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))

    val base = viewOf(state(t, 1L))
    val delta = t.changesCdc(spark, 1L, Some(head))
      .groupBy(col("data"))
      .agg(
        sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
          .as("dn"),
        sum(when(col("_change_type") === "insert", col("id"))
          .otherwise(-col("id"))).as("dsum"))
    val maintained = base.join(delta, Seq("data"), "full")
      .select(col("data"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("id_sum"), lit(0L)) + coalesce(col("dsum"), lit(0L)))
          .as("id_sum"))
      .filter(col("n") > 0)

    assertSameRows(maintained, viewOf(state(t, head)), "maintained vs recompute")
    // the "z" group is born entirely from deltas (the update moved row 2
    // into it after the base was built); "x" both loses a member (CoW
    // delete of 3) and gains two (append 5, merge retag of 6) — final
    // x = {1,5,6}, z = {2}
    val byKey = maintained.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKey("z") == (1L -> 2L), s"z group: ${byKey("z")}")
    assert(byKey("x") == (3L -> 12L), s"x group: ${byKey("x")}")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("deferred delete emits exactly the covered surviving matches") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> "x", 3L -> "y"), Some(1000L))   // 1
    t.deleteDeferred(spark, col("data") === "x", Some(2000L))      // 2
    t.append(mkDf(4L -> "x"), Some(3000L))                         // 3: NOT covered
    // exactCount = false: with the default commit-time count this entry
    // would be skipped as a provable no-op (its only match is already
    // dead) — force it so the CDC fold must net it to zero
    t.deleteDeferred(spark, col("id") === 1L, Some(4000L),
      exactCount = false)                                          // 4: 1 already gone

    val d2 = t.changesCdc(spark, 1L, Some(2L))
    assert(d2.filter(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // snapshot 4's predicate matches id=1, but that row was already
    // deleted by snapshot 2 — NET change must be empty, not a re-delete
    val d4 = t.changesCdc(spark, 3L, Some(4L))
    assert(d4.count() == 0,
      s"re-deleted an already-deleted row: ${d4.collect().toSeq}")

    val toSnap = t.log.current.get.snapshotId
    assertSameRows(reconstruct(t, 1L, toSnap), state(t, toSnap), "deferred fold")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("compaction that materializes deferred deletes is net-zero") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "drop"), Some(1000L))
    t.append(mkDf(3L -> "drop", 4L -> "d"), Some(2000L))
    t.deleteDeferred(spark, col("data") === "drop", Some(3000L))
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    val d = t.changesCdc(spark, 3L, Some(4L))
    assert(d.count() == 0, s"replace emitted rows: ${d.collect().toSeq}")
    val toSnap = t.log.current.get.snapshotId
    assertSameRows(reconstruct(t, 1L, toSnap), state(t, toSnap), "compact fold")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("rollback in the chain throws; outside the chain is fine") {
    val dir = tmp()
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "a"), Some(1000L))    // 1
    t.append(mkDf(2L -> "b"), Some(2000L))    // 2
    t.rollbackTo(1L, Some(3000L))             // 3
    t.append(mkDf(3L -> "c"), Some(4000L))    // 4
    intercept[IllegalStateException] { t.changesCdc(spark, 1L).collect() }
    // a window that starts after the rollback is incremental again
    val d = t.changesCdc(spark, 3L, Some(4L))
    assert(d.select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
