package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** End-to-end table-layer behavior, mirroring the reference's e2e suite:
  * scan+projection (TestInputFormatWithHadoopTables.java:80-101), empty
  * table (TestInputFormatWithEmptyTable.java:61-79), multi-snapshot reads +
  * virtual column (TestInputFormatWithMultipleTasks.java:85-107), time
  * travel + statelessness (TestReadSnapshotTable.java:139-166,
  * TestPredicatePushdown.java:74-112), snapshots system table
  * (TestReadSnapshotTable.java:88-136), virtual-column rename
  * (TestReadSnapshotTable.java:169-193).
  */
class GraftTableSpec extends SparkSpecBase {

  private val simpleSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, simpleSchema)
  }

  test("create + append + full read with virtual snapshot column") {
    val dir = tmpDir("graft-basic")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), committedAt = Some(1000L))

    val out = t.read(spark)
    assert(out.columns.toSeq == Seq("id", "data", "snapshot__id"))
    val rows = out.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
  }

  test("empty table scans as zero rows with full schema (S11)") {
    val dir = tmpDir("graft-empty")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    val out = t.read(spark)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "data", "snapshot__id"))
  }

  test("multi-snapshot: latest sees all rows, each tagged with its scan snapshot") {
    val dir = tmpDir("graft-multi")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.append(mkDf(3L -> "c"), Some(3000L))

    val latest = t.read(spark)
    assert(latest.count() == 3)
    // virtual column = the snapshot the scan ran at (constant), like the
    // reference (all rows read at snapshot N carry N)
    assert(latest.select("snapshot__id").distinct().collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("time travel by explicit snapshot id") {
    val dir = tmpDir("graft-tt")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))

    assert(t.read(spark, snapshotId = Some(1L)).count() == 1)
    assert(t.read(spark, snapshotId = Some(2L)).count() == 2)
    intercept[IllegalArgumentException] {
      t.read(spark, snapshotId = Some(99L)).count()
    }
  }

  test("time travel via snapshot__id = <id> predicate, stateless across queries") {
    val dir = tmpDir("graft-ttpred")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.append(mkDf(3L -> "c"), Some(3000L))

    val atFirst = t.scan(spark, Some(col("snapshot__id") === 1L))
    assert(atFirst.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // the reference regression: a filtered query must not leak its snapshot
    // into the next unfiltered query (TestPredicatePushdown.java:74-112)
    assert(t.read(spark).count() == 3)

    // combined with a data predicate: snapshot pin + residual filter
    val combined = t.scan(spark,
      Some(col("snapshot__id") === 2L && col("id") > 1L))
    assert(combined.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("snapshots system table rows mirror the log (V1)") {
    val dir = tmpDir("graft-snaps")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))

    val snaps = t.snapshots(spark).orderBy("snapshot_id").collect()
    assert(snaps.length == 2)
    assert(snaps(0).getAs[Long]("committed_at") == 1000L)
    assert(snaps(0).getAs[Long]("snapshot_id") == 1L)
    assert(snaps(0).getAs[Any]("parent_id") == null)
    assert(snaps(0).getAs[String]("operation") == "append")
    assert(snaps(1).getAs[Long]("parent_id") == 1L)
    val summary = snaps(1).getAs[Map[String, String]]("summary")
    assert(summary("total-records") == "2")
  }

  test("virtual column rename via table property (V2 rename)") {
    val dir = tmpDir("graft-rename")
    val t = GraftTable.create(s"$dir/t", simpleSchema,
      properties = Map(GraftTable.PropVirtualColumnName -> "version_id"))
    t.append(mkDf(1L -> "a"), Some(1000L))
    val out = t.read(spark)
    assert(out.columns.toSeq == Seq("id", "data", "version_id"))
    // time travel works against the renamed column
    t.append(mkDf(2L -> "b"), Some(2000L))
    val tt = t.scan(spark, Some(col("version_id") === 1L))
    assert(tt.count() == 1)
  }

  test("projection pushdown through scan API") {
    val dir = tmpDir("graft-proj")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    val out = t.scan(spark, filter = None, projection = Seq("data"))
    assert(out.columns.toSeq == Seq("data"))
    assert(out.count() == 2)
  }

  test("manifest min/max pruning skips non-matching files") {
    val dir = tmpDir("graft-prune")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    // three snapshots → three files with disjoint id ranges
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.append(mkDf(10L -> "c", 11L -> "d"), Some(2000L))
    t.append(mkDf(20L -> "e", 21L -> "f"), Some(3000L))

    val manifest = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(manifest.files.size == 3)

    // pruning keeps only the file that may contain id = 10
    val expr = GraftTable.resolveAgainst(spark, simpleSchema,
      org.apache.spark.sql.classic.GraftBridge.expr(col("id") === 10L))
    val kept = manifest.files.filter(f => Pruning.mayMatch(expr, f.stats, simpleSchema))
    assert(kept.map(_.path).toSet == Set(manifest.files(1).path))

    // and the scan result is still exactly right
    val out = t.scan(spark, Some(col("id") === 10L))
    assert(out.select("id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  private val partSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cat", StringType, nullable = true),
    StructField("data", StringType, nullable = true)))

  private def mkPartDf(rows: (Long, String, String)*) = {
    val rdd = spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, r._3)), 1)
    spark.createDataFrame(rdd, partSchema)
  }

  test("partitioned table: schema order preserved, values typed from schema") {
    val dir = tmpDir("graft-part")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a", "x"), (2L, "b", "y"), (3L, "a", "z")), Some(1000L))

    val out = t.read(spark)
    assert(out.columns.toSeq == Seq("id", "cat", "data", "snapshot__id"))
    val rows = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, "a", "x", 1L), (2L, "b", "y", 1L), (3L, "a", "z", 1L)))

    // reload from disk keeps the partition spec
    assert(GraftTable.load(t.dir).partitionColumns == Seq("cat"))
  }

  test("partition pruning: equality on the partition column reads one partition") {
    val dir = tmpDir("graft-part-prune")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")), Some(1000L))
    t.append(mkPartDf((4L, "a", "w"), (5L, "b", "v")), Some(2000L))

    val manifest = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(manifest.files.size == 5) // one file per partition per append
    assert(manifest.files.forall(_.partition.contains("cat")))

    val scanned = t.scan(spark, Some(col("cat") === "a"))
    // the pruned file list feeds spark.read directly: inputFiles is the proof
    assert(scanned.inputFiles.length == 2)
    assert(scanned.inputFiles.forall(_.contains("cat=a")))
    assert(scanned.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))

    // IN and range predicates prune through the same stats machinery
    val in2 = t.scan(spark, Some(col("cat").isin("a", "c")))
    assert(in2.inputFiles.length == 3)
    assert(in2.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("partitioned table: null partition round-trips and prunes on IS NULL") {
    val dir = tmpDir("graft-part-null")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a", "x"), (2L, null, "y")), Some(1000L))

    val out = t.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    assert(out.toSeq == Seq((1L, Some("a")), (2L, None)))

    val nulls = t.scan(spark, Some(col("cat").isNull))
    assert(nulls.inputFiles.length == 1)
    assert(nulls.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))

    val notNulls = t.scan(spark, Some(col("cat").isNotNull))
    assert(notNulls.inputFiles.length == 1)
    assert(notNulls.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("partitioned table: special characters in partition values escape safely") {
    val dir = tmpDir("graft-part-esc")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a/b:c d", "x"), (2L, "plain", "y")), Some(1000L))

    val got = t.scan(spark, Some(col("cat") === "a/b:c d"))
    assert(got.inputFiles.length == 1)
    assert(got.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("partitioned table: time travel and changes respect partitions") {
    val dir = tmpDir("graft-part-tt")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a", "x")), Some(1000L))
    t.append(mkPartDf((2L, "b", "y"), (3L, "a", "z")), Some(2000L))

    val snap1 = t.scan(spark, Some(col("snapshot__id") === 1L))
    assert(snap1.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))

    val changed = t.changes(spark, fromSnapshotId = 1L)
    assert(changed.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))

    // time travel + partition predicate: snapshot 2 is cumulative (both
    // appends), so both cat=a files are read — and ONLY those (cat=b pruned)
    val both = t.scan(spark,
      Some(col("snapshot__id") === 2L && col("cat") === "a"))
    assert(both.inputFiles.length == 2)
    assert(both.inputFiles.forall(_.contains("cat=a")))
    assert(both.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("partition spec validation: unknown column and float types rejected") {
    val dir = tmpDir("graft-part-bad")
    intercept[IllegalArgumentException] {
      GraftTable.create(s"$dir/bad1", partSchema, partitionBy = Seq("nope"))
    }
    val floatSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("f", DoubleType, nullable = true)))
    intercept[IllegalArgumentException] {
      GraftTable.create(s"$dir/bad2", floatSchema, partitionBy = Seq("f"))
    }
  }

  test("schema evolution: added column reads as NULL from pre-evolution files") {
    val dir = tmpDir("graft-evolve")
    val t0 = GraftTable.create(s"$dir/t", simpleSchema)
    t0.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))

    val t1 = t0.addColumn("score", DoubleType)
    assert(t1.schema.fieldNames.toSeq == Seq("id", "data", "score"))
    // reload sees the evolved schema too
    assert(GraftTable.load(t1.dir).schema.fieldNames.toSeq ==
      Seq("id", "data", "score"))

    val withScore = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(3L, "c", 1.5), Row(4L, "d", 2.5)), 1),
      t1.schema)
    t1.append(withScore, Some(2000L))

    val out = t1.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", None, 2L), (2L, "b", None, 2L),
      (3L, "c", Some(1.5), 2L), (4L, "d", Some(2.5), 2L)))

    // predicate on the evolved column: old file has no stats for it →
    // conservatively scanned, rows filtered correctly
    val filtered = t1.scan(spark, Some(col("score") > 2.0))
    assert(filtered.select("id").collect().map(_.getLong(0)).toSeq == Seq(4L))

    // time travel still works; the table (latest) schema applies
    val snap1 = t1.scan(spark, Some(col("snapshot__id") === 1L))
    assert(snap1.columns.toSeq == Seq("id", "data", "score", "snapshot__id"))
    assert(snap1.collect().forall(_.isNullAt(2)))

    // duplicate and virtual-column collisions are rejected
    intercept[IllegalArgumentException] { t1.addColumn("id", LongType) }
    intercept[IllegalArgumentException] { t1.addColumn("snapshot__id", LongType) }
  }

  test("compaction: small files rewritten, rows identical, replace snapshot") {
    val dir = tmpDir("graft-compact")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.append(mkDf(3L -> "c"), Some(3000L))
    val before = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(before.files.size == 3)

    val snap = t.compact(spark, smallerThanBytes = 1 << 20, Some(4000L))
    assert(snap.isDefined && snap.get.operation == "replace")
    val after = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(after.files.size == 1) // 3 tiny files bin-packed into 1
    assert(after.totalRecords == 3)

    // rows identical, tagged with the replace snapshot
    val rows = t.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "a", 4L), (2L, "b", 4L), (3L, "c", 4L)))

    // time travel to a pre-compaction snapshot still reads the old layout
    val snap2 = t.scan(spark, Some(col("snapshot__id") === 2L))
    assert(snap2.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // compacting again is a no-op (single file left under the threshold)
    assert(t.compact(spark, smallerThanBytes = 1 << 20).isEmpty)
  }

  test("changes and change feeds never re-emit compacted rows") {
    val dir = tmpDir("graft-compact-chg")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))

    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    var polled = Seq.empty[Long]
    feed.poll(spark)(df => polled = df.select("id").collect().map(_.getLong(0)).toSeq)
    assert(polled.sorted == Seq(1L, 2L))

    val compactSnap = t.compact(spark, smallerThanBytes = 1 << 20, Some(3000L)).get
    // the replace snapshot contributes no changes
    assert(t.changes(spark, fromSnapshotId = 2L).count() == 0)
    // feed advances over the replace snapshot with zero rows
    var n2 = -1L
    feed.poll(spark)(df => n2 = df.count())
    assert(n2 == 0 && feed.cursor == compactSnap.snapshotId)

    t.append(mkDf(3L -> "c"), Some(4000L))
    var polled3 = Seq.empty[Long]
    feed.poll(spark)(df => polled3 = df.select("id").collect().map(_.getLong(0)).toSeq)
    assert(polled3 == Seq(3L))

    // full-range changes across the compaction: each appended row exactly once
    assert(t.changes(spark, fromSnapshotId = 1L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("clustered compaction: sorted rewrite makes point queries one-file") {
    val dir = tmpDir("graft-cluster")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    // interleaved ids across three appends: every file spans the full id
    // range, so min/max pruning keeps all files for a point query
    t.append(mkDf(1L -> "a", 50L -> "b", 99L -> "c"), Some(1000L))
    t.append(mkDf(2L -> "d", 51L -> "e", 98L -> "f"), Some(2000L))
    t.append(mkDf(3L -> "g", 52L -> "h", 97L -> "i"), Some(3000L))
    assert(t.scan(spark, Some(col("id") === 50L)).inputFiles.length == 3)

    // tiny target size forces multiple output files; range partitioning
    // gives them disjoint id ranges
    val snap = t.compact(spark, smallerThanBytes = 1 << 20, Some(4000L),
      sortBy = Seq("id"), targetFileBytes = Some(1000L))
    assert(snap.exists(_.operation == "replace"))
    val after = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(after.totalRecords == 9)
    assert(after.files.size > 1, "target size should split the rewrite")

    val point = t.scan(spark, Some(col("id") === 50L))
    assert(point.select("data").collect().map(_.getString(0)).toSeq == Seq("b"))
    assert(point.inputFiles.length < after.files.size,
      s"clustered rewrite should prune: ${after.files.map(_.stats("id"))}")
    // rows identical regardless of layout
    assert(t.read(spark).count() == 9)
  }

  test("partitioned compaction never mixes partitions") {
    val dir = tmpDir("graft-compact-part")
    val t = GraftTable.create(s"$dir/t", partSchema, partitionBy = Seq("cat"))
    t.append(mkPartDf((1L, "a", "x"), (2L, "b", "y")), Some(1000L))
    t.append(mkPartDf((3L, "a", "z"), (4L, "b", "w")), Some(2000L))
    assert(Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files.size == 4)

    assert(t.compact(spark, smallerThanBytes = 1 << 20, Some(3000L)).isDefined)
    val after = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(after.files.size == 2) // one packed file per partition
    assert(after.files.forall(f => f.partition.get("cat").isDefined))

    val aScan = t.scan(spark, Some(col("cat") === "a"))
    assert(aScan.inputFiles.length == 1)
    assert(aScan.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("readStream: each appended snapshot flows through exactly once") {
    val dir = tmpDir("graft-stream")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))

    val query = t.readStream(spark)
      .writeStream.format("memory").queryName("graft_stream")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      query.processAllAvailable()
      assert(spark.table("graft_stream").count() == 2)

      t.append(mkDf(3L -> "c"), Some(2000L))
      query.processAllAvailable()
      val ids = spark.table("graft_stream")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // snapshot 2 exactly once, no re-emits
    } finally query.stop()

    // compacted and partitioned tables are rejected up front
    t.compact(spark, smallerThanBytes = 1 << 20, Some(3000L))
    intercept[IllegalArgumentException] { t.readStream(spark) }
    val pt = GraftTable.create(s"$dir/pt", partSchema, partitionBy = Seq("cat"))
    intercept[IllegalArgumentException] { pt.readStream(spark) }
  }

  test("copy-on-write delete: only candidate files rewritten, history intact") {
    val dir = tmpDir("graft-delete")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))   // file A: ids 1-2
    t.append(mkDf(10L -> "c", 11L -> "d"), Some(2000L)) // file B: ids 10-11

    val snap = t.delete(spark, col("id") === 10L, Some(3000L))
    assert(snap.exists(_.operation == "delete"))
    assert(snap.get.summary("deleted-records") == "1")
    // file A (ids 1-2) cannot match id=10: carried over untouched
    assert(snap.get.summary("rewritten-data-files") == "1")

    val now = t.read(spark).select("id").collect().map(_.getLong(0)).sorted
    assert(now.toSeq == Seq(1L, 2L, 11L))

    // time travel still sees the deleted row
    val before = t.scan(spark, Some(col("snapshot__id") === 2L))
    assert(before.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 10L, 11L))

    // change feed never re-emits the delete rewrite
    assert(t.changes(spark, fromSnapshotId = 2L).count() == 0)

    // no candidate files -> no commit
    assert(t.delete(spark, col("id") === 999L).isEmpty)
    // deleting ALL remaining rows of a file leaves no empty file behind
    t.delete(spark, col("id") === 11L, Some(4000L))
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L))
    // virtual-column predicates are rejected
    intercept[IllegalArgumentException] {
      t.delete(spark, col("snapshot__id") === 1L)
    }
  }

  test("delete keeps rows where the predicate evaluates to NULL") {
    val dir = tmpDir("graft-delete-null")
    val t0 = GraftTable.create(s"$dir/t", simpleSchema)
    t0.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    // evolve: pre-evolution rows are NULL in the new column
    val t1 = t0.addColumn("score", DoubleType)
    val withScore = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(3L, "c", 0.1), Row(4L, "d", 9.0)), 1),
      t1.schema)
    t1.append(withScore, Some(2000L))

    // predicate is NULL for ids 1,2 (no score) — SQL DELETE must keep them
    val snap = t1.delete(spark, col("score") > 1.0, Some(3000L))
    assert(snap.exists(_.summary("deleted-records") == "1"))
    val ids = t1.read(spark).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("copy-on-write update rewrites only candidate files") {
    val dir = tmpDir("graft-update")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.append(mkDf(10L -> "c"), Some(2000L))

    val snap = t.update(spark, col("id") === 2L,
      Map("data" -> org.apache.spark.sql.functions.lit("B!")), Some(3000L))
    assert(snap.exists(_.operation == "update"))
    assert(snap.get.summary("rewritten-data-files") == "1") // ids-10 file untouched

    val rows = t.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B!"), (10L, "c")))
    // history: snapshot 2 still has the old value
    assert(t.scan(spark, Some(col("snapshot__id") === 2L))
      .filter(col("id") === 2L).select("data").head().getString(0) == "b")

    // guards: unknown column, partition column, no-candidate no-op
    intercept[IllegalArgumentException] {
      t.update(spark, col("id") === 1L,
        Map("nope" -> org.apache.spark.sql.functions.lit(1)))
    }
    assert(t.update(spark, col("id") === 999L,
      Map("data" -> org.apache.spark.sql.functions.lit("x"))).isEmpty)
    val pt = GraftTable.create(s"$dir/pt", partSchema, partitionBy = Seq("cat"))
    pt.append(mkPartDf((1L, "a", "x")), Some(1000L))
    intercept[IllegalArgumentException] {
      pt.update(spark, col("id") === 1L,
        Map("cat" -> org.apache.spark.sql.functions.lit("b")))
    }
  }

  test("update assignments all read OLD values (swap semantics)") {
    val dir = tmpDir("graft-update-swap")
    val swapSchema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
    val t = GraftTable.create(s"$dir/t", swapSchema)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 10L, 20L)), 1), swapSchema),
      Some(1000L))

    // x <-> y swap: if assignments chained, y would get the NEW x (20)
    t.update(spark, col("k") === 1L,
      Map("x" -> col("y"), "y" -> col("x")), Some(2000L))
    val r = t.read(spark).select("x", "y").head()
    assert((r.getLong(0), r.getLong(1)) == (20L, 10L),
      s"swap read new values: $r")
  }

  test("merge upserts by key in one commit, pruning by source key range") {
    val dir = tmpDir("graft-merge")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))    // file A: 1-2
    t.append(mkDf(100L -> "z"), Some(2000L))             // file B: 100

    // source: update key 2, insert key 3 — range [2,3] misses file B
    val snap = t.merge(spark, mkDf(2L -> "B!", 3L -> "new"), "id", Some(3000L))
    assert(snap.operation == "merge")
    assert(snap.summary("rewritten-data-files") == "1")

    val rows = t.read(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B!"), (3L, "new"), (100L, "z")))

    // history intact; changes() emits the merge's new VALUES exactly once
    // (upserted key 2, inserted key 3) and never the carried-over rows
    assert(t.scan(spark, Some(col("snapshot__id") === 2L))
      .filter(col("id") === 2L).select("data").head().getString(0) == "b")
    val delta = t.changes(spark, fromSnapshotId = 2L)
      .select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(delta == Seq((2L, "B!"), (3L, "new")), s"merge delta: $delta")

    // merge into an empty table is a plain insert
    val t2 = GraftTable.create(s"$dir/t2", simpleSchema)
    t2.merge(spark, mkDf(5L -> "e"), "id", Some(1000L))
    assert(t2.read(spark).count() == 1)
  }

  test("changes() emits update deltas row-level, not whole rewritten files") {
    val dir = tmpDir("graft-changes-upd")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L)) // one file, ids 1-2
    t.update(spark, col("id") === 2L,
      Map("data" -> org.apache.spark.sql.functions.lit("B!")), Some(2000L))

    // the rewrite carried row 1 unchanged; only row 2's new value is a change
    val delta = t.changes(spark, fromSnapshotId = 1L)
      .select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(delta == Seq((2L, "B!")), s"update delta: $delta")
    // the feed consumer surface sees the same rows
    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    var got: Seq[(Long, String)] = Nil
    feed.poll(spark)(df => got = df.select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    assert(got == Seq((1L, "a"), (2L, "B!"))) // first poll: full current state
    t.update(spark, col("id") === 1L,
      Map("data" -> org.apache.spark.sql.functions.lit("A!")), Some(3000L))
    feed.poll(spark)(df => got = df.select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    assert(got == Seq((1L, "A!")), s"feed missed the update: $got")
  }

  test("changes() throws when a chain snapshot's parent manifest is gone") {
    val dir = tmpDir("graft-changes-orphan")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.append(mkDf(3L -> "c"), Some(3000L))
    // simulate a hand-broken log: snapshot 2 removed mid-chain, so
    // snapshot 3's parent diff is uncomputable — must fail loudly, not
    // re-emit snapshot 3's whole carried-over file set
    val lg = SnapshotLog.read(s"${t.dir}/snapshots.json")
    SnapshotLog(lg.snapshots.filterNot(_.snapshotId == 2L))
      .write(s"${t.dir}/snapshots.json")
    intercept[IllegalStateException] { t.changes(spark, 1L) }
  }

  test("expireSnapshots with non-monotone timestamps never breaks the chain") {
    val dir = tmpDir("graft-expire-mono")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(5000L)) // LATER wall-clock than snap 2
    t.append(mkDf(2L -> "b"), Some(1000L)) // clock went backwards
    t.append(mkDf(3L -> "c"), Some(6000L))
    // a bare committedAt partition would expire mid-chain snapshot 2 and
    // orphan snapshot 3's parent; the contiguous-prefix rule expires nothing
    assert(t.expireSnapshots(olderThanMillis = 2000L) == Nil)
    assert(t.changes(spark, 1L).count() == 2) // chain intact
    // once the cutoff covers the prefix, expiry proceeds from the front
    assert(t.expireSnapshots(olderThanMillis = 5500L) == Seq(1L, 2L))
    assert(t.read(spark).count() == 3)
  }

  test("rollback commits a new snapshot pointing at the old file set") {
    val dir = tmpDir("graft-rollback")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "bad"), Some(2000L))

    val rb = t.rollbackTo(1L, Some(3000L))
    assert(rb.operation == "rollback" && rb.snapshotId == 3L)
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the bad snapshot remains queryable for forensics
    assert(t.scan(spark, Some(col("snapshot__id") === 2L)).count() == 2)
    intercept[IllegalArgumentException] { t.rollbackTo(99L) }
  }

  test("snapshot expiration reclaims files unreferenced by survivors") {
    val dir = tmpDir("graft-expire")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.compact(spark, smallerThanBytes = 1 << 20, Some(3000L))
    def dataFiles() = scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/t/data"))) {
      s => s.filter(_.toString.endsWith(".parquet")).count()
    }
    assert(dataFiles() == 3) // 2 originals + 1 compacted

    val expired = t.expireSnapshots(olderThanMillis = 2500L)
    assert(expired == Seq(1L, 2L))
    // originals were only referenced by expired snapshots: physically gone
    assert(dataFiles() == 1)
    // current still reads; expired time travel fails loudly
    assert(t.read(spark).count() == 2)
    intercept[IllegalArgumentException] { t.read(spark, Some(1L)) }
    assert(t.snapshots(spark).count() == 1)
  }

  test("concurrent-commit guard: a claimed snapshot id fails loudly, no corruption") {
    val dir = tmpDir("graft-race")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))

    // another committer has claimed snapshot 2 (deterministic stand-in
    // for the read-modify-write race on snapshots.json)
    val marker = java.nio.file.Paths.get(t.dir, "manifests", ".commit-00002")
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.createFile(marker)

    intercept[java.util.ConcurrentModificationException] {
      t.append(mkDf(2L -> "b"), Some(2000L))
    }
    // the losing append left NO trace: log unchanged, data files of the
    // failed write cleaned up, table still reads its committed state
    assert(t.log.snapshots.map(_.snapshotId) == Seq(1L))
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val manifest = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    manifest.files.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(t.dir, f.path))))

    // releasing the claim lets the writer proceed normally
    java.nio.file.Files.delete(marker)
    t.append(mkDf(2L -> "b"), Some(3000L))
    assert(t.read(spark).count() == 2)
  }

  test("appendWithRetry: racing writers all land as distinct snapshots") {
    import scala.jdk.CollectionConverters._
    val dir = tmpDir("graft-retry")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(0L -> "base"), Some(1000L))

    // 4 writers race on the same table dir; each must eventually commit
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val commits = (1 to 4).map { i =>
        Future(GraftTable.load(t.dir)
          .appendWithRetry(mkDf(i.toLong -> s"w$i"), maxRetries = 20))
      }
      Await.result(Future.sequence(commits), 120.seconds)
    } finally pool.shutdown()

    // all 5 snapshots present, ids consecutive, every row readable
    val reloaded = GraftTable.load(t.dir)
    assert(reloaded.log.snapshots.map(_.snapshotId) == (1L to 5L))
    assert(reloaded.read(spark).select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // no orphaned data files: everything on disk is in the manifest
    val manifest = Manifest.read(s"${reloaded.dir}/${reloaded.log.current.get.manifestList}")
    val onDisk = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(reloaded.dir, "data"))) {
      s => s.iterator().asScala.map(_.getFileName.toString).toSet
    }
    assert(onDisk == manifest.files.map(f =>
      java.nio.file.Paths.get(f.path).getFileName.toString).toSet,
      s"orphans or missing: disk=$onDisk")

    // a stale abandoned claim still fails loudly after retries run out
    val marker = java.nio.file.Paths.get(t.dir, "manifests", ".commit-00006")
    java.nio.file.Files.createFile(marker)
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.load(t.dir).appendWithRetry(mkDf(9L -> "z"), maxRetries = 2)
    }
    java.nio.file.Files.delete(marker)
  }

  test("expire racing appends: no commit lost, chain stays a contiguous suffix") {
    val dir = tmpDir("graft-expire-race")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    (1 to 3).foreach(i => t.append(mkDf(i.toLong -> s"old$i"), Some(i * 1000L)))

    // 3 appenders race a looping expirer. The interleaving the
    // claim-recheck closes: a commit lands between expire's log read and
    // its marker acquisition, expire then holds a marker for a CONSUMED
    // id while a fresh committer claims the next one, and the two
    // read-modify-writes of snapshots.json run unserialized — losing the
    // commit or resurrecting the expired prefix. The invariants below
    // must hold under EVERY interleaving.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val appenders = (1 to 3).map { i =>
        Future(GraftTable.load(t.dir)
          .appendWithRetry(mkDf((100L + i) -> s"new$i"), maxRetries = 50))
      }
      val expirer = Future {
        (1 to 8).foreach { _ =>
          try GraftTable.load(t.dir).expireSnapshots(olderThanMillis = 3500L)
          catch { case _: java.util.ConcurrentModificationException => () }
          Thread.sleep(5)
        }
      }
      Await.result(Future.sequence(appenders :+ expirer), 120.seconds)
    } finally pool.shutdown()

    val r = GraftTable.load(t.dir)
    // every racing append landed and the carried base rows survive
    val ids = r.read(spark).select("id").collect().map(_.getLong(0)).toSet
    assert(Set(101L, 102L, 103L).subsetOf(ids), s"lost commit: $ids")
    assert(Set(1L, 2L, 3L).subsetOf(ids), s"carried rows lost: $ids")
    // the log is a contiguous ascending id range (no resurrected prefix,
    // no dropped mid-chain entry)
    val snapIds = r.log.snapshots.map(_.snapshotId)
    assert(snapIds == (snapIds.head to snapIds.last).toSeq,
      s"chain broken: $snapIds")
    // every file the current manifest references survived physical deletes
    val manifest = Manifest.read(s"${r.dir}/${r.log.current.get.manifestList}")
    manifest.files.foreach(f => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(r.dir, f.path)),
      s"dangling manifest entry ${f.path}"))
  }

  test("tag racing expire: an accepted tag anchors its snapshot under every interleaving") {
    val dir = tmpDir("graft-tag-race")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    (1 to 6).foreach(i => t.append(mkDf(i.toLong -> s"r$i"), Some(i * 1000L)))

    // a tagger pins progressively newer snapshots while an expirer
    // advances a rising cut behind it. Without the refs lock around the
    // prefix computation + log rewrite, a tag committed between expire's
    // refs read and its rewrite loses its anchor role and the tagged
    // snapshot expires anyway; with it, tag() either lands (and the
    // snapshot survives) or is loudly rejected against the pruned log.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val tagger = Future {
        (1 to 5).foreach { i =>
          try GraftTable.load(t.dir).tag(s"pin$i", i.toLong)
          catch { case _: IllegalArgumentException => () } // already expired: loud reject
          Thread.sleep(3)
        }
      }
      val expirer = Future {
        (1 to 5).foreach { i =>
          try GraftTable.load(t.dir)
            .expireSnapshots(olderThanMillis = i * 1000L + 500L)
          catch { case _: java.util.ConcurrentModificationException => () }
          Thread.sleep(3)
        }
      }
      Await.result(Future.sequence(Seq(tagger, expirer)), 120.seconds)
    } finally pool.shutdown()

    val r = GraftTable.load(t.dir)
    // refs and log can never disagree: every surviving tag resolves
    r.refs.foreach { case (name, sid) =>
      assert(r.log.byId(sid).isDefined,
        s"tag $name anchors expired snapshot $sid — refs/log diverged")
      assert(r.readTag(spark, name).count() >= 1L)
    }
    val snapIds = r.log.snapshots.map(_.snapshotId)
    assert(snapIds == (snapIds.head to snapIds.last).toSeq,
      s"chain broken: $snapIds")
  }

  test("withCommitRetry: DML racing appends recomputes against the winner") {
    val dir = tmpDir("graft-dml-race")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "keep", 2L -> "drop", 3L -> "keep"), Some(1000L))

    // an appender and a copy-on-write DELETE race; both must land, and
    // the delete's rewrite must reflect whatever state it retried against
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fa = Future(GraftTable.load(t.dir).withCommitRetry(20) {
        GraftTable.load(t.dir).append(mkDf(4L -> "late"), Some(2000L))
      })
      val fd = Future(GraftTable.load(t.dir).withCommitRetry(20) {
        GraftTable.load(t.dir).delete(spark, col("data") === "drop")
      })
      Await.result(Future.sequence(Seq(fa, fd)), 120.seconds)
    } finally pool.shutdown()

    val ids = GraftTable.load(t.dir).read(spark)
      .select("id").collect().map(_.getLong(0)).toSet
    // row 2 deleted, rows 1/3 survive, row 4 landed — whichever op won
    // the race, the other's retry recomputed against the winner's state
    assert(ids == Set(1L, 3L, 4L), s"ids=$ids")
    assert(GraftTable.load(t.dir).log.snapshots.size == 3)
  }

  test("appendStreamBatch: re-delivered epochs are dropped, not duplicated") {
    val dir = tmpDir("graft-sink")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    assert(t.appendStreamBatch(mkDf(1L -> "a"), "q1", batchId = 0L, Some(1000L)).isDefined)
    assert(t.appendStreamBatch(mkDf(2L -> "b"), "q1", batchId = 1L, Some(2000L)).isDefined)
    // restart scenario: the last epoch is re-delivered — must be a no-op
    assert(t.appendStreamBatch(mkDf(2L -> "b"), "q1", batchId = 1L, Some(3000L)).isEmpty)
    assert(t.read(spark).count() == 2)
    assert(t.log.snapshots.size == 2)
    // a NON-stream append interleaves without disturbing the epoch cursor
    t.append(mkDf(3L -> "c"), Some(4000L))
    assert(t.appendStreamBatch(mkDf(4L -> "d"), "q1", batchId = 2L, Some(5000L)).isDefined)
    assert(t.appendStreamBatch(mkDf(4L -> "d"), "q1", batchId = 2L, Some(6000L)).isEmpty)
    assert(t.read(spark).count() == 4)
  }

  test("stream cursors are PER SINK and survive expiration and rollback") {
    val dir = tmpDir("graft-sink-cursor")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.appendStreamBatch(mkDf(1L -> "a"), "qA", 5L, Some(1000L))
    // a SECOND sink starting at epoch 0 must NOT be treated as re-delivery
    assert(t.appendStreamBatch(mkDf(2L -> "b"), "qB", 0L, Some(2000L)).isDefined)
    assert(t.streamCursors == Map("qA" -> 5L, "qB" -> 0L))

    // non-stream commits carry the cursor map forward; expiring the
    // stream snapshots must not lose it
    t.append(mkDf(3L -> "c"), Some(3000L))
    t.append(mkDf(4L -> "d"), Some(4000L))
    assert(t.expireSnapshots(olderThanMillis = 3500L) == Seq(1L, 2L, 3L))
    assert(t.streamCursors == Map("qA" -> 5L, "qB" -> 0L),
      "cursor lost to snapshot expiration")
    assert(t.appendStreamBatch(mkDf(1L -> "a"), "qA", 5L, Some(5000L)).isEmpty,
      "re-delivery applied after expiration")

    // rollback to a pre-batch state resets qA's cursor to the TARGET's,
    // so replaying the rolled-back batch re-ingests
    val t2 = GraftTable.create(s"$dir/t2", simpleSchema)
    t2.append(mkDf(1L -> "a"), Some(1000L))
    t2.appendStreamBatch(mkDf(2L -> "bad"), "qA", 7L, Some(2000L))
    t2.rollbackTo(1L, Some(3000L))
    assert(t2.streamCursors == Map.empty)
    assert(t2.appendStreamBatch(mkDf(2L -> "good"), "qA", 7L, Some(4000L)).isDefined,
      "replay after rollback was dropped as a re-delivery")
    assert(t2.read(spark).filter(col("data") === "good").count() == 1)
    assert(t2.read(spark).filter(col("data") === "bad").count() == 0)
  }

  test("writeStreamInto: micro-batches land as exactly-once snapshots") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = tmpDir("graft-sink-stream")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    val input = MemoryStream[(Long, String)]
    val q = t.writeStreamInto(input.toDF().toDF("id", "data"), sinkId = "ingest")
      .option("checkpointLocation", s"$dir/ckpt").start()
    input.addData(1L -> "a", 2L -> "b")
    q.processAllAvailable()
    input.addData(3L -> "c")
    q.processAllAvailable()
    q.stop()
    assert(t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // the sink's cursor advanced monotonically to the last epoch
    assert(t.streamCursors.get("ingest").exists(_ >= 1L), s"${t.streamCursors}")
  }

  test("tags: named time travel, retention anchoring, SQL VERSION AS OF") {
    val dir = tmpDir("graft-tags")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))
    t.append(mkDf(3L -> "c"), Some(3000L))
    t.tag("audited", 1L)
    assert(t.refs == Map("audited" -> 1L))
    assert(t.readTag(spark, "audited").select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] { t.readTag(spark, "nope") }
    intercept[IllegalArgumentException] { t.tag("7", 1L) } // numeric name
    intercept[IllegalArgumentException] { t.tag("x", 99L) } // no snapshot

    // expiration refuses to cross the tagged anchor
    assert(t.expireSnapshots(olderThanMillis = 2500L) == Nil)
    t.dropTag("audited")
    assert(t.expireSnapshots(olderThanMillis = 2500L) == Seq(1L, 2L))
  }

  test("hash write distribution: one file per partition value, same rows") {
    import org.apache.spark.sql.types.StringType
    val dir = tmpDir("graft-wdist")
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cat", StringType, nullable = true)))
    def wideDf = {
      // 8 input partitions × 3 categories — the small-file cross product
      val rows = (0L until 24L).map(i => Row(i, s"c${i % 3}"))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), s2)
    }
    val plain = GraftTable.create(s"$dir/plain", s2, partitionBy = Seq("cat"))
    plain.append(wideDf, Some(1000L))
    val hashed = GraftTable.create(s"$dir/hashed", s2,
      properties = Map(GraftTable.PropWriteDistribution -> "hash"),
      partitionBy = Seq("cat"))
    hashed.append(wideDf, Some(1000L))

    val plainFiles = plain.read(spark).inputFiles.length
    val hashedFiles = hashed.read(spark).inputFiles.length
    assert(hashedFiles == 3, s"expected one file per partition, got $hashedFiles")
    assert(plainFiles > hashedFiles,
      s"cross product not reproduced: plain=$plainFiles hashed=$hashedFiles")
    // same rows either way, and partition pruning still works
    assert(hashed.read(spark).count() == 24)
    assert(hashed.scan(spark, Some(col("cat") === "c1")).inputFiles.length == 1)
  }

  test("writes validate against the table schema (no bricking commits)") {
    val dir = tmpDir("graft-schema-guard")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    // misnamed column
    intercept[IllegalArgumentException] {
      t.append(mkDf(2L -> "b").withColumnRenamed("data", "txt"))
    }
    // widened type: BIGINT id arriving as DOUBLE must be rejected, not
    // silently committed as files the table schema cannot read back
    intercept[IllegalArgumentException] {
      t.append(mkDf(2L -> "b").withColumn("id", col("id").cast("double")))
    }
    // column ORDER is tolerated and normalized
    t.append(mkDf(2L -> "b").select("data", "id"), Some(2000L))
    assert(t.read(spark).count() == 2)
    assert(t.read(spark).filter(col("id") === 2L)
      .select("data").head().getString(0) == "b")
  }

  test("stale commit claims: recovery API unblocks a crashed committer") {
    val dir = tmpDir("graft-claims")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    // successful commits clean their markers up
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/t/manifests"))
      .filter(_.getFileName.toString.startsWith(".commit-")).count() == 0)
    // simulate a crash: a claim exists but no commit ever landed
    val stale = java.nio.file.Paths.get(s"$dir/t/manifests/.commit-00002")
    java.nio.file.Files.createFile(stale)
    intercept[java.util.ConcurrentModificationException] {
      t.append(mkDf(2L -> "b"))
    }
    assert(t.clearStaleClaims(olderThanMillis = 0L) == Seq(".commit-00002"))
    t.append(mkDf(2L -> "b"), Some(2000L))
    assert(t.read(spark).count() == 2)
  }

  test("tables are relocatable: move the directory, everything still reads") {
    val dir = tmpDir("graft-reloc")
    val t = GraftTable.create(s"$dir/orig", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.append(mkDf(3L -> "c"), Some(2000L))

    val moved = s"$dir/moved"
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/orig"), java.nio.file.Paths.get(moved))

    val m = GraftTable.load(moved)
    assert(m.read(spark).count() == 3)
    assert(m.read(spark, Some(1L)).count() == 2)
    assert(m.scan(spark, Some(col("id") === 3L))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(m.snapshots(spark).count() == 2)
    assert(m.changes(spark, 1L).count() == 1)
  }

  test("reload from disk round-trips schema and properties") {
    val dir = tmpDir("graft-reload")
    GraftTable.create(s"$dir/t", simpleSchema, Map("k" -> "v"))
    val t = GraftTable.load(s"$dir/t")
    assert(t.schema == simpleSchema)
    assert(t.properties == Map("k" -> "v"))
    intercept[IllegalArgumentException] { GraftTable.load(s"$dir/missing") }
  }

  test("as-of-time travel picks the latest snapshot at or before the timestamp") {
    val dir = tmpDir("graft-asof")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b"), Some(2000L))

    assert(t.readAsOf(spark, 999L).count() == 0) // before first commit
    assert(t.readAsOf(spark, 1000L).count() == 1) // boundary inclusive
    assert(t.readAsOf(spark, 1500L).count() == 1)
    assert(t.readAsOf(spark, 5000L).count() == 2)
    assert(t.snapshotAsOfTime(1500L).map(_.snapshotId).contains(1L))
  }

  test("incremental changes between snapshots") {
    val dir = tmpDir("graft-changes")
    val t = GraftTable.create(s"$dir/t", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t.append(mkDf(2L -> "b", 3L -> "c"), Some(2000L))
    t.append(mkDf(4L -> "d"), Some(3000L))

    // 1 → current (3): everything after snapshot 1
    val all = t.changes(spark, fromSnapshotId = 1L)
    assert(all.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L, 4L))
    assert(all.select("snapshot__id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(3L))

    // bounded range 1 → 2
    val step = t.changes(spark, 1L, Some(2L))
    assert(step.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))

    // empty range and error cases
    assert(t.changes(spark, 3L).count() == 0)
    intercept[IllegalArgumentException] { t.changes(spark, 99L) }
    intercept[IllegalArgumentException] { t.changes(spark, 2L, Some(1L)) }
  }

  test("SQL surface: per-query snapshot resolution, time travel, statelessness") {
    val wh = tmpDir("graft-sql")
    val cat = new GraftCatalog(wh)
    val t = cat.createTable("db.tt", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    cat.register(spark, "db.tt")

    // appends AFTER registration are visible (deferred relation)
    t.append(mkDf(2L -> "b"), Some(2000L))
    assert(spark.sql("SELECT * FROM db_tt").count() == 2)

    // time travel via SQL predicate re-plans the scan, not a row filter
    val tt = spark.sql(
      "SELECT id, snapshot__id FROM db_tt WHERE snapshot__id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(tt == Seq((1L, 1L)))

    // statelessness: the very next query sees the latest snapshot
    assert(spark.sql("SELECT * FROM db_tt").count() == 2)

    // the __snapshots view is deferred too: it must show BOTH snapshots
    // even though the second was appended after registration
    assert(spark.sql("SELECT snapshot_id FROM db_tt__snapshots")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // combined time travel + data predicate + projection
    val combo = spark.sql(
      "SELECT data FROM db_tt WHERE snapshot__id = 1 AND id >= 1")
      .collect().map(_.getString(0)).toSeq
    assert(combo == Seq("a"))

    // join of the view with itself (MultiInstanceRelation: distinct ids)
    val self = spark.sql(
      "SELECT a.id FROM db_tt a JOIN db_tt b ON a.id = b.id")
    assert(self.count() == 2)

    // renamed virtual column drives SQL time travel too
    val t2 = cat.createTable("db.renamed", simpleSchema,
      Map(GraftTable.PropVirtualColumnName -> "version_id"))
    t2.append(mkDf(1L -> "x"), Some(100L))
    t2.append(mkDf(2L -> "y"), Some(200L))
    cat.register(spark, "db.renamed")
    val rt = spark.sql(
      "SELECT id FROM db_renamed WHERE version_id = 1")
      .collect().map(_.getLong(0)).toSeq
    assert(rt == Seq(1L))

    // partition pruning flows through the SQL path too: the per-query
    // optimizer rule hands the WHERE clause to manifest pruning, so a
    // partition-column predicate reads only that partition's files
    val pt = cat.createTable("db.ptab", partSchema, partitionBy = Seq("cat"))
    pt.append(mkPartDf((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")),
      Some(1000L))
    cat.register(spark, "db.ptab")
    val psql = spark.sql("SELECT id FROM db_ptab WHERE cat = 'b'")
    assert(psql.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(psql.inputFiles.length == 1 && psql.inputFiles.head.contains("cat=b"))
  }

  test("manifest statistics drive broadcast join selection") {
    val wh = tmpDir("graft-stats")
    val cat = new GraftCatalog(wh)
    val small = cat.createTable("db.smalldim", simpleSchema)
    small.append(mkDf((1L to 20L).map(i => i -> s"d$i"): _*), Some(1000L))
    cat.register(spark, "db.smalldim")

    // a tiny graft table joined to a big in-memory side must broadcast:
    // computeStats reports exact manifest bytes + row count
    import spark.implicits._
    (1L to 50000L).map(i => (i, i % 20 + 1)).toDF("k", "dim_id")
      .createOrReplaceTempView("big_facts")
    val j = spark.sql(
      "SELECT count(*) AS n FROM big_facts f JOIN db_smalldim d ON f.dim_id = d.id")
    assert(j.head().getLong(0) == 50000L)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small graft dim was not broadcast:\n$plan")
  }

  test("metadata-only count(*): answered from the manifest, no scan") {
    val wh = tmpDir("graft-metacount")
    val cat = new GraftCatalog(wh)
    val t = cat.createTable("db.cnt", simpleSchema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.append(mkDf(3L -> "c"), Some(2000L))
    cat.register(spark, "db.cnt")

    val c = spark.sql("SELECT count(*) AS n, count(1) AS m FROM db_cnt")
    assert(c.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 3L)))
    val plan = c.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet"), s"metadata count scanned data:\n$plan")

    // a deferred count sees later appends (per-query manifest read)
    t.append(mkDf(4L -> "d"), Some(3000L))
    assert(spark.sql("SELECT count(*) FROM db_cnt").head().getLong(0) == 4L)

    // filtered counts and count(col) must NOT take the metadata path
    val filtered = spark.sql("SELECT count(*) FROM db_cnt WHERE id > 1")
    assert(filtered.head().getLong(0) == 3L)
    assert(filtered.queryExecution.executedPlan.toString.contains("Scan parquet"))
    val colCount = spark.sql("SELECT count(data) FROM db_cnt")
    assert(colCount.head().getLong(0) == 4L)
    assert(colCount.queryExecution.executedPlan.toString.contains("Scan parquet"))

    // empty table: metadata count is 0
    cat.createTable("db.cnt0", simpleSchema)
    cat.register(spark, "db.cnt0")
    assert(spark.sql("SELECT count(*) FROM db_cnt0").head().getLong(0) == 0L)
  }

  test("catalog resolution: db.table, __snapshots naming, opt-out") {
    val wh = tmpDir("graft-wh")
    val cat = new GraftCatalog(wh)
    val t = cat.createTable("db.people", simpleSchema)
    t.append(mkDf(1L -> "a"), Some(1000L))

    assert(cat.loadDataFrame(spark, "db.people").count() == 1)
    val snaps = cat.loadDataFrame(spark, "db.people__snapshots")
    assert(snaps.columns.contains("manifest_list"))
    assert(snaps.count() == 1)

    // opt-out: a table created with graft.snapshots.table=false refuses
    val t2 = cat.createTable("db.nosnaps", simpleSchema,
      Map(GraftTable.PropSnapshotsTable -> "false"))
    t2.append(mkDf(1L -> "x"), Some(1000L))
    intercept[IllegalArgumentException] {
      cat.loadDataFrame(spark, "db.nosnaps__snapshots")
    }

    // __files naming resolves the files metadata table
    val files = cat.loadDataFrame(spark, "db.people__files")
    assert(files.columns.toSeq ==
      Seq("file_path", "record_count", "file_size_bytes", "partition",
        "min_values", "max_values", "null_counts",
        "first_row_id", "has_row_ids"))
    assert(files.select("record_count").collect().map(_.getLong(0)).sum == 1)
  }

  test("partition value escape/decode round-trips arbitrary strings") {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val rng = new scala.util.Random(7)
    val specials = Seq("a/b", "a=b", "a:b", "a b", "a%20b", "..", "a\tb",
      "a\nb", "ünïcode-日本語", "%", "__HIVE_DEFAULT_PARTITION_", "")
    val randoms = Seq.fill(200)(rng.alphanumeric.take(rng.nextInt(12)).mkString +
      Seq("/", "=", "%", ":", " ", "#").apply(rng.nextInt(6)))
    for (v <- specials ++ randoms) {
      val escaped = ExternalCatalogUtils.escapePathName(v)
      assert(!escaped.contains("/"), s"escaped form leaks a separator: $v")
      assert(PartitionValues.decode(escaped) == Some(v),
        s"round-trip failed for '$v'")
    }
    // the Hive null marker decodes to None (null partition)
    assert(PartitionValues.decode(PartitionValues.NullMarker).isEmpty)
  }

  test("graft.write.sort clusters writes into range-disjoint, prunable files") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft-writesort")
    val t = GraftTable.create(s"$dir/t", simpleSchema,
      properties = Map(GraftTable.PropWriteSort -> "id"))
    // shuffled ids across several input partitions: without the sort
    // order every output file would span the whole id range
    val rows = new scala.util.Random(7).shuffle((0L until 64L).toList)
      .map(i => Row(i, s"v$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), simpleSchema)
    t.append(df, Some(1000L))

    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files
    assert(files.size >= 2, s"fixture wrote ${files.size} file(s)")
    // footer ranges are pairwise DISJOINT on the sort column
    val ranges = files.map { f =>
      val st = f.stats("id")
      (st.min.get.toLong, st.max.get.toLong)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping sorted-write ranges: $ranges")
      case _ => ()
    }
    // a point lookup prunes to exactly one file
    val hit = files.count(f => Pruning.mayMatchFile(
      GraftTable.resolveAgainst(spark, t.schema,
        org.apache.spark.sql.classic.GraftBridge.expr(col("id") === 42L)),
      f, t.schema))
    assert(hit == 1, s"point lookup admitted $hit files")
    // rows read back complete and correct
    assert(t.read(spark).count() == 64L)
    // a misspelled sort column refuses before writing anything
    val bad = GraftTable.create(s"$dir/bad", simpleSchema,
      properties = Map(GraftTable.PropWriteSort -> "nope"))
    intercept[IllegalArgumentException] { bad.append(mkDf(1L -> "a")) }
  }

  test("graft.write.sort holds through copy-on-write DML rewrites") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmpDir("graft-writesort-dml")
    val t = GraftTable.create(s"$dir/t", simpleSchema,
      properties = Map(GraftTable.PropWriteSort -> "id"))
    val rows = new scala.util.Random(11).shuffle((0L until 64L).toList)
      .map(i => Row(i, s"v$i"))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), simpleSchema), Some(1000L))
    val before = Manifest.read(
      s"${t.dir}/${t.log.current.get.manifestList}").files.map(_.path).toSet
    // rewrite everything: the update's replacement files must come out
    // range-disjoint again — fresh DML output stays prunable without
    // waiting for a rewrite_data_files pass
    t.update(spark, col("id") >= 0L, Map("data" -> lit("u")), Some(2000L))
    val after = Manifest.read(
      s"${t.dir}/${t.log.current.get.manifestList}").files
    val rewritten = after.filterNot(f => before(f.path))
    assert(rewritten.size >= 2,
      s"update rewrote ${rewritten.size} file(s) — fixture too small")
    val ranges = rewritten.map { f =>
      val st = f.stats("id")
      (st.min.get.toLong, st.max.get.toLong)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping DML-rewrite ranges: $ranges")
      case _ => ()
    }
    assert(t.read(spark).count() == 64L)
    assert(t.read(spark).filter(col("data") === "u").count() == 64L)
  }
}
