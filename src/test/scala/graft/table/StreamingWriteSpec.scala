package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** DSv2 streaming sink: `writeStream.toTable` on a graft table —
  * executors write parquet straight under data/, each epoch commits ONE
  * append snapshot idempotently (epoch cursor), streamed files are
  * byte-compatible with batch-written ones (stats, blooms, reads). */
class StreamingWriteSpec extends SparkSpecBase {

  private lazy val wh = tmpDir("graft-swrite")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g8", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g8.warehouse", wh)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true),
    StructField("amt", DecimalType(9, 2), nullable = true)))

  test("writeStream.toTable commits one snapshot per non-empty batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tb = GraftTable.create(s"$wh/db/w1", schema)
    val ms = MemoryStream[(Long, String, java.math.BigDecimal)]
    val q = ms.toDF().toDF("id", "v", "amt")
      .select(col("id"), col("v"), col("amt").cast("decimal(9,2)"))
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt1"))
      .toTable("g8.db.w1")
    try {
      ms.addData((1L, "a", new java.math.BigDecimal("1.25")),
        (2L, "b", new java.math.BigDecimal("2.50")))
      q.processAllAvailable()
      ms.addData((3L, "c", null))
      q.processAllAvailable()
    } finally q.stop()

    val got = tb.read(spark).orderBy("id")
      .select("id", "v", "amt").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got(0).getDecimal(2).compareTo(new java.math.BigDecimal("1.25")) == 0)
    assert(got(2).isNullAt(2))
    // one append snapshot per non-empty batch, cursor carried
    val snaps = tb.log.snapshots
    assert(snaps.size == 2, s"expected 2 snapshots, got ${snaps.size}")
    assert(snaps.forall(_.operation == "append"))
    assert(tb.streamCursors.keys.exists(_.startsWith("dsv2:")))
    // streamed files carry footer stats usable for pruning, under
    // canonical part-<snap> names (era attribution)
    val entries = Manifest.read(
      s"${tb.dir}/${snaps.last.manifestList}").files
    assert(entries.nonEmpty)
    assert(entries.forall(_.path.matches("data/part-\\d{5}-.*\\.parquet")))
    assert(entries.forall(_.stats.get("id").exists(_.min.isDefined)))
    // and the static pruning path uses them: id = 1 plans fewer files
    assert(tb.scan(spark, Some(col("id") === 1L)).count() == 1L)
  }

  test("replayed epochs commit nothing and drop their duplicate files") {
    val tb = GraftTable.create(s"$wh/db/w2", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    // write one epoch's file by hand, commit twice with the same batchId
    def staged(ids: Range): String = {
      val tmp = tmpDir("sw-stage")
      spark.range(ids.head, ids.last + 1).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val rel = s"data/.stream-test-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(tb.dir, "data"))
      java.nio.file.Files.copy(f.toPath,
        java.nio.file.Paths.get(tb.dir, rel))
      rel
    }
    val first = tb.commitStreamFiles(Seq(staged(1 to 5)), "sink-a", 0L)
    assert(first.isDefined)
    val dupRel = staged(1 to 5)
    val replay = tb.commitStreamFiles(Seq(dupRel), "sink-a", 0L)
    assert(replay.isEmpty, "replayed epoch must not commit")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(tb.dir, dupRel)),
      "replayed epoch's duplicate file must be deleted")
    assert(tb.read(spark).count() == 5L)
    // a LATER epoch still commits
    assert(tb.commitStreamFiles(Seq(staged(6 to 8)), "sink-a", 1L).isDefined)
    assert(tb.read(spark).count() == 8L)
  }

  test("graft-to-graft streaming pipe: read table, write table") {
    val src = GraftTable.create(s"$wh/db/pipe_src", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    src.append(spark.range(1, 21).toDF("id"), Some(1000L))
    src.append(spark.range(21, 31).toDF("id"), Some(2000L))
    GraftTable.create(s"$wh/db/pipe_dst", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val q = spark.readStream.table("g8.db.pipe_src")
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt3"))
      .trigger(Trigger.AvailableNow())
      .toTable("g8.db.pipe_dst")
    assert(q.awaitTermination(120000), "pipe did not drain")
    val dst = GraftTable.load(s"$wh/db/pipe_dst")
    assert(dst.read(spark).collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 30L))
  }

  test("streaming sink interleaves with batch appends; cursor carries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tb = GraftTable.create(s"$wh/db/w_mix", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("id")
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-mix"))
      .toTable("g8.db.w_mix")
    try {
      ms.addData(1L, 2L)
      q.processAllAvailable()
      // a BATCH append lands between two stream epochs: the sink's
      // epoch cursor must survive it (carried-summary inheritance) so
      // the next epoch still commits instead of reading a reset cursor
      tb.append(spark.range(100, 103).toDF("id"), Some(5000L))
      ms.addData(3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    val got = GraftTable.load(tb.dir).read(spark)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 100L, 101L, 102L),
      s"interleaved writers lost rows: $got")
    assert(GraftTable.load(tb.dir).log.snapshots.size == 3)
  }

  test("mid-stream schema evolution drops the epoch and refuses loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tb = GraftTable.create(s"$wh/db/w_evo", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("id")
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-evo"))
      .toTable("g8.db.w_evo")
    try {
      ms.addData(1L, 2L)
      q.processAllAvailable()
      // evolve AFTER the stream started: the next epoch must refuse
      // (its files carry the start schema but would be era-attributed
      // to the post-evolution snapshot) and leave no temporaries
      tb.addColumn("extra", LongType)
      ms.addData(3L)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(60000)
      }
      val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
      assert(msg != null && msg.contains("evolved"), s"got: $msg")
    } finally q.stop()
    assert(GraftTable.load(tb.dir).read(spark).count() == 2L)
    val temps = new java.io.File(s"${tb.dir}/data").listFiles()
      .filter(_.getName.startsWith(".stream-"))
    assert(temps.isEmpty, s"uncommitted epoch leaked: ${temps.toSeq}")
  }

  test("write constraints enforce INSIDE streaming tasks; schema refuses") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def tryStream(target: String, colName: String = "id",
        data: Seq[Long] = Seq(1L)): String = {
      val ms = MemoryStream[Long]
      ms.addData(data: _*)
      val q = ms.toDF().toDF(colName)
        .writeStream
        .option("checkpointLocation", tmpDir("sw-ckpt-r"))
        .toTable(target)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(60000)
      }
      q.stop()
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    }
    val tc = GraftTable.create(s"$wh/db/w_con", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    tc.updateProperties(Map("graft.check.pos" -> "id > 0"))
    // valid rows stream through a CHECK-constrained sink (same contract
    // as the batch write guard — enforced inside the tasks)
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L)
    val ok = ms.toDF().toDF("id").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-c1"))
      .toTable("g8.db.w_con")
    try { ok.processAllAvailable() } finally ok.stop()
    assert(GraftTable.load(s"$wh/db/w_con").read(spark).count() == 2L)
    // a violating row fails the epoch BEFORE anything commits, loudly
    val msg = tryStream("g8.db.w_con", data = Seq(3L, -1L))
    assert(msg.contains("constraint violated") && msg.contains("CHECK pos"),
      s"got: $msg")
    val after = GraftTable.load(s"$wh/db/w_con")
    assert(after.read(spark).count() == 2L,
      "violating epoch leaked rows into the table")
    assert(new java.io.File(s"${after.dir}/data").listFiles()
      .forall(!_.getName.startsWith(".stream-")),
      "violating epoch leaked temporaries")
    // NOT NULL columns enforce the same way
    val tn = GraftTable.create(s"$wh/db/w_nn", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true))))
    tn.updateProperties(Map("graft.notnull.columns" -> "v"))
    val ms2 = MemoryStream[(Long, String)]
    ms2.addData(1L -> "a", 2L -> null)
    val qn = ms2.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-c2"))
      .toTable("g8.db.w_nn")
    val e2 = intercept[StreamingQueryException] {
      qn.processAllAvailable(); qn.awaitTermination(60000)
    }
    qn.stop()
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(m2.contains("NOT NULL v"), s"got: $m2")
    // schema mismatch still refuses before any task
    GraftTable.create(s"$wh/db/w_schema", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    assert(tryStream("g8.db.w_schema", colName = "wrong")
      .contains("must match table schema"))
    // a constraint ADDED mid-stream refuses the epoch (rows validated
    // against the start set must not land under stricter checks)
    val te = GraftTable.create(s"$wh/db/w_cevo", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val ms3 = MemoryStream[Long]
    val qe = ms3.toDF().toDF("id").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-c3"))
      .toTable("g8.db.w_cevo")
    try {
      ms3.addData(1L)
      qe.processAllAvailable()
      te.updateProperties(Map("graft.check.pos" -> "id > 0"))
      ms3.addData(2L)
      val e3 = intercept[StreamingQueryException] {
        qe.processAllAvailable(); qe.awaitTermination(60000)
      }
      val m3 = Iterator.iterate(e3: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(m3.contains("evolved"), s"got: $m3")
    } finally qe.stop()
    assert(GraftTable.load(s"$wh/db/w_cevo").read(spark).count() == 1L)
  }

  // ---- partitioned streaming sinks -----------------------------------

  test("partitioned sink (bucket): batch layout, manifest values, pruning") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tb = GraftTable.create(s"$wh/db/wp_bkt", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true))),
      partitionBy = Seq("bucket(4,id)"))
    val ms = MemoryStream[(Long, String)]
    // SEVERAL input blocks in one batch: without the transform-clustered
    // write distribution each block's task would write its own per-bucket
    // files (tasks × buckets), so one-file-per-bucket below proves the
    // epoch exchange really runs
    (0L until 16L).grouped(4).foreach(g =>
      ms.addData(g.map(i => (i, s"v$i")): _*))
    val q = ms.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-pb"))
      .toTable("g8.db.wp_bkt")
    try q.processAllAvailable() finally q.stop()
    val t2 = GraftTable.load(s"$wh/db/wp_bkt")
    val entries = Manifest.read(
      s"${t2.dir}/${t2.log.current.get.manifestList}").files
    // the epoch's clustered distribution lands one file per bucket
    assert(entries.map(_.partition("id_bucket").get).toSet.size == 4,
      entries.map(_.partition).mkString(","))
    assert(entries.size == 4,
      s"expected one file per bucket per epoch, got ${entries.size}")
    // batch directory layout, canonical names
    assert(entries.forall(e =>
      e.path.matches("data/id_bucket=\\d/part-\\d+-.*parquet")), entries)
    // rows read back intact (source column stays in the footers)
    assert(spark.sql("SELECT id, v FROM g8.db.wp_bkt ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == (0L until 16L))
    // point lookups prune to the bucket's file — streamed files carry
    // the same synthesized bucket stats as batch ones
    val kept = entries.filter(t2.pruneKeep(
      GraftTable.resolveAgainst(spark, t2.schema,
        org.apache.spark.sql.classic.GraftBridge.expr(col("id") === 7L))))
    assert(kept.size == 1, s"bucket pruning kept ${kept.size} of 4 files")
    // parity: a batch append of the same rows yields the same layout
    val tb2 = GraftTable.create(s"$wh/db/wp_bkt_batch", tb.schema,
      partitionBy = Seq("bucket(4,id)"))
    tb2.append(spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0L until 16L).map(i => Row(i, s"v$i")), 1), tb.schema), Some(1000L))
    val batchEntries = Manifest.read(
      s"${tb2.dir}/${tb2.log.current.get.manifestList}").files
    assert(entries.map(e => e.partition -> e.recordCount).sortBy(_.toString)
      == batchEntries.map(e => e.partition -> e.recordCount)
        .sortBy(_.toString),
      "streamed partition layout differs from the batch layout")
  }

  test("partitioned sink (identity): dirs, dropped footers, null partition") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cat", StringType, nullable = true)))
    GraftTable.create(s"$wh/db/wp_id", tschema,
      partitionBy = Seq("cat"))
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "cat")
      .select(col("id"),
        when(col("cat") === "NULL", lit(null: String))
          .otherwise(col("cat")).as("cat"))
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-pi"))
      .toTable("g8.db.wp_id")
    try {
      ms.addData((1L, "a b/c"), (2L, "x"), (3L, "NULL"), (4L, "x"))
      q.processAllAvailable()
    } finally q.stop()
    val t2 = GraftTable.load(s"$wh/db/wp_id")
    val entries = Manifest.read(
      s"${t2.dir}/${t2.log.current.get.manifestList}").files
    // special characters Hive-escape; nulls take the default partition
    assert(entries.map(_.partition("cat")).toSet ==
      Set(Some("a b/c"), Some("x"), None), entries.map(_.partition))
    // Hive escaping: '/' escapes, spaces don't (same as batch partitionBy)
    assert(entries.exists(_.path.contains("cat=a b%2Fc")),
      entries.map(_.path))
    assert(entries.exists(_.path.contains("__HIVE_DEFAULT_PARTITION__")))
    // identity source dropped from footers; value recovered on read
    val rows = t2.read(spark).select("id", "cat").orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq((1L, "a b/c"), (2L, "x"), (3L, null), (4L, "x")))
    // and through the DSv2 catalog with a partition predicate
    assert(spark.sql("SELECT id FROM g8.db.wp_id WHERE cat = 'x' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 4L))
    // the partition-value synthesized stats make the slice count
    // metadata-only (claim + aggregate pushdown compose with streaming)
    assert(spark.sql(
      "SELECT count(*) AS n FROM g8.db.wp_id WHERE cat = 'x'")
      .collect().head.getLong(0) == 2L)
  }

  test("partitioned sink (days): replayed epochs dedup; pruning by date") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))
    val tb = GraftTable.create(s"$wh/db/wp_days", tschema,
      partitionBy = Seq("days(ts)"))
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    def start() = ms.toDF().toDF("id", "ts").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-pd"))
      .toTable("g8.db.wp_days")
    val q = start()
    try {
      ms.addData((1 to 12).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(s"2026-04-0${i % 3 + 1} 05:00:00"))): _*)
      q.processAllAvailable()
    } finally q.stop()
    val entries = Manifest.read(
      s"${tb.dir}/${tb.log.current.get.manifestList}").files
    assert(entries.map(_.partition("ts_day").get).toSet.size == 3)
    // a replayed epoch (same sink, same batch id) commits nothing: drive
    // the idempotent path directly with a duplicate staged file
    val sinkId = tb.streamCursors.keys.find(_.startsWith("dsv2:")).get
    val dup = java.nio.file.Paths.get(tb.dir, "data", ".stream-dup.parquet")
    java.nio.file.Files.write(dup, Array[Byte](0))
    assert(tb.commitStreamFiles(Seq("data/.stream-dup.parquet"), sinkId, 0L)
      .isEmpty, "replayed epoch must not commit")
    assert(!java.nio.file.Files.exists(dup), "duplicate file not reclaimed")
    // date pruning over the streamed layout
    val kept = entries.filter(tb.pruneKeep(
      GraftTable.resolveAgainst(spark, tb.schema,
        org.apache.spark.sql.classic.GraftBridge.expr(
          col("ts") >= lit(java.sql.Timestamp.valueOf(
            "2026-04-03 00:00:00"))))))
    assert(kept.size == 1, s"date pruning kept ${kept.size} of 3 files")
    // daily counts stay metadata-only over streamed files
    val daily = spark.sql("SELECT CAST(ts AS DATE) AS d, count(*) AS n " +
      "FROM g8.db.wp_days GROUP BY 1 ORDER BY d")
    assert(daily.collect().map(_.getLong(1)).toSeq == Seq(4L, 4L, 4L))
  }

  test("malformed auto-compaction properties refuse at property-set time") {
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false)))
    // create-time: a bad value must never reach a running stream's
    // commit path (where it would fail the stream at its next epoch)
    intercept[IllegalArgumentException] {
      GraftTable.create(s"$wh/db/wcompbad", tschema,
        properties = Map(GraftTable.PropStreamCompactEvery -> "three"))
    }
    val t = GraftTable.create(s"$wh/db/wcompok", tschema)
    intercept[IllegalArgumentException] {
      t.updateProperties(Map(GraftTable.PropStreamCompactEvery -> "0"))
    }
    intercept[IllegalArgumentException] {
      t.updateProperties(Map(GraftTable.PropStreamCompactBytes -> "32mb"))
    }
    // valid values still land
    val t2 = t.updateProperties(Map(
      GraftTable.PropStreamCompactEvery -> "4",
      GraftTable.PropStreamCompactBytes -> "1048576"))
    assert(t2.properties(GraftTable.PropStreamCompactEvery) == "4")
  }

  test("graft.stream.compact-every-epochs folds streamed small files") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/wcomp", tschema,
      properties = Map(GraftTable.PropStreamCompactEvery -> "1"))
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-comp"))
      .toTable("g8.db.wcomp")
    try {
      ms.addData((1L to 4L).map(i => (i, s"a$i")): _*)
      q.processAllAvailable() // epoch 0: 1 file, compact no-ops
      ms.addData((5L to 8L).map(i => (i, s"b$i")): _*)
      q.processAllAvailable() // epoch 1: 2 files -> folded to 1
      ms.addData((9L to 10L).map(i => (i, s"c$i")): _*)
      q.processAllAvailable() // epoch 2: folded again
    } finally q.stop()
    val fresh = GraftTable.load(tb.dir)
    // the debt is BOUNDED: every epoch's small files fold into one
    val entries = Manifest.read(
      s"${fresh.dir}/${fresh.log.current.get.manifestList}").files
    assert(entries.size == 1,
      s"auto-compaction left ${entries.size} files")
    assert(fresh.log.snapshots.count(_.operation == "replace") >= 2,
      "threshold compaction never ran")
    // rows intact, exactly once
    val got = fresh.read(spark).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 10L), s"compaction corrupted the sink: $got")
    // the epoch cursor survives compaction (a replayed epoch still skips)
    assert(fresh.streamCursors.values.max == 2L)
  }

  test("graft.write.sort range-sorts stream epochs into disjoint files") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/wsort", tschema,
      properties = Map(GraftTable.PropWriteSort -> "id"))
    val ms = MemoryStream[(Long, String)]
    // at test scale AQE folds the tiny range exchange into ONE partition
    // (adjacent-range merges keep disjointness — the production-scale
    // behavior is fine); hold coalescing off so several files land and
    // the disjointness is observable
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val q = ms.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-sort"))
      .toTable("g8.db.wsort")
    try {
      // several addData calls BEFORE the trigger: one call = ONE input
      // partition, so an undeclared distribution would hide in a
      // single-block stream (the r10 sharp edge) — interleaved ids
      // across blocks force a real range exchange
      ms.addData((1L to 37L by 4).map(i => (i, s"a$i")): _*)
      ms.addData((2L to 38L by 4).map(i => (i, s"b$i")): _*)
      ms.addData((3L to 39L by 4).map(i => (i, s"c$i")): _*)
      ms.addData((4L to 40L by 4).map(i => (i, s"d$i")): _*)
      q.processAllAvailable()
    } finally {
      q.stop()
      prevCoalesce match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None => spark.conf.unset(coalesceKey)
      }
    }
    val entries = Manifest.read(
      s"${tb.dir}/${tb.log.current.get.manifestList}").files
    assert(entries.size >= 2,
      s"epoch wrote ${entries.size} file(s) — nothing to check")
    // footer ranges pairwise DISJOINT on the sort column: min/max
    // pruning works on FRESH streamed data, no rewrite_data_files needed
    val ranges = entries.map { f =>
      val st = f.stats("id")
      (st.min.get.toLong, st.max.get.toLong)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping stream-epoch ranges: $ranges")
      case _ => ()
    }
    // a point lookup prunes to exactly one streamed file
    val hit = entries.count(f => Pruning.mayMatchFile(
      GraftTable.resolveAgainst(spark, tb.schema,
        org.apache.spark.sql.classic.GraftBridge.expr(col("id") === 17L)),
      f, tb.schema))
    assert(hit == 1, s"point lookup admitted $hit streamed files")
    assert(tb.read(spark).count() == 40L)
  }

  test("a VARIANT column streams through the sink and reads back typed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.types._
    val vSchema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("meta", VariantType, nullable = true)))
    val tb = GraftTable.create(s"$wh/db/wvar", vSchema)
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "js")
      .select(col("id"),
        org.apache.spark.sql.functions.parse_json(col("js")).as("meta"))
      .writeStream
      .option("checkpointLocation", tmpDir("sw-ckpt-var"))
      .toTable("g8.db.wvar")
    try {
      ms.addData((1L, """{"k": 10, "tag": "a"}"""),
        (2L, """{"k": 20}"""))
      q.processAllAvailable()
      ms.addData((3L, """{"k": 30, "nested": {"x": 1}}"""))
      q.processAllAvailable()
    } finally q.stop()
    // the streamed variant bytes read back through typed paths (the
    // sink writes the UNSHREDDED group — no shredded stats, pruning
    // stays conservative on variant probes, which is sound)
    val got = tb.read(spark)
      .select(col("id"),
        org.apache.spark.sql.functions
          .variant_get(col("meta"), "$.k", "int").as("k"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq == Seq((1L, 10), (2L, 20), (3L, 30)))
    // and a batch append on the same table composes (shredded next to
    // unshredded — per-file reader assembly handles both)
    tb.append(Seq((9L, """{"k": 90}""")).toDF("id", "js")
      .select(col("id"),
        org.apache.spark.sql.functions.parse_json(col("js")).as("meta")),
      committedAt = Some(9000L))
    assert(GraftTable.load(s"$wh/db/wvar").read(spark)
      .select(org.apache.spark.sql.functions
        .variant_get(col("meta"), "$.k", "int").as("k"))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20, 30, 90))
  }
}
