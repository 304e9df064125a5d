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
      assert(msg != null && msg.contains("schema evolved"), s"got: $msg")
    } finally q.stop()
    assert(GraftTable.load(tb.dir).read(spark).count() == 2L)
    val temps = new java.io.File(s"${tb.dir}/data").listFiles()
      .filter(_.getName.startsWith(".stream-"))
    assert(temps.isEmpty, s"uncommitted epoch leaked: ${temps.toSeq}")
  }

  test("refusals: partitioned, constrained, schema-mismatched sinks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    GraftTable.create(s"$wh/db/w_part", StructType(Seq(
      StructField("id", LongType, nullable = false))),
      partitionBy = Seq("bucket(4,id)"))
    def tryStream(target: String, colName: String = "id"): String = {
      val ms = MemoryStream[Long]
      ms.addData(1L)
      val q = ms.toDF().toDF(colName)
        .writeStream
        .option("checkpointLocation", tmpDir("sw-ckpt-r"))
        .toTable(target)
      val e = intercept[StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(60000)
      }
      q.stop()
      Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    }
    assert(tryStream("g8.db.w_part").contains("partitioned"))
    val tc = GraftTable.create(s"$wh/db/w_con", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    tc.updateProperties(Map("graft.check.pos" -> "id > 0"))
    assert(tryStream("g8.db.w_con").contains("constraints"))
    GraftTable.create(s"$wh/db/w_schema", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    assert(tryStream("g8.db.w_schema", colName = "wrong")
      .contains("must match table schema"))
  }
}
