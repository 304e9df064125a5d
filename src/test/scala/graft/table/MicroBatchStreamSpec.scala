package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Snapshot-incremental streaming reads through the DSv2 catalog:
  * `spark.readStream.table` with snapshot-id offsets — each trigger
  * plans only the files the new snapshots appended (manifest path
  * diff), offsets checkpoint for exactly-once restarts, and non-append
  * histories refuse loudly instead of re-emitting or dropping rows. */
class MicroBatchStreamSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private lazy val wh = tmpDir("graft-mbs")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.g7", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.g7.warehouse", wh)
  }

  private def df(rows: Seq[Row], parts: Int = 2): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)

  private def batch(lo: Long, hi: Long): Seq[Row] =
    (lo to hi).map(i => Row(i, s"v$i"))

  test("incremental micro-batches: backfill, then only new snapshots") {
    val tb = GraftTable.create(s"$wh/db/s1", schema)
    tb.append(df(batch(1, 10)), Some(1000L))
    val ckpt = tmpDir("mbs-ckpt1")
    val q = spark.readStream.table("g7.db.s1")
      .writeStream.format("memory").queryName("mbs1")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("mbs1").count() == 10)
      tb.append(df(batch(11, 15)), Some(2000L))
      tb.append(df(batch(16, 18)), Some(3000L))
      q.processAllAvailable()
      val got = spark.table("mbs1").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (1L to 18L), s"duplicated or dropped rows: $got")
    } finally q.stop()
  }

  test("restart from the checkpoint resumes after the committed offset") {
    val tb = GraftTable.create(s"$wh/db/s2", schema)
    tb.append(df(batch(1, 5)), Some(1000L))
    val ckpt = tmpDir("mbs-ckpt2")
    val sink = tmpDir("mbs-sink2")
    def run(): Unit = {
      // a fault-tolerant (file) sink: restart must resume AFTER the
      // committed offset — rows arrive exactly once across both runs
      val q = spark.readStream.table("g7.db.s2")
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "run did not drain")
    }
    run()
    assert(spark.read.schema(schema).parquet(sink).count() == 5)
    tb.append(df(batch(6, 9)), Some(2000L))
    run()
    val got = spark.read.schema(schema).parquet(sink)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 9L), s"restart replayed or skipped: $got")
  }

  test("Trigger.AvailableNow drains everything and terminates") {
    val tb = GraftTable.create(s"$wh/db/s3", schema)
    tb.append(df(batch(1, 7)), Some(1000L))
    tb.append(df(batch(8, 12)), Some(2000L))
    val q = spark.readStream.table("g7.db.s3")
      .writeStream.format("memory").queryName("mbs3")
      .option("checkpointLocation", tmpDir("mbs-ckpt3"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow did not terminate")
    assert(spark.table("mbs3").count() == 12)
  }

  test("starting-snapshot-id tails new commits, skipping the backfill") {
    val tb = GraftTable.create(s"$wh/db/s4", schema)
    tb.append(df(batch(1, 50)), Some(1000L))
    val startAfter = tb.log.current.get.snapshotId
    tb.append(df(batch(51, 55)), Some(2000L))
    val q = spark.readStream
      .option("starting-snapshot-id", startAfter.toString)
      .table("g7.db.s4")
      .writeStream.format("memory").queryName("mbs4")
      .option("checkpointLocation", tmpDir("mbs-ckpt4"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.table("mbs4").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (51L to 55L), s"backfill not skipped: $got")
  }

  test("starting-timestamp-ms tails appends committed after the instant") {
    val tb = GraftTable.create(s"$wh/db/s10", schema)
    tb.append(df(batch(1, 50)), Some(1000L))
    tb.append(df(batch(51, 55)), Some(2000L))
    val q = spark.readStream
      .option("starting-timestamp-ms", "1500")
      .table("g7.db.s10")
      .writeStream.format("memory").queryName("mbs10")
      .option("checkpointLocation", tmpDir("mbs-ckpt10"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(spark.table("mbs10").collect().map(_.getLong(0)).sorted.toSeq ==
      (51L to 55L), "backfill not cut at the timestamp")
  }

  test("filters and projections apply on top of the stream") {
    val tb = GraftTable.create(s"$wh/db/s5", schema)
    tb.append(df(batch(1, 20)), Some(1000L))
    val q = spark.readStream.table("g7.db.s5")
      .filter(org.apache.spark.sql.functions.col("id") % 2 === 0)
      .select("id")
      .writeStream.format("memory").queryName("mbs5")
      .option("checkpointLocation", tmpDir("mbs-ckpt5"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(spark.table("mbs5").collect().map(_.getLong(0)).sorted.toSeq ==
      (2L to 20L by 2))
  }

  test("max-rows-per-trigger paces the backfill in snapshot steps") {
    val tb = GraftTable.create(s"$wh/db/s7", schema)
    tb.append(df(batch(1, 4), parts = 1), Some(1000L))
    tb.append(df(batch(5, 8), parts = 1), Some(2000L))
    tb.append(df(batch(9, 12), parts = 1), Some(3000L))
    val q = spark.readStream
      .option("max-rows-per-trigger", "4")
      .table("g7.db.s7")
      .writeStream.format("memory").queryName("mbs7")
      .option("checkpointLocation", tmpDir("mbs-ckpt7"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "paced AvailableNow did not drain")
    val got = spark.table("mbs7").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (1L to 12L), s"pacing lost or duplicated rows: $got")
    val fed = q.recentProgress.filter(_.numInputRows > 0)
    assert(fed.length == 3,
      s"expected 3 paced batches, got ${fed.map(_.numInputRows).toSeq}")
    assert(fed.forall(_.numInputRows == 4))
  }

  test("max-bytes-per-trigger paces by manifest file sizes") {
    val tb = GraftTable.create(s"$wh/db/s9", schema)
    tb.append(df(batch(1, 4), parts = 1), Some(1000L))
    tb.append(df(batch(5, 8), parts = 1), Some(2000L))
    // one byte: every snapshot overflows the cap alone, so the drain
    // must still advance one whole snapshot per batch (progress floor)
    val q = spark.readStream
      .option("max-bytes-per-trigger", "1")
      .table("g7.db.s9")
      .writeStream.format("memory").queryName("mbs9")
      .option("checkpointLocation", tmpDir("mbs-ckpt9"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    assert(spark.table("mbs9").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 8L))
    assert(q.recentProgress.count(_.numInputRows > 0) == 2,
      "byte cap should admit exactly one snapshot per batch")
  }

  test("compaction mid-stream is skipped, never re-emitted") {
    val tb = GraftTable.create(s"$wh/db/s8", schema)
    tb.append(df(batch(1, 10)), Some(1000L))
    val ckpt = tmpDir("mbs-ckpt8")
    val q = spark.readStream.table("g7.db.s8")
      .writeStream.format("memory").queryName("mbs8")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("mbs8").count() == 10)
      // compact (a row-preserving "replace") then append more: the
      // stream must deliver ONLY the new rows — a path-diff that
      // treated the compacted files as additions would re-emit 1-10
      tb.append(df(batch(11, 14)), Some(2000L))
      tb.compact(spark, smallerThanBytes = Long.MaxValue,
        committedAt = Some(3000L))
      tb.append(df(batch(15, 17)), Some(4000L))
      q.processAllAvailable()
      val got = spark.table("mbs8").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (1L to 17L),
        s"compaction duplicated or dropped rows: $got")
    } finally q.stop()
  }

  test("a non-append snapshot in range refuses loudly") {
    val tb = GraftTable.create(s"$wh/db/s6", schema)
    tb.append(df(batch(1, 10)), Some(1000L))
    tb.delete(spark, org.apache.spark.sql.functions.col("id") === 3L,
      committedAt = Some(2000L))
    val q = spark.readStream.table("g7.db.s6")
      .writeStream.format("memory").queryName("mbs6")
      .option("checkpointLocation", tmpDir("mbs-ckpt6")).start()
    val e = intercept[StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(120000)
    }
    q.stop()
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("append"),
      s"expected the additive-stream refusal, got: $msg")
  }
}
