package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Exactly-once-per-snapshot incremental consumption, including restart
  * from the durable cursor and failure without cursor advance.
  */
class GraftChangeFeedSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false)))

  private def mkDf(ids: Long*) = spark.createDataFrame(
    spark.sparkContext.parallelize(ids.map(Row(_)), 1), schema)

  test("poll sees each appended snapshot exactly once, across restarts") {
    val dir = tmpDir("feed")
    val t = GraftTable.create(s"$dir/t", schema)
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def run(feed: GraftChangeFeed) = feed.poll(spark) { df =>
      seen += df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    }

    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    assert(run(feed).isEmpty) // empty table: nothing to do

    t.append(mkDf(1L, 2L), Some(1000L))
    assert(run(feed).contains((0L, 1L)))
    assert(seen.last == Seq(1L, 2L))

    assert(run(feed).isEmpty) // caught up

    t.append(mkDf(3L), Some(2000L))
    t.append(mkDf(4L), Some(3000L))
    // two snapshots land in ONE poll (batch catch-up)
    assert(run(feed).contains((1L, 3L)))
    assert(seen.last == Seq(3L, 4L))

    // restart: a NEW feed over the same checkpoint resumes, not replays
    val feed2 = new GraftChangeFeed(t, s"$dir/ckpt")
    assert(feed2.cursor == 3L)
    assert(run(feed2).isEmpty)
    t.append(mkDf(5L), Some(4000L))
    assert(run(feed2).contains((3L, 4L)))
    assert(seen.last == Seq(5L))
  }

  test("pollCdc: downstream mirror stays identical through DML") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("feed-cdc")
    val schema2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("data", StringType, nullable = true)))
    def mk(rows: (Long, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1), schema2)
    val t = GraftTable.create(s"$dir/t", schema2)
    val feed = new GraftChangeFeed(t, s"$dir/ckpt")

    // the consumer: an in-memory multiset mirror applying deletes+inserts
    val mirror = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def run() = feed.pollCdc(spark) { df =>
      val rows = df.select("id", "data", "_change_type").collect()
      rows.filter(_.getString(2) == "delete").foreach { r =>
        val i = mirror.indexOf((r.getLong(0), r.getString(1)))
        assert(i >= 0, s"delete for absent row $r"); mirror.remove(i)
      }
      rows.filter(_.getString(2) == "insert")
        .foreach(r => mirror += ((r.getLong(0), r.getString(1))))
    }
    def tableRows() = t.read(spark).select("id", "data").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    t.append(mk(1L -> "a", 2L -> "b"), Some(1000L))
    run() // seed poll: full state as inserts
    assert(mirror.sorted.toSeq == tableRows())

    // deferred delete + scope-exempt re-append, then materialize and run
    // a copy-on-write update — one poll catches the whole mixed window
    t.deleteDeferred(spark, col("data") === "b", Some(2000L))
    t.append(mk(3L -> "b"), Some(3000L))
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    t.update(spark, col("id") === 1L,
      Map("data" -> org.apache.spark.sql.functions.lit("a2")), Some(5000L))
    run()
    assert(mirror.sorted.toSeq == tableRows(), s"mirror=$mirror")
    assert(mirror.sorted.toSeq == Seq(1L -> "a2", 3L -> "b"))

    // the merge-on-read family through the same feed: a positional key
    // delete, a fresh append, the O(source) upsert (replace + new key),
    // maintenance, and an equality delete — one poll per window, the
    // mirror must track every retraction/insertion exactly
    t.deletePositionalByKeys(spark, mk(3L -> "x").select("id"),
      Seq("id"), Some(6000L))
    t.append(mk(4L -> "d", 5L -> "e"), Some(7000L))
    run()
    assert(mirror.sorted.toSeq == tableRows(), s"mirror=$mirror")
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(8000L))
    t.mergeEquality(spark, mk(5L -> "E2", 6L -> "f"), Seq("id"), Some(9000L))
    run()
    assert(mirror.sorted.toSeq == tableRows(), s"mirror=$mirror")
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(10000L))
    t.deleteEquality(spark, mk(4L -> "x").select("id"), Seq("id"), Some(11000L))
    run()
    assert(mirror.sorted.toSeq == tableRows(), s"mirror=$mirror")
    assert(mirror.sorted.toSeq == Seq(1L -> "a2", 5L -> "E2", 6L -> "f"))
  }

  test("expired cursor: loud error + reset() recovery, never a silent wedge") {
    val dir = tmpDir("feed-expired")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L), Some(1000L))
    t.append(mkDf(2L), Some(2000L))
    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    feed.poll(spark)(_ => ())
    assert(feed.cursor == 2L)
    t.append(mkDf(3L), Some(3000L))
    t.append(mkDf(4L), Some(4000L))
    // retention outruns the consumer: snapshots 1-3 expire (cursor = 2)
    assert(t.expireSnapshots(olderThanMillis = 3500L) == Seq(1L, 2L, 3L))
    val e = intercept[IllegalStateException] { feed.poll(spark)(_ => ()) }
    assert(e.getMessage.contains("EXPIRED"), e.getMessage)
    feed.reset()
    var seen: Seq[Long] = Nil
    feed.poll(spark) { df =>
      seen = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(seen == Seq(1L, 2L, 3L, 4L)) // reseeded with full state
  }

  test("a failing batch does not advance the cursor (at-least-once)") {
    val dir = tmpDir("feed-fail")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L), Some(1000L))
    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    intercept[RuntimeException] {
      feed.poll(spark)(_ => throw new RuntimeException("sink down"))
    }
    assert(feed.cursor == 0L)
    // retry succeeds and delivers the same snapshot
    var got: Seq[Long] = Nil
    feed.poll(spark)(df => got = df.select("id").collect().map(_.getLong(0)).toSeq)
    assert(got == Seq(1L))
    assert(feed.cursor == 1L)
  }
}
