package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import EventStream.{Event, SessionOut}

/** Streaming behavior: watermarked windowed aggregation (late-data drop)
  * and stateful gap sessionization, driven through MemoryStream exactly as
  * a production source would drive them.
  */
class EventStreamSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedCounts: tumbling windows aggregate by event time; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStream.windowedCounts(input.toDF(),
        windowLength = "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()

    // two events in hour 0, one in hour 1
    input.addData(
      Event(ts(10), 1L, "click", 1.0),
      Event(ts(20), 2L, "click", 2.0),
      Event(ts(70), 1L, "view", 3.0))
    query.processAllAvailable()

    // advance watermark far enough to close hour-0 and hour-1 windows
    input.addData(Event(ts(300), 3L, "click", 1.0))
    query.processAllAvailable()

    // a very late event (hour 0) arrives after the watermark: dropped
    input.addData(Event(ts(15), 9L, "late", 9.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("wc")
      .selectExpr("window_start", "eventType", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("2024-01-01 00:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 01:00:00.0", "view", 1L, 3.0)))
    assert(!rows.exists(_._2 == "late"), s"late event leaked: $rows")
  }

  test("sessionize: gap-based sessions close on inactivity timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStream.sessionize(input.toDS(), gapSeconds = 600,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()

    // user 1: three events 5 min apart (one session), then silence;
    // user 2: one event
    input.addData(
      Event(ts(0), 1L, "a", 1.0),
      Event(ts(5), 1L, "a", 1.0),
      Event(ts(10), 1L, "a", 1.0),
      Event(ts(8), 2L, "b", 1.0))
    query.processAllAvailable()

    // an event far in the future advances the watermark past both gaps
    input.addData(Event(ts(120), 3L, "c", 1.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("sess").as[SessionOut].collect()
      .map(s => (s.userId, s.nEvents)).toSet
    assert(out.contains((1L, 3L)), s"user1 session missing: ${out.mkString(",")}")
    assert(out.contains((2L, 1L)), s"user2 session missing: ${out.mkString(",")}")
  }

  test("sessionize batch replay parity: stream = replay + trailing open sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // user 1: session A (0,5,10 min) then session B (60,62); user 2:
    // session C (3) then session D (30); user 3: the sentinel that
    // advances the stream watermark past every other session's gap
    val fixture = Seq(
      Event(ts(0), 1L, "a", 1.0), Event(ts(5), 1L, "a", 1.0),
      Event(ts(10), 1L, "a", 1.0), Event(ts(60), 1L, "a", 1.0),
      Event(ts(62), 1L, "a", 1.0),
      Event(ts(3), 2L, "b", 1.0), Event(ts(30), 2L, "b", 1.0))
    val sentinel = Event(ts(300), 3L, "c", 1.0)
    def key(s: SessionOut) = (s.userId, s.nEvents, s.startUs, s.endUs)

    // batch mode: FMGWS runs once per user with no timeouts — exactly the
    // gap-closed sessions (A, C) emit; trailing B, D and user 3 stay open
    val batchOut = EventStream.sessionize((fixture :+ sentinel).toDS(),
      gapSeconds = 600).collect().map(key).toSet

    val input = MemoryStream[Event]
    val query = EventStream.sessionize(input.toDS(), gapSeconds = 600,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_replay")
      .outputMode(OutputMode.Append()).start()
    input.addData(fixture: _*)
    query.processAllAvailable()
    input.addData(sentinel)
    query.processAllAvailable()
    query.stop()
    val streamOut = spark.table("sess_replay").as[SessionOut]
      .collect().map(key).toSet

    val us = (m: Int) => m * 60L * 1000000L +
      Timestamp.valueOf("2024-01-01 00:00:00").toInstant.getEpochSecond * 1000000L
    val a = (1L, 3L, us(0), us(10)); val b = (1L, 2L, us(60), us(62))
    val c = (2L, 1L, us(3), us(3)); val d = (2L, 1L, us(30), us(30))
    assert(batchOut == Set(a, c), s"batch replay: $batchOut")
    // the stream additionally closes B and D by watermark timeout; the
    // sentinel's own session is still open (watermark never passed it)
    assert(streamOut == Set(a, b, c, d), s"stream: $streamOut")
    assert((streamOut -- batchOut) == Set(b, d))
  }

  test("streamingDedup: first copy per fingerprint survives across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val query = EventStream.streamingDedup(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two distinct texts + one in-batch duplicate
    input.addData(
      (ts(0), 1L, "the quick brown fox"),
      (ts(1), 2L, "a different document"),
      (ts(2), 3L, "The  Quick   Brown Fox")) // same after normalization
    query.processAllAvailable()

    // batch 2: cross-batch duplicate of doc 1 + a new text
    input.addData(
      (ts(10), 4L, "the quick brown fox"),
      (ts(11), 5L, "something new entirely"))
    query.processAllAvailable()
    query.stop()

    val ids = spark.table("sdedup").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 5L),
      s"expected first-arrival survivors 1,2,5; got ${ids.mkString(",")}")
  }

  test("streamingDedup: fingerprint state is EVICTED once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val query = EventStream.streamingDedup(docs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sdedup_evict")
      .outputMode(OutputMode.Append()).start()

    input.addData((ts(0), 1L, "the quick brown fox"))
    query.processAllAvailable()
    // unrelated event at t=100min advances the watermark to 90min,
    // which is past firstSeen(0) + 10min: doc 1's state must be evicted
    input.addData((ts(100), 2L, "watermark advancer"))
    query.processAllAvailable()
    // same fingerprint again at t=95min (not late): with bounded state it
    // is RE-ADMITTED — the proof the store didn't keep it forever
    input.addData((ts(95), 3L, "the quick brown fox"))
    query.processAllAvailable()
    query.stop()

    val ids = spark.table("sdedup_evict").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"expected evicted fingerprint to re-admit doc 3; got ${ids.mkString(",")}")
  }

  test("clickAttribution: stream-stream interval join within the window only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val purchases = MemoryStream[(java.sql.Timestamp, Long)]
    val out = EventStream.clickAttribution(
      clicks.toDF().toDF("ts", "userId"),
      purchases.toDF().toDF("ts", "userId"),
      attributionSeconds = 600, watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("attr")
      .outputMode(OutputMode.Append()).start()

    clicks.addData((ts(0), 1L), (ts(5), 1L), (ts(30), 1L), (ts(5), 2L))
    purchases.addData((ts(8), 1L)) // window [ts -2, ts 8]: clicks at 0,5
    query.processAllAvailable()
    // advance both watermarks so results flush
    clicks.addData((ts(300), 9L))
    purchases.addData((ts(300), 9L))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("attr")
      .filter($"userId" === 1L)
      .select("click_ts").collect().map(_.getTimestamp(0).toString).sorted.toSeq
    assert(got == Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0"),
      s"expected clicks at 0 and 5 min attributed; got $got")
  }

  test("windowedCounts from a real parquet file source matches the batch answer") {
    import org.apache.spark.sql.functions._
    // stage the events parquet in its own directory (a streaming source
    // reads a whole directory; the testdata dir mixes table schemas)
    val dir = tmpDir("stream-src")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // normalize ts across driver testdata generations (nanos-as-LONG in
    // r1-r4, TIMESTAMP_NTZ micros from r5) — mirrors QueryPack.eventsTable
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    val batch = normalized
      .select(col("ts"), col("user_id").as("userId"),
        col("event_type").as("eventType"), col("value"))
    batch.write.parquet(s"$dir/in")

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(s"$dir/in")
    val query = EventStream.windowedCounts(stream,
        windowLength = "1 day", watermark = "1 hour")
      .writeStream.format("memory").queryName("wc_file")
      .outputMode(OutputMode.Append()).start()
    query.processAllAvailable()
    query.stop()

    // append mode only emits windows the watermark has closed; compare
    // those against the same batch aggregation
    val got = spark.table("wc_file")
      .select("window_start", "eventType", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "no closed windows emitted")
    val expect = batch
      .groupBy(window(col("ts"), "1 day"), col("eventType"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start"), col("eventType"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got.subsetOf(expect), s"streaming emitted rows absent from batch")
  }

  test("stream-static join: events enriched against a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val dims = Seq((1L, "gold"), (2L, "silver")).toDF("userId", "tier")
    val input = MemoryStream[Event]
    // static side is broadcast per micro-batch; no state, no watermark
    val joined = input.toDF()
      .join(broadcast(dims), Seq("userId"), "left")
      .select(col("userId"), col("eventType"), col("tier"))
    val query = joined.writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      Event(ts(1), 1L, "click", 1.0),
      Event(ts(2), 2L, "view", 1.0),
      Event(ts(3), 9L, "click", 1.0)) // no dim row -> null tier
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("enriched")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(rows == Set(
      (1L, "click", Some("gold")),
      (2L, "view", Some("silver")),
      (9L, "click", None)))
  }

  test("sessionize splits on gap within one batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStream.sessionize(input.toDS(), gapSeconds = 600,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess2")
      .outputMode(OutputMode.Append()).start()

    // two bursts 30 min apart in the SAME batch: first session must be
    // emitted immediately (closed by the in-batch gap)
    input.addData(
      Event(ts(0), 7L, "a", 1.0),
      Event(ts(2), 7L, "a", 1.0),
      Event(ts(40), 7L, "a", 1.0))
    query.processAllAvailable()

    val immediate = spark.table("sess2").as[SessionOut].collect()
    assert(immediate.exists(s => s.userId == 7L && s.nEvents == 2L),
      s"in-batch closed session missing: ${immediate.mkString(",")}")
    query.stop()
  }

  test("funnelStages: stage advances across micro-batches, order enforced") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Event]
    val query = EventStream.funnelStages(input.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()

    // batch 1: user 1 views; user 2 clicks WITHOUT a prior view (stage 0);
    // user 3 views and clicks in one batch
    input.addData(
      Event(ts(10), 1L, "view", 1.0),
      Event(ts(10), 2L, "click", 1.0),
      Event(ts(10), 3L, "view", 1.0),
      Event(ts(12), 3L, "click", 1.0))
    query.processAllAvailable()

    // batch 2: user 1 clicks then purchases; user 2 purchases (still no
    // view -> stays 0); user 3 purchases
    input.addData(
      Event(ts(20), 1L, "click", 1.0),
      Event(ts(25), 1L, "purchase", 1.0),
      Event(ts(20), 2L, "purchase", 1.0),
      Event(ts(20), 3L, "purchase", 1.0))
    query.processAllAvailable()
    query.stop()

    // Update mode: last row per user wins
    val last = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
    assert(last(1L) == 3, s"user 1 should complete the funnel: $last")
    assert(last(2L) == 0, s"user 2 never viewed: $last")
    assert(last(3L) == 3, s"user 3 should complete the funnel: $last")

    // parity with the batch window-chain (e10 semantics) on the same rows
    val all = Seq(
      (ts(10), 1L, "view"), (ts(20), 1L, "click"), (ts(25), 1L, "purchase"),
      (ts(10), 2L, "click"), (ts(20), 2L, "purchase"),
      (ts(10), 3L, "view"), (ts(12), 3L, "click"), (ts(20), 3L, "purchase"))
      .toDF("ts", "user_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val batch = all
      .withColumn("fv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("fc", min(when(col("event_type") === "click" && col("ts") >= col("fv"), col("ts"))).over(w))
      .withColumn("fp", min(when(col("event_type") === "purchase" && col("ts") >= col("fc"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(when(col("fp").isNotNull, 3)
        .when(col("fc").isNotNull, 2)
        .when(col("fv").isNotNull, 1).otherwise(0)).as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(batch == last, s"streaming $last vs batch $batch")
  }

  test("retentionFlags: cohort pinned at first sight, flags flip across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def dayTs(day: Int, hour: Int = 0): Timestamp =
      new Timestamp(day * 86400000L + hour * 3600000L)

    val input = MemoryStream[Event]
    val query = EventStream.retentionFlags(input.toDS())
      .writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Update()).start()

    // batch 1 (day 0): users 1, 2, 3 all start their cohort
    input.addData(
      Event(dayTs(0, 1), 1L, "view", 1.0),
      Event(dayTs(0, 2), 2L, "view", 1.0),
      Event(dayTs(0, 3), 3L, "view", 1.0))
    query.processAllAvailable()

    // batch 2: user 1 returns day 1 (d1+w1); user 2 returns day 5 (w1
    // only); user 3 returns day 30 (neither)
    input.addData(
      Event(dayTs(1), 1L, "click", 1.0),
      Event(dayTs(5), 2L, "click", 1.0),
      Event(dayTs(30), 3L, "click", 1.0))
    query.processAllAvailable()
    query.stop()

    // Update mode: last row per user is the current truth
    val last = spark.table("retention").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
    assert(last(1L) == ((0L, true, true)), s"user 1: $last")
    assert(last(2L) == ((0L, false, true)), s"user 2: $last")
    assert(last(3L) == ((0L, false, false)), s"user 3: $last")

    // parity with the batch cohort computation (e11 semantics) on the
    // same rows: per-user flags aggregate to identical cohort counts
    val all = Seq(
      (dayTs(0, 1), 1L), (dayTs(1), 1L),
      (dayTs(0, 2), 2L), (dayTs(5), 2L),
      (dayTs(0, 3), 3L), (dayTs(30), 3L)).toDF("ts", "user_id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val batch = all
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("user_id"))
      .agg(
        max(when(datediff(col("day"), col("cohort_day")) === 1, true)
          .otherwise(false)).as("d1"),
        max(when(datediff(col("day"), col("cohort_day")).between(1, 7), true)
          .otherwise(false)).as("w1"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    val streamFlags = last.map { case (u, (_, d1, w1)) => u -> ((d1, w1)) }
    assert(batch == streamFlags, s"streaming $streamFlags vs batch $batch")
  }

  test("anomalyDetector: closed hours scored prequentially, spike flagged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def hourTs(h: Int, i: Int): Timestamp =
      new Timestamp(h * 3600000L + i * 1000L)
    def burst(h: Int, n: Int): Seq[Event] =
      (0 until n).map(i => Event(hourTs(h, i), i.toLong, "err", 1.0))

    val input = MemoryStream[Event]
    val query = EventStream.anomalyDetector(input.toDS())
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append()).start()

    // steady 5/hour for hours 0-2, a 50-event spike in hour 3, then one
    // hour-4 event so hour 3 closes
    input.addData(burst(0, 5) ++ burst(1, 5) ++ burst(2, 5): _*)
    query.processAllAvailable()
    input.addData(burst(3, 50): _*)
    query.processAllAvailable()
    input.addData(burst(4, 1): _*)
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("anom").collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getBoolean(3)))).toMap
    // hour 0 closes against an empty past: vacuously not anomalous;
    // hours 1-2 match the steady rate; hour 3 is the spike
    assert(rows == Map(
      0L -> ((5L, false)),
      3600L -> ((5L, false)),
      7200L -> ((5L, false)),
      10800L -> ((50L, true))), s"got $rows")
  }

  test("silenceDetector: silent hours emitted per type when the next " +
      "event bounds them; late events ignored; batch gap-fill parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def at(h: Int, tpe: String): Event =
      Event(new Timestamp(h * 3600000L), 1L, tpe, 1.0)

    val input = MemoryStream[Event]
    val query = EventStream.silenceDetector(input.toDS())
      .writeStream.format("memory").queryName("silence")
      .outputMode(OutputMode.Append()).start()

    // err: hours 0, 3 (silent 1,2), then 4 — contiguous, nothing new
    // web: hours 1, 2 — no gap ever
    input.addData(at(0, "err"), at(1, "web"))
    query.processAllAvailable()
    input.addData(at(3, "err"), at(2, "web"), at(4, "err"))
    query.processAllAvailable()
    // a LATE err event from hour 1: its hour was already classified
    // silent when the stream moved to hour 3 — must emit nothing
    input.addData(at(1, "err"))
    query.processAllAvailable()
    // err resumes at hour 6: exactly hour 5 newly silent
    input.addData(at(6, "err"))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("silence").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("err", 3600L), ("err", 7200L), ("err", 18000L)),
      s"got $got")

    // parity with the batch gap-fill contract: the streamed silent hours
    // are exactly the zero-count hours of the dense per-type grid over
    // the same events (late replay excluded — it was dropped above too)
    val batch = Seq(at(0, "err"), at(1, "web"), at(3, "err"), at(2, "web"),
      at(4, "err"), at(6, "err"))
      .toDF().groupBy(col("eventType"),
        date_trunc("hour", col("ts")).as("hour"))
      .count()
    val spans = batch.groupBy(col("eventType"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val zeros = spans
      .select(col("eventType"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("hour"))
      .join(batch, Seq("eventType", "hour"), "left_anti")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L)).toSet
    assert(zeros == got, s"batch zeros $zeros != streamed $got")
  }
}
