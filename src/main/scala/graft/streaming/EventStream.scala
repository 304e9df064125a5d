package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine — the incremental mirror of
  * `graft.queries.Events` (the reference has no streaming; SURVEY.md §2.4
  * marks it [absent] and §7.6 flags it as an extension). Everything is
  * expressed against `readStream` inputs so the same code runs from Kafka,
  * files, or a memory source:
  *
  *  - [[windowedCounts]]: tumbling-window counts with a watermark — late
  *    data beyond the watermark is dropped, state is bounded;
  *  - [[sessionize]]: gap-based sessions via
  *    `flatMapGroupsWithState` + event-time timeout — per-key state is one
  *    small [[SessionState]], emitted when the inactivity gap expires.
  *
  * Scale notes: both operators shuffle once on their grouping key
  * (window/user), state lives in the executor state store (RocksDB-backed
  * in production), and watermarks bound it — the design holds on an
  * unbounded stream exactly as on the 100 TB batch reprocessing path.
  */
object EventStream {

  /** Full-precision event-time micros. `Timestamp.getTime` is MILLIS-only
    * — `getTime * 1000` truncates the microsecond component Spark
    * timestamps carry, so same-millisecond ordering (funnel order checks,
    * session gaps) would diverge from the batch plans' full-precision
    * comparisons. */
  private def micros(ts: java.sql.Timestamp): Long =
    Math.addExact(Math.multiplyExact(ts.toInstant.getEpochSecond, 1000000L),
      ts.getNanos / 1000L)

  case class Event(ts: java.sql.Timestamp, userId: Long, eventType: String,
      value: Double)

  case class SessionState(nEvents: Long, startUs: Long, lastUs: Long)

  case class SessionOut(userId: Long, nEvents: Long, startUs: Long,
      endUs: Long)

  /** Tumbling-window event counts with a watermark for late data. */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("eventType"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("eventType"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization with bounded per-user state. A session
    * closes (and is emitted) when no event arrives within `gapSeconds` of
    * the previous one, tracked by event-time timeout against the
    * watermark. */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // inactivity gap expired: emit the finished session
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.nEvents, s.startUs, s.lastUs))
          } else {
            // fold this micro-batch's events (sorted: state is order-
            // sensitive) into open sessions, emitting any that closed
            val sorted = rows.map(e => (micros(e.ts), e)).toSeq
              .sortBy(_._1)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            for ((us, _) <- sorted) {
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, lastUs = us))
                case Some(s) =>
                  closed += SessionOut(userId, s.nEvents, s.startUs, s.lastUs)
                  cur = Some(SessionState(1L, us, us))
                case None =>
                  cur = Some(SessionState(1L, us, us))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // time out once the watermark passes lastEvent + gap
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-STREAM interval join: each purchase matched to the same
    * user's clicks in the `attributionSeconds` window before it — the
    * streaming form of the AS-OF/attribution join (batch e08). Watermarks
    * on BOTH sides plus the interval condition let Spark expire join
    * state: a click older than the watermark minus the window can never
    * match a future purchase and is dropped from the state store — the
    * invariant that keeps state bounded on an unbounded stream.
    * Inputs need (ts: Timestamp, userId: Long, …) columns. */
  def clickAttribution(
      clicks: DataFrame,
      purchases: DataFrame,
      attributionSeconds: Long = 3600,
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark).alias("c")
    val p = purchases.withWatermark("ts", watermark).alias("p")
    c.join(p, expr(
      s"""c.userId = p.userId AND
          c.ts BETWEEN p.ts - INTERVAL $attributionSeconds SECONDS AND p.ts"""))
      .select(col("p.userId").as("userId"), col("p.ts").as("purchase_ts"),
        col("c.ts").as("click_ts"))
  }

  case class FunnelState(fv: Option[Long], fc: Option[Long], fp: Option[Long])

  case class FunnelOut(userId: Long, stage: Int)

  /** STREAMING ordered funnel — the incremental form of batch e10: per
    * user, track first view, first click at-or-after that view, first
    * purchase at-or-after that click, and emit the user's current funnel
    * stage (0-3) each micro-batch (Update output mode).
    *
    * State is THREE microsecond timestamps per user, updated in event-time
    * order within each batch — ties broken by funnel order (view before
    * click before purchase), which makes the fold DETERMINISTIC and equal
    * to the batch window-chain's min-based semantics (a click at exactly
    * the first-view timestamp counts, matching `min(click >= fv)`); with
    * in-order delivery the incremental result equals the batch answer
    * exactly (an earlier-timestamped view arriving AFTER a later one was
    * folded is the standard incremental-funnel approximation — same trade
    * as any streaming funnel). For unbounded user cardinality, compose
    * with a state timeout (as [[sessionize]] does) to expire quiet
    * users. */
  def funnelStages(events: Dataset[Event]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val prio = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[FunnelState, FunnelOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.map(e => (micros(e.ts), e.eventType)).toSeq
            .sortBy { case (us, t) => (us, prio.getOrElse(t, 3)) }
            .foreach { case (us, t) =>
              if (t == "view" && s.fv.isEmpty)
                s = s.copy(fv = Some(us))
              else if (t == "click" && s.fc.isEmpty && s.fv.exists(_ <= us))
                s = s.copy(fc = Some(us))
              else if (t == "purchase" && s.fp.isEmpty && s.fc.exists(_ <= us))
                s = s.copy(fp = Some(us))
            }
          state.update(s)
          FunnelOut(userId,
            if (s.fp.isDefined) 3
            else if (s.fc.isDefined) 2
            else if (s.fv.isDefined) 1
            else 0)
      }
  }

  case class RetentionState(cohortDay: Long, d1: Boolean, w1: Boolean)

  case class RetentionOut(userId: Long, cohortDay: Long, retD1: Boolean,
      retW1: Boolean)

  /** STREAMING cohort retention — the incremental form of batch e11: per
    * user, pin the cohort day at first sight, then flip the day-1 /
    * week-1 return flags as later activity arrives; emit the user's
    * current (cohortDay, flags) each micro-batch (Update output mode —
    * last row per user is the current truth, and a cohort rollup is one
    * groupBy over that snapshot).
    *
    * State is one epoch-day long + two booleans per user — strictly
    * smaller than the funnel's. As with [[funnelStages]], in-order
    * delivery gives exact batch parity; an out-of-order FIRST day
    * arriving after the cohort was pinned is the standard incremental
    * approximation, and quiet users expire via a timeout when composed
    * the way [[sessionize]] shows. */
  def retentionFlags(events: Dataset[Event]): Dataset[RetentionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroupsWithState[RetentionState, RetentionOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[RetentionState]) =>
          val days = rows
            .map(e => Math.floorDiv(micros(e.ts), 86400000000L)).toSeq.sorted
          var s = state.getOption
            .getOrElse(RetentionState(days.head, d1 = false, w1 = false))
          for (d <- days) {
            val off = d - s.cohortDay
            if (off == 1) s = s.copy(d1 = true)
            if (off >= 1 && off <= 7) s = s.copy(w1 = true)
          }
          state.update(s)
          RetentionOut(userId, s.cohortDay, s.d1, s.w1)
      }
  }

  case class AnomalyState(hourStart: Long, inHour: Long, nHours: Long,
      sum: Long, sum2: Long)

  case class AnomalyOut(eventType: String, hourTs: Long, n: Long,
      anomaly: Boolean)

  /** STREAMING volume-anomaly detection — the prequential form of batch
    * e12: per event type, count events in the current hour; when an event
    * arrives in a LATER hour the closed hour is scored against the
    * moments of the hours seen so far ((n−mean)² > 4·var, the same
    * integer-exact threshold as e12, multiplied through by nHours²) and
    * folded into the moments. Each closed hour emits exactly once.
    *
    * Semantics note: e12 scores every hour against the FULL history
    * (retrospective); this scores each hour against the PAST only
    * (prequential) — the honest online form, since the future isn't
    * available on a stream. State is five longs per event type (bounded
    * by the type cardinality); the first two hours are never flagged
    * (variance of <2 samples is undefined — scored but vacuously
    * non-anomalous when nHours is 0). */
  def anomalyDetector(events: Dataset[Event]): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    val hourUs = 3600000000L

    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[AnomalyState, AnomalyOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (eventType: String, rows: Iterator[Event], state: GroupState[AnomalyState]) =>
          val hours = rows
            .map(e => micros(e.ts) / hourUs * hourUs).toSeq.sorted
          val out = Seq.newBuilder[AnomalyOut]
          var s = state.getOption
            .getOrElse(AnomalyState(hours.head, 0L, 0L, 0L, 0L))
          for (h <- hours) {
            if (h < s.hourStart) {
              // LATE event from an already-closed hour: with no watermark
              // Spark does no late filtering, and counting it into the
              // CURRENT hour would inflate its n (a late burst could flag
              // a quiet hour). Dropping is the honest prequential move —
              // the closed hour's score is already emitted.
            } else if (h > s.hourStart) {
              // close the finished hour: score against the past, fold in
              val n = s.inHour
              val lhs = n * s.nHours - s.sum
              val rhs = 4L * (s.sum2 * s.nHours - s.sum * s.sum)
              out += AnomalyOut(eventType, s.hourStart / 1000000L, n,
                s.nHours > 0 && lhs * lhs > rhs)
              s = AnomalyState(h, 1L, s.nHours + 1, s.sum + n,
                s.sum2 + n * n)
            } else {
              s = s.copy(inHour = s.inHour + 1)
            }
          }
          state.update(s)
          out.result().iterator
      }
  }

  case class SilenceState(lastHourUs: Long)

  case class SilenceOut(eventType: String, hourTs: Long)

  /** STREAMING silence detection — the incremental twin of the batch
    * gap-fill (e13): emit one row per HOUR WITH NO EVENTS per type,
    * detected when the next event of that type arrives (an hour is
    * provably silent only once a later event bounds it — the same
    * in-range-zeros contract as e13's dense grid, which never
    * extrapolates past a type's last observed hour). Per-type state is
    * one long (the last seen hour); emission is driven by event time,
    * so replaying the stream reproduces the batch answer exactly.
    * Late events from at-or-before the last seen hour are ignored —
    * their hours were already classified when the stream moved past
    * them (same prequential stance as [[anomalyDetector]]). */
  def silenceDetector(events: Dataset[Event]): Dataset[SilenceOut] = {
    import events.sparkSession.implicits._
    val hourUs = 3600000000L
    events
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[SilenceState, SilenceOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (eventType: String, rows: Iterator[Event], state: GroupState[SilenceState]) =>
          val hours = rows
            .map(e => micros(e.ts) / hourUs * hourUs).toSeq.sorted
          val out = Seq.newBuilder[SilenceOut]
          var last = state.getOption.map(_.lastHourUs).getOrElse(Long.MinValue)
          for (h <- hours) {
            if (last != Long.MinValue && h > last) {
              var sh = last + hourUs
              while (sh < h) { out += SilenceOut(eventType, sh / 1000000L); sh += hourUs }
            }
            if (h > last) last = h
          }
          state.update(SilenceState(last))
          out.result().iterator
      }
  }

  /** STREAMING exact dedup — the incremental form of d01/d02: keep the
    * first-arriving document per content fingerprint, dropping later
    * copies across micro-batches. State MUST be evictable or it grows with
    * distinct fingerprints forever on an unbounded stream: plain
    * `dropDuplicates(fingerprint)` never evicts (Spark only expires dedup
    * state when the event-time column is part of the keys), so this uses
    * `dropDuplicatesWithinWatermark`, which drops a fingerprint's state
    * once the watermark passes its first sighting. The trade is the
    * standard bounded-state one: a copy arriving more than `watermark`
    * after its original is re-admitted (guaranteed dropped only within
    * the watermark window). Expects columns `ts` (event-time Timestamp)
    * and `text`. */
  def streamingDedup(
      docs: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    fingerprinted(docs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** The content-fingerprint stage shared by [[streamingDedup]] and its
    * batch replay (st09): whitespace-normalized lowercase md5 — the d01/
    * d02 definition, so stream, replay, and batch dedup all agree on what
    * "same document" means. */
  def fingerprinted(docs: DataFrame): DataFrame =
    docs.withColumn("fingerprint",
      md5(graft.functions.TextOps.collapse_ws(lower(col("text")))))
}
