package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-windowed analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props) — the batch mirror of the streaming surface
  * (graft.streaming runs the same shapes incrementally with watermarks).
  *
  * Scale notes: tumbling/sliding windows are plain groupBy aggregations
  * (one shuffle on the window key, partial aggregation map-side);
  * sessionization is a window-function scan partitioned by user — the
  * canonical distributed formulation (no per-user collect, no state on the
  * driver). Event values go through DECIMAL for order-independent sums.
  */
object Events extends QueryPack {

  /** The events table with `ts` normalized to a microsecond TIMESTAMP —
    * see [[QueryPack.eventsTable]] for the physical-type cases. */
  /** The normalized events relation (ts-physical-type drift handled by
    * [[QueryPack.eventsTable]]) — public so Bench's JSON-kernel warmup
    * reads events the same way every query does. */
  def events(s: org.apache.spark.sql.SparkSession, d: String) =
    eventsTable(s, d)

  val queries: Map[String, Q] = Map(

    // tumbling 1-hour windows: Spark's window() → window.start
    "e01_tumbling_hour" -> ((s, d) =>
      events(s, d)
        .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour")
          .as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,6)")), 4)
            .cast("double").as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    // sliding 1-hour windows every 30 min (each event lands in 2 windows)
    "e02_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(org.apache.spark.sql.functions
          .window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("n_events"))
        .orderBy("window_start")),

    // time-series GAP FILLING: the dense per-type hourly series a
    // monitoring/report layer needs — hours with no events appear with
    // an explicit zero, spanning each type's own [min, max] hour range.
    // One corpus aggregation; the BOUNDED hourly relation (types ×
    // observed hours) is localCheckpoint'ed because its two consumers
    // (span bounds and the join back) prune different columns and would
    // otherwise re-run the corpus aggregate twice (the t20 rates
    // pattern). The dense grid comes from sequence() per type row —
    // O(hours) rows, never a corpus-sized explode.
    "e13_gap_fill" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val spans = hourly.groupBy(col("event_type"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      spans
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
            .as("hour"))
        .join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), unix_timestamp(col("hour")).as("hour_ts"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy("event_type", "hour_ts")
    }),

    // per-user daily activity: date bucketing + distinct event types
    "e03_daily_user" -> ((s, d) =>
      events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .filter(col("n_events") >= 5)),

    // sessionization via gap detection (30-min inactivity): a new session
    // starts when the gap from the previous event exceeds the timeout.
    // Expressed with window functions so the same SQL runs in DuckDB.
    "e04_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_s"))
        .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts_s") - col("prev_ts") > 1800000000L, 1).otherwise(0))
        .withColumn("session_seq",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_s")).as("session_start"),
          max(col("ts_s")).as("session_end"))
        .filter(col("n_events") >= 3)
        .orderBy("user_id", "session_seq")
    }),

    // JSON scalar functions over the props column (a JSON string payload):
    // extraction stays in whole-stage codegen via get_json_object
    "e06_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50)),

    // schema-full JSON parsing via from_json (struct extraction)
    "e07_json_struct" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_typed"))
        .groupBy()
        .agg(count(col("k_typed")).as("n_parsed"),
          sum(col("k_typed")).as("sum_k"),
          min(col("k_typed")).as("min_k"),
          max(col("k_typed")).as("max_k"))),

    // AS-OF join (graft.operators.Joins): each purchase matched to the
    // user's latest click at-or-before it — union + one keyed window scan,
    // no nested loop (DuckDB's native ASOF JOIN is the oracle)
    "e08_asof_join" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts_us")
      graft.operators.Joins
        .asofJoin(purchases, clicks, "user_id", "ts_us", "ts_us", "click_ts")
        .filter(col("click_ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          col("ts_us").as("purchase_ts"), col("click_ts"),
          (col("ts_us") - col("click_ts")).as("gap_us"))
    }),

    // RANGE join (graft.operators.Joins): global error events counted into
    // each user session interval — time-bucketed equi-join, never O(n·m)
    "e09_range_join" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_s"))
      val sessions = events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_s"))
        .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts_s") - col("prev_ts") > 1800000000L, 1).otherwise(0))
        .withColumn("session_seq",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_s")).as("session_start"),
          max(col("ts_s")).as("session_end"))
        .filter(col("n_events") >= 3)
        .drop("n_events")
      val errors = events(s, d).filter(col("event_type") === "error")
        .select(unix_micros(col("ts")).as("err_ts"))
      graft.operators.Joins
        .rangeJoin(errors, sessions, "err_ts",
          "session_start", "session_end", bucketWidth = 3600000000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_errors"))
        .orderBy("user_id", "session_seq")
    }),

    // top event type per user by count (argmax via window rank)
    "e05_top_type_per_user" -> ((s, d) => {
      val counts = events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("event_type").asc)
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("user_id", "event_type", "n")
    }),

    // cohort RETENTION: users grouped by first-activity day, then counted
    // if they return the next day (d1) / within the week (w1). The cohort
    // day comes from a per-user window min — ONE exchange on user_id, no
    // self-join of the events table against its own aggregate; the final
    // rollup is a groupBy on ~O(days) keys. countDistinct expands the row
    // 3× before the final aggregate, a constant factor.
    "e11_retention" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
      events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("cohort_day", min(col("day")).over(wU))
        .groupBy(col("cohort_day"))
        .agg(
          countDistinct(when(col("day") === col("cohort_day"), col("user_id")))
            .as("cohort_size"),
          countDistinct(when(datediff(col("day"), col("cohort_day")) === 1,
            col("user_id"))).as("retained_d1"),
          countDistinct(when(datediff(col("day"), col("cohort_day"))
            .between(1, 7), col("user_id"))).as("retained_w1"))
        .orderBy("cohort_day")
    }),

    // volume ANOMALY detection: hourly event counts per type, flagged
    // when they deviate from that type's mean by more than 2 population
    // stddevs — the data-quality monitor a pipeline runs per ingest. Two
    // hash aggregations (hour×type counts, then per-type moments) + a
    // join back on type. The threshold test (n−mean)² > 4·var is
    // multiplied through by n_hours² and compared in DOUBLE: squaring the
    // integer form overflows ANSI Long at ~3e9 events per type (a query
    // that CRASHES at the design scale is worse than a rounded boundary),
    // and both engines derive identical doubles from identical longs, so
    // oracle parity is unaffected.
    "e12_anomaly" -> ((s, d) => {
      val hourly = events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).as("sum_n"),
          sum(col("n") * col("n")).as("sum_n2"))
      // (n·H − S)² > 4·(S2·H − S²)  ⇔  (n − S/H)² > 4·(S2/H − (S/H)²)
      val lhs = (col("n") * col("n_hours") - col("sum_n")).cast("double")
      val rhs = lit(4.0) * (col("sum_n2").cast("double") * col("n_hours") -
        col("sum_n").cast("double") * col("sum_n"))
      hourly.join(stats, "event_type")
        .filter(lhs * lhs > rhs)
        .select(col("event_type"),
          unix_timestamp(col("hour")).as("hour_ts"),
          col("n"),
          round(col("sum_n").cast("double") / col("n_hours"), 6).as("mean_n"))
        .orderBy("event_type", "hour_ts")
    }),

    // ORDERED funnel: users who viewed, then clicked AT/AFTER their first
    // view, then purchased at/after that click. Three chained per-user
    // window minima — all three passes share ONE hash partition exchange
    // on user_id (same partitioning, Catalyst reuses it), no orderBy in
    // the frame so no per-partition sort beyond the partitioning. The
    // per-user state is three timestamps; at 100 TB users are many and
    // individually small, so parallelism is the user-key hash.
    "e10_funnel" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
      events(s, d)
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ts"))).over(wU))
        .withColumn("fc",
          min(when(col("event_type") === "click" && col("ts") >= col("fv"),
            col("ts"))).over(wU))
        .withColumn("fp",
          min(when(col("event_type") === "purchase" && col("ts") >= col("fc"),
            col("ts"))).over(wU))
        .agg(
          countDistinct(when(col("fv").isNotNull, col("user_id")))
            .as("n_view"),
          countDistinct(when(col("fc").isNotNull, col("user_id")))
            .as("n_view_click"),
          countDistinct(when(col("fp").isNotNull, col("user_id")))
            .as("n_full_funnel"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e10_funnel" ->
      ("WITH w1 AS (SELECT user_id, ts, event_type, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS fv FROM events), " +
        "w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= fv THEN ts END) OVER (PARTITION BY user_id) AS fc FROM w1), " +
        "w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END) OVER (PARTITION BY user_id) AS fp FROM w2) " +
        "SELECT count(DISTINCT CASE WHEN fv IS NOT NULL THEN user_id END) AS n_view, " +
        "count(DISTINCT CASE WHEN fc IS NOT NULL THEN user_id END) AS n_view_click, " +
        "count(DISTINCT CASE WHEN fp IS NOT NULL THEN user_id END) AS n_full_funnel " +
        "FROM w3"),
    "e01_tumbling_hour" ->
      ("SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start, " +
        "event_type, count(*) AS n_events, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "e02_sliding" ->
      // a 1h-every-30min sliding window = union of two tumbling grids
      // offset by 30 min; DuckDB expresses it via the half-hour bucket of
      // the event joined to the two windows containing it
      ("WITH halfhours AS (SELECT CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT) AS hh FROM events) " +
        "SELECT ws AS window_start, count(*) AS n_events FROM (" +
        "SELECT hh AS ws FROM halfhours UNION ALL SELECT hh - 1800 AS ws FROM halfhours" +
        ") GROUP BY ws ORDER BY ws"),
    "e13_gap_fill" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "spans AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 " +
        "FROM hourly GROUP BY 1), " +
        "grid AS (SELECT event_type, unnest(generate_series(h0, h1, " +
        "INTERVAL 1 HOUR)) AS hour FROM spans) " +
        "SELECT g.event_type, CAST(epoch(g.hour) AS BIGINT) AS hour_ts, " +
        "COALESCE(h.n, 0) AS n_events " +
        "FROM grid g LEFT JOIN hourly h USING (event_type, hour) " +
        "ORDER BY 1, 2"),
    "e03_daily_user" ->
      ("SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n_events, " +
        "count(DISTINCT event_type) AS n_types FROM events " +
        "GROUP BY 1, 2 HAVING count(*) >= 5"),
    "e04_sessionize" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_s FROM events), " +
        "flagged AS (SELECT user_id, ts_s, " +
        "CASE WHEN lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL " +
        "OR ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM ev), " +
        "sessions AS (SELECT user_id, ts_s, sum(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM flagged) " +
        // session_seq is a window SUM of ints → HUGEINT in DuckDB, which the
        // driver-side pandas bridge renders as float; cast to BIGINT
        "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events, " +
        "min(ts_s) AS session_start, max(ts_s) AS session_end " +
        "FROM sessions GROUP BY user_id, session_seq HAVING count(*) >= 3 " +
        "ORDER BY user_id, session_seq"),
    "e12_anomaly" ->
      ("WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "stats AS (SELECT event_type, count(*) AS n_hours, " +
        "CAST(sum(n) AS BIGINT) AS sum_n, CAST(sum(n * n) AS BIGINT) AS sum_n2 " +
        "FROM hourly GROUP BY 1) " +
        "SELECT h.event_type, CAST(epoch(h.hour) AS BIGINT) AS hour_ts, h.n, " +
        "round(CAST(s.sum_n AS DOUBLE) / s.n_hours, 6) AS mean_n " +
        "FROM hourly h JOIN stats s USING (event_type) " +
        "WHERE CAST(h.n * s.n_hours - s.sum_n AS DOUBLE) * (h.n * s.n_hours - s.sum_n) " +
        "> 4.0 * (CAST(s.sum_n2 AS DOUBLE) * s.n_hours - CAST(s.sum_n AS DOUBLE) * s.sum_n) " +
        "ORDER BY 1, 2"),
    "e11_retention" ->
      ("WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "c AS (SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ev) " +
        "SELECT cohort_day, " +
        "count(DISTINCT CASE WHEN day = cohort_day THEN user_id END) AS cohort_size, " +
        "count(DISTINCT CASE WHEN date_diff('day', cohort_day, day) = 1 THEN user_id END) AS retained_d1, " +
        "count(DISTINCT CASE WHEN date_diff('day', cohort_day, day) BETWEEN 1 AND 7 THEN user_id END) AS retained_w1 " +
        "FROM c GROUP BY 1 ORDER BY 1"),
    "e06_json_extract" ->
      "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events WHERE CAST(json_extract(props, '$.k') AS INT) >= 50",
    "e07_json_struct" ->
      "SELECT count(CAST(json_extract(props, '$.k') AS INT)) AS n_parsed, CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k, min(CAST(json_extract(props, '$.k') AS INT)) AS min_k, max(CAST(json_extract(props, '$.k') AS INT)) AS max_k FROM events",
    "e08_asof_join" ->
      ("WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') " +
        "SELECT p.event_id, p.user_id, p.ts_us AS purchase_ts, c.ts_us AS click_ts, " +
        "p.ts_us - c.ts_us AS gap_us " +
        "FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us"),
    "e09_range_join" ->
      ("WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_s FROM events), " +
        "flagged AS (SELECT user_id, ts_s, " +
        "CASE WHEN lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL " +
        "OR ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM ev), " +
        "seqd AS (SELECT user_id, ts_s, sum(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM flagged), " +
        "sessions AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, " +
        "min(ts_s) AS session_start, max(ts_s) AS session_end " +
        "FROM seqd GROUP BY user_id, session_seq HAVING count(*) >= 3), " +
        "err AS (SELECT epoch_us(ts) AS err_ts FROM events WHERE event_type = 'error') " +
        "SELECT s.user_id, s.session_seq, count(*) AS n_errors " +
        "FROM sessions s JOIN err e ON e.err_ts BETWEEN s.session_start AND s.session_end " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "e05_top_type_per_user" ->
      ("WITH counts AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2), " +
        "ranked AS (SELECT user_id, event_type, n, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rk FROM counts) " +
        "SELECT user_id, event_type, n FROM ranked WHERE rk = 1")
  )
}
