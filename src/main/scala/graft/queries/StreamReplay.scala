package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.{DocStream, EventStream}

/** Driver-gated batch REPLAY of the streaming admission pipeline: the same
  * plan [[graft.streaming.DocStream.dupProbe]] attaches to an unbounded
  * stream is plan-generic, so running it over a bounded "arrivals" slice of
  * the fixture corpus executes the exact per-row signature + band-bucket +
  * stream-static-join program the streaming query runs per micro-batch —
  * and that puts a streaming-shaped pipeline under the DuckDB oracle gate
  * (the stream/batch agreement itself is asserted in DocStreamSpec with a
  * real MemoryStream).
  *
  * Split mirrors the production shape: docs with `doc_id % 10 = 0` "arrive"
  * and are probed against the standing corpus (the other 90%). A pair
  * colliding in several bands is emitted once per band by the stateless
  * stream (documented in DocStream); the replay folds that multiplicity
  * into `n_bands` so the result is set-valued and driver-comparable while
  * still checking the per-band emission count.
  */
object StreamReplay extends QueryPack {

  /** The events table with `ts` normalized to a microsecond TIMESTAMP —
    * see [[QueryPack.eventsTable]] for the physical-type cases. */
  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    eventsTable(s, d)

  val queries: Map[String, Q] = Map(
    "st01_admission_replay" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val arriving = docs.filter(col("doc_id") % 10 === 0)
      DocStream.dupProbe(arriving, corpus, "doc_id", "text",
          k = 3, perms = 16, bands = 4, threshold = 0.5)
        .groupBy("new_doc", "dup_of", "jaccard")
        .agg(count(lit(1)).as("n_bands"))
    }),

    // Batch REPLAY of the stateful sessionizer: the very same
    // flatMapGroupsWithState program EventStream.sessionize attaches to a
    // stream, run over the bounded events table. Spark executes FMGWS in
    // batch mode with one state-free invocation per user — timeouts never
    // fire, so exactly the GAP-closed sessions are emitted and each user's
    // trailing open session stays in (discarded) state. The oracle mirrors
    // that contract by dropping each user's last session; the
    // stream-emits-the-trailing-sessions-too relationship is asserted in
    // EventStreamSpec ("batch replay parity"). Per-group work is one sort
    // of ONE USER's events — bounded per key, shuffles once on user_id,
    // the same layout the streaming state store uses.
    "st02_session_replay" -> ((s, d) => {
      val ev = typedEvents(s, d)
      EventStream.sessionize(ev, gapSeconds = 1800)
        .toDF()
        .select(col("userId").as("user_id"), col("nEvents").as("n_events"),
          col("startUs").as("session_start"), col("endUs").as("session_end"))
    }),

    // Batch REPLAY of the watermarked window aggregation: the identical
    // declarative plan EventStream.windowedCounts attaches to a stream
    // (Catalyst eliminates the no-op watermark in batch), over the bounded
    // events table. `value` is fed as DECIMAL so the streaming sum is
    // order-independent and engine-portable (the e01 money-math contract);
    // the late-data semantics themselves are asserted against a real
    // MemoryStream in EventStreamSpec.
    "st03_window_replay" -> ((s, d) =>
      EventStream.windowedCounts(
          events(s, d).select(col("ts"),
            col("event_type").as("eventType"),
            col("value").cast("decimal(18,6)").as("value")),
          windowLength = "1 hour", watermark = "2 hours")
        .select(unix_timestamp(col("window_start")).as("window_start"),
          col("eventType").as("event_type"), col("n_events"),
          round(col("sum_value"), 4).cast("double").as("sum_value"))),

    // Batch REPLAY of the stateful ordered funnel: mapGroupsWithState in
    // batch mode invokes the fold once per user with empty state, emitting
    // each user's final stage. The view→click→purchase tie-break makes the
    // fold equal the batch window-chain's min-based semantics (e10), so
    // the oracle replays those window minima and classifies per user.
    "st04_funnel_replay" -> ((s, d) => {
      import s.implicits._
      val ev = typedEvents(s, d)
      EventStream.funnelStages(ev).toDF()
        .select(col("userId").as("user_id"), col("stage"))
    }),

    // Batch REPLAY of the stateful cohort-retention tracker: one fold per
    // user pins the cohort day (min epoch-day) and flips the d1/w1 return
    // flags — deterministic at day granularity, mirrored exactly by the
    // grouped oracle.
    "st05_retention_replay" -> ((s, d) => {
      import s.implicits._
      val ev = typedEvents(s, d)
      EventStream.retentionFlags(ev).toDF()
        .select(col("userId").as("user_id"),
          col("cohortDay").as("cohort_day"),
          col("retD1").as("ret_d1"), col("retW1").as("ret_w1"))
    }),

    // Batch REPLAY of the prequential volume-anomaly detector: one fold
    // per event type over its hour-sorted counts (the fold sorts its
    // input, so batch-mode FMGWS iterator order is irrelevant). Every
    // observed hour except the trailing open one is scored against the
    // moments of the hours BEFORE it — prefix-window sums in the oracle.
    "st06_anomaly_replay" -> ((s, d) => {
      import s.implicits._
      val ev = typedEvents(s, d)
      EventStream.anomalyDetector(ev).toDF()
        .select(col("eventType").as("event_type"),
          col("hourTs").as("hour_ts"), col("n"), col("anomaly"))
    }),

    // Batch REPLAY of the silence detector: per type, every empty hour
    // strictly between two observed hours — lead() gap expansion in the
    // oracle (the e13 in-range-zeros contract, never extrapolating past
    // a type's last observed hour).
    "st07_silence_replay" -> ((s, d) => {
      import s.implicits._
      val ev = typedEvents(s, d)
      EventStream.silenceDetector(ev).toDF()
        .select(col("eventType").as("event_type"),
          col("hourTs").as("hour_ts"))
    }),

    // Batch REPLAY of the stream-STREAM interval join: the identical
    // declarative plan EventStream.clickAttribution attaches to two
    // streams (watermarks are no-ops in batch; the interval condition is
    // the join predicate itself), over the bounded clicks/purchases
    // slices. Timestamps ship as epoch micros for comparability (the e08
    // convention). Multiplicity is the join's own: one row per
    // (purchase, click-in-window) pair.
    "st08_attribution_replay" -> ((s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("ts"), col("user_id").as("userId"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("ts"), col("user_id").as("userId"))
      EventStream.clickAttribution(clicks, purchases,
          attributionSeconds = 3600, watermark = "1 hour")
        .select(col("userId").as("user_id"),
          unix_micros(col("purchase_ts")).as("purchase_us"),
          unix_micros(col("click_ts")).as("click_us"))
    }),

    // Batch REPLAY of the streaming exact dedup: the SHARED fingerprint
    // stage (EventStream.fingerprinted — the d01/d02 content identity)
    // with the dedup operator swapped to batch `dropDuplicates` (Spark
    // itself forbids dropDuplicatesWithinWatermark on batch plans; the
    // watermark eviction semantics are EventStreamSpec's). WHICH copy
    // survives a batch dropDuplicates is partition-order-dependent, so
    // the replay projects to the ADMITTED FINGERPRINT SET — exactly one
    // row per fingerprint, independent of the winner — keeping the
    // result deterministic and driver-comparable.
    "st09_dedup_replay" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(timestamp_micros(col("doc_id")).as("ts"), col("text"))
      EventStream.fingerprinted(docs)
        .dropDuplicates("fingerprint")
        .select(col("fingerprint"))
    })
  )

  /** The events table as the streaming surface's typed Event rows. */
  private def typedEvents(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    events(s, d).select(col("ts"), col("user_id").as("userId"),
        col("event_type").as("eventType"),
        col("value").cast("double").as("value"))
      .as[EventStream.Event]
  }

  val oracleSql: Map[String, String] = Map(
    "st01_admission_replay" -> {
      // d14's portable-minhash oracle with the %10 arrival split and the
      // candidate join NOT deduped — the per-pair row count is the number
      // of colliding bands, matching the stateless stream's once-per-band
      // emission folded into n_bands
      val coefs = Dedup.portableCoefs(16)
      val minCols = coefs.zipWithIndex.map { case ((a, b), i) =>
        s"min((h * $a + $b) % 2147483647) AS m$i"
      }.mkString(", ")
      val bandRows = (0 until 4).map { b =>
        val cols = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
        s"SELECT doc, $b AS band, concat_ws('-', $cols) AS bucket FROM sig"
      }.mkString(" UNION ALL ")
      "WITH toks AS (SELECT doc_id AS doc, list_filter(" +
        "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t " +
        "FROM documents WHERE text IS NOT NULL), " +
        "sh_full AS (SELECT doc, CAST(('0x' || substr(md5(" +
        "t[i] || ' ' || t[i+1] || ' ' || t[i+2]), 1, 15)) AS BIGINT) % 2147483647 AS h " +
        "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), " +
        "sh_short AS (SELECT doc, CAST(('0x' || substr(md5(" +
        "array_to_string(t, ' ')), 1, 15)) AS BIGINT) % 2147483647 AS h " +
        "FROM toks WHERE len(t) < 3), " +
        "sh AS (SELECT * FROM sh_full UNION ALL SELECT * FROM sh_short), " +
        s"sig AS (SELECT doc, $minCols FROM sh GROUP BY doc), " +
        s"banded AS ($bandRows), " +
        "cand AS (SELECT n.doc AS new_doc, c.doc AS dup_of, " +
        "count(*) AS n_bands FROM banded n " +
        "JOIN banded c ON n.band = c.band AND n.bucket = c.bucket " +
        "AND n.doc % 10 = 0 AND c.doc % 10 <> 0 GROUP BY 1, 2), " +
        "sets AS (SELECT doc, list_distinct(list(h)) AS sh FROM sh GROUP BY doc) " +
        "SELECT new_doc, dup_of, " +
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard, " +
        "n_bands " +
        "FROM cand JOIN sets a ON a.doc = cand.new_doc JOIN sets b ON b.doc = cand.dup_of " +
        "WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
        "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5"
    },

    "st02_session_replay" ->
      // e04's gap-session construction, minus each user's LAST session —
      // the batch-FMGWS contract (trailing open sessions are never closed
      // by a timeout in batch mode, so they are not emitted)
      ("WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_s FROM events), " +
        "flagged AS (SELECT user_id, ts_s, " +
        "CASE WHEN lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL " +
        "OR ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM ev), " +
        "sessions AS (SELECT user_id, ts_s, sum(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY ts_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq FROM flagged), " +
        "agg AS (SELECT user_id, CAST(seq AS BIGINT) AS seq, count(*) AS n_events, " +
        "min(ts_s) AS session_start, max(ts_s) AS session_end " +
        "FROM sessions GROUP BY user_id, seq) " +
        "SELECT user_id, n_events, session_start, session_end FROM agg " +
        "WHERE seq < (SELECT max(seq) FROM agg a2 WHERE a2.user_id = agg.user_id)"),

    "st03_window_replay" ->
      // e01's tumbling-hour contract (DECIMAL-routed sum), replayed through
      // the streaming operator on the Spark side
      ("SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start, " +
        "event_type, count(*) AS n_events, " +
        "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2"),

    "st04_funnel_replay" ->
      // e10's chained window minima, classified per user — equal to the
      // fold because the replay's tie-break is funnel order
      ("WITH w1 AS (SELECT user_id, ts, event_type, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS fv FROM events), " +
        "w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= fv THEN ts END) OVER (PARTITION BY user_id) AS fc FROM w1), " +
        "w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= fc THEN ts END) OVER (PARTITION BY user_id) AS fp FROM w2) " +
        "SELECT user_id, max(CASE WHEN fp IS NOT NULL THEN 3 " +
        "WHEN fc IS NOT NULL THEN 2 WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS stage " +
        "FROM w3 GROUP BY 1"),

    "st05_retention_replay" ->
      ("WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events), " +
        "c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1) " +
        "SELECT d.user_id, cohort_day, " +
        "bool_or(day - cohort_day = 1) AS ret_d1, " +
        "bool_or(day - cohort_day BETWEEN 1 AND 7) AS ret_w1 " +
        "FROM d JOIN c USING (user_id) GROUP BY 1, 2"),

    "st06_anomaly_replay" ->
      // per type: observed hours sorted, each scored against the prefix
      // moments ((n·i − Σprev)² > 4(Σprev² · i − Σprev²) in integers, i =
      // number of closed hours before); the trailing hour never closes
      ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 * 3600 AS hour_ts, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "seq AS (SELECT event_type, hour_ts, n, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY hour_ts) - 1 AS i, " +
        "count(*) OVER (PARTITION BY event_type) AS total, " +
        "COALESCE(sum(n) OVER (PARTITION BY event_type ORDER BY hour_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS psum, " +
        "COALESCE(sum(n * n) OVER (PARTITION BY event_type ORDER BY hour_ts " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS psum2 FROM h) " +
        "SELECT event_type, hour_ts, n, " +
        "(i > 0 AND (n * i - psum) * (n * i - psum) > 4 * (psum2 * i - psum * psum)) " +
        "AS anomaly FROM seq WHERE i < total - 1"),

    "st07_silence_replay" ->
      // per type: every hour strictly between consecutive observed hours
      ("WITH h AS (SELECT DISTINCT event_type, epoch_us(ts) // 3600000000 AS hr " +
        "FROM events), " +
        "seq AS (SELECT event_type, hr, lead(hr) OVER " +
        "(PARTITION BY event_type ORDER BY hr) AS nxt FROM h), " +
        "g AS (SELECT event_type, unnest(generate_series(hr + 1, nxt - 1)) AS sh " +
        "FROM seq WHERE nxt IS NOT NULL AND nxt > hr + 1) " +
        "SELECT event_type, sh * 3600 AS hour_ts FROM g"),

    "st08_attribution_replay" ->
      // the interval join replayed literally: clicks in the hour before
      // each purchase, same user
      ("WITH c AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase') " +
        "SELECT p.user_id, p.us AS purchase_us, c.us AS click_us " +
        "FROM p JOIN c ON c.user_id = p.user_id " +
        "AND c.us BETWEEN p.us - 3600000000 AND p.us"),

    "st09_dedup_replay" ->
      ("SELECT DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) " +
        "AS fingerprint FROM documents")
  )
}
