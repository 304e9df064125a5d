package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Driver-checkable slice of the multimodal surface. Binary payloads are
  * manufactured from `documents.text` (UTF-8 bytes) so both engines see
  * identical bytes; pure binary column ops (length, digest) get a DuckDB
  * oracle, while the stub-codec paths are rows-only (MultimodalSpec covers
  * their semantics).
  */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(

    // AUDIO-shaped stub: silence detection + trim accounting. The
    // payload's 16-char windows play the role of PCM frames; a window is
    // "silent" when spaces hold the majority (the stub's energy proxy —
    // pure string builtins, so both engines replay it exactly). Per doc:
    // window/silence counts, the LONGEST VOICED RUN (gaps-and-islands
    // with windows partitioned per doc — bounded per key, the canonical
    // distributed formulation), and the chars a silence-trim would keep.
    "m07_silence_trim" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      val win = docs
        .withColumn("w_idx",
          explode(sequence(lit(0), floor((col("n") - 1) / 16).cast("int"))))
        .withColumn("seg", expr("substring(text, w_idx * 16 + 1, 16)"))
        .withColumn("seg_len", length(col("seg")))
        .withColumn("silent",
          (col("seg_len") - length(translate(col("seg"), " ", ""))) * 2
            >= col("seg_len"))
      val runs = win.filter(!col("silent"))
        .withColumn("grp", col("w_idx") - row_number()
          .over(Window.partitionBy(col("doc_id")).orderBy(col("w_idx"))))
        .groupBy(col("doc_id"), col("grp"))
        .agg(count(lit(1)).as("run"))
        .groupBy(col("doc_id"))
        .agg(max(col("run")).as("longest_voiced"))
      win.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
          sum(when(!col("silent"), col("seg_len").cast("long"))
            .otherwise(0L)).as("voiced_chars"))
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_windows"), col("n_silent"),
          coalesce(col("longest_voiced"), lit(0L)).as("longest_voiced"),
          col("voiced_chars"))
        .orderBy("doc_id")
    }),

    // binary column plumbing: payload bytes + length + content digest
    "m01_binary_meta" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"))),

    // stub decode + feature extraction over binary payloads. mean_e4 is
    // floor((sum/len)*10000) — floor of the SAME double expression both
    // engines evaluate (round() would diverge at .xxxx50 halves).
    "m02_decode_features" -> ((s, d) => {
      val assets = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(assets, "doc_id", "payload")
        .toDF()
        .select(col("assetId").as("asset_id"), col("nBytes").as("n_bytes"),
          col("width"), col("height"), col("format"),
          floor(col("meanByte") * 10000).as("mean_e4"))
    }),

    // frame sampling: explode each payload into ≤4 chunks (rows-only)
    "m03_frame_sample" -> ((s, d) => {
      val assets = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.sampleFrames(assets, "doc_id", "payload", nFrames = 4)
        .toDF()
        .select(col("assetId").as("asset_id"), col("frameIdx").as("frame_idx"),
          length(col("frameBytes")).as("frame_bytes"))
    }),

    // stub resize: average-pool each payload to 16 "pixels" — integer
    // arithmetic only, so DuckDB replays it byte-exactly over the ASCII
    // text (every doc is ≥ 16 bytes at all SFs, so no pool is empty)
    "m05_resize" -> ((s, d) => {
      // the oracle's pools CTE inner-joins and would DROP an empty-text
      // doc where resize emits 16 zero pixels — filter the degenerate
      // case identically on both sides instead of resting on a data
      // assumption nothing enforces
      val assets = t(s, d, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      // the driver's pandas comparator can't sort/hash array cells, so the
      // 16-pixel vector ships as an md5 over its comma-joined rendering —
      // information-preserving (order + values) and atomic on both sides
      Multimodal.resize(assets, "doc_id", "payload", target = 16)
        .toDF()
        .select(col("assetId").as("asset_id"), col("nBytes").as("n_bytes"),
          md5(array_join(col("pixels").cast("array<string>"), ","))
            .as("pixels_md5"))
    }),

    // perceptual-hash near-dup detection (aHash): resize to 16 pools,
    // set bit p iff pixel p is above the asset's mean pixel — compared
    // as px*16 > sum(px) so the mean never leaves integer arithmetic —
    // and group equal 16-bit hashes. The image-dedup member of the dedup
    // toolbox: robust to payload-preserving re-encodes the way MinHash
    // is to token edits. Per-asset work is two hash aggregations over
    // 16 rows/asset whose exchanges share one key (AQE reuses the
    // shuffle); the group-by-hash shuffle is O(corpus). Oracle replays
    // the identical pool + threshold arithmetic in DuckDB.
    "m06_phash_dups" -> ((s, d) => {
      val assets = t(s, d, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      // the pool count is FIXED (16), so the mean test unrolls into
      // codegen'd scalar expressions over the pixels array — one corpus
      // pass and one shuffle (the group-by-hash), vs the explode +
      // aggregate + join-back shape whose two branches prune the resize
      // subtree differently and decode the corpus twice (the multi-
      // branch-reuse trap). px ≤ 255 so tot ≤ 4080 and px*16 stay far
      // inside checked Int range. Not the s06 codegen hazard: 16 is a
      // constant of the operator, not a model parameter.
      val resized = Multimodal.resize(assets, "doc_id", "payload", target = 16)
        .toDF()
        .select(col("assetId").as("asset_id"), col("pixels"))
        .withColumn("tot",
          (1 to 16).map(i => element_at(col("pixels"), i)).reduce(_ + _))
      val phash = (0 until 16).map(p =>
        when(element_at(col("pixels"), p + 1) * 16 > col("tot"),
          lit(1L << p)).otherwise(0L)).reduce(_ + _)
      // sort NUMERICALLY before stringifying (lexicographic would put
      // "10" before "2"), then join — an atomic column the driver can hash
      resized.select(col("asset_id"), phash.as("phash"))
        .groupBy("phash")
        .agg(count(lit(1)).as("n_assets"),
          array_join(sort_array(collect_list(col("asset_id")))
            .cast("array<string>"), ",").as("assets"))
        .filter(col("n_assets") >= 2)
    }),

    // composition: stub-decoded features -> nearest-neighbor assets by the
    // native cosine expression (decode feeds ANN with no intermediate
    // materialization — one plan end to end). Oracle-hashed: the stub's
    // float windowed-mean features replay exactly in DuckDB REAL math
    // (see oracleSql), so the decode→ANN composition is hash-checked.
    "m04_feature_knn" -> ((s, d) => {
      val assets = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val feats = Multimodal.extractFeatures(assets, "doc_id", "payload")
        .toDF()
        .select(col("assetId"), col("features").cast("array<double>").as("v"))
      graft.queries.Similarity.bruteForceTopK(
        feats, feats.filter(col("assetId") < 3), "assetId", "v", k = 5)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m07_silence_trim" ->
      ("WITH d0 AS (SELECT doc_id, text, len(text) AS n FROM documents " +
        "WHERE len(text) > 0), " +
        "win AS (SELECT doc_id, CAST(i AS INT) AS w_idx, " +
        "substr(text, CAST(i * 16 + 1 AS INT), 16) AS seg " +
        "FROM d0, UNNEST(range(0, CAST(floor((n - 1) / 16) AS BIGINT) + 1)) AS u(i)), " +
        "w2 AS (SELECT doc_id, w_idx, len(seg) AS seg_len, " +
        "(len(seg) - len(replace(seg, ' ', ''))) * 2 >= len(seg) AS silent FROM win), " +
        "runs AS (SELECT doc_id, " +
        "w_idx - row_number() OVER (PARTITION BY doc_id ORDER BY w_idx) AS grp " +
        "FROM w2 WHERE NOT silent), " +
        "agg1 AS (SELECT doc_id, count(*) AS n_windows, " +
        "CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT) AS n_silent, " +
        "CAST(sum(CASE WHEN NOT silent THEN seg_len ELSE 0 END) AS BIGINT) AS voiced_chars " +
        "FROM w2 GROUP BY doc_id), " +
        "agg2 AS (SELECT doc_id, CAST(max(cnt) AS BIGINT) AS longest_voiced FROM " +
        "(SELECT doc_id, grp, count(*) AS cnt FROM runs GROUP BY doc_id, grp) " +
        "GROUP BY doc_id) " +
        "SELECT a.doc_id, a.n_windows, a.n_silent, " +
        "COALESCE(b.longest_voiced, 0) AS longest_voiced, a.voiced_chars " +
        "FROM agg1 a LEFT JOIN agg2 b USING (doc_id) ORDER BY a.doc_id"),

    "m01_binary_meta" ->
      // DuckDB 1.0 md5() only takes VARCHAR; the payload is the UTF-8
      // encoding of `text`, so md5(text) hashes the identical bytes
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "md5(text) AS digest FROM documents"),

    // documents.text is pure ASCII at every SF (octet_length = length for
    // all rows), so ord(char at i) IS byte i of the UTF-8 payload — the
    // stub's position-weighted arithmetic replays exactly over VARCHAR.
    "m02_decode_features" ->
      ("""WITH bytes AS (
         |  SELECT doc_id,
         |         unnest(generate_series(1, length(text))) AS i
         |  FROM documents
         |), vals AS (
         |  SELECT b.doc_id,
         |         sum(ord(substring(d.text, b.i, 1)) * (1 + (b.i - 1) % 97)) AS h,
         |         sum(ord(substring(d.text, b.i, 1))) AS sb,
         |         any_value(length(d.text)) AS len
         |  FROM bytes b JOIN documents d USING (doc_id)
         |  GROUP BY b.doc_id
         |)
         |SELECT d.doc_id AS asset_id,
         |       CAST(length(d.text) AS BIGINT) AS n_bytes,
         |       CAST(64 + COALESCE(v.h, 0) % 1024 AS INT) AS width,
         |       CAST(64 + ((COALESCE(v.h, 0) % 1048576) * 2654435761 % 2147483647) % 1024 AS INT) AS height,
         |       CASE WHEN length(d.text) % 2 = 0 THEN 'even' ELSE 'odd' END AS format,
         |       CAST(CASE WHEN length(d.text) = 0 THEN 0
         |            ELSE floor((v.sb::DOUBLE / v.len) * 10000) END AS BIGINT) AS mean_e4
         |FROM documents d LEFT JOIN vals v USING (doc_id)""".stripMargin),

    "m05_resize" ->
      ("""WITH docs AS (SELECT * FROM documents WHERE length(text) > 0),
         |b AS (
         |  SELECT doc_id, unnest(generate_series(1, length(text))) AS i
         |  FROM docs
         |), v AS (
         |  SELECT b.doc_id,
         |         CAST(((b.i - 1) * 16) // length(d.text) AS INT) AS p,
         |         ord(substring(d.text, b.i, 1)) AS byte
         |  FROM b JOIN docs d USING (doc_id)
         |), pools AS (
         |  SELECT doc_id, p, CAST(sum(byte) // count(*) AS INT) AS px
         |  FROM v GROUP BY 1, 2
         |)
         |SELECT p.doc_id AS asset_id,
         |       CAST(length(d.text) AS BIGINT) AS n_bytes,
         |       md5(array_to_string(list(p.px ORDER BY p.p), ',')) AS pixels_md5
         |FROM pools p JOIN docs d USING (doc_id)
         |GROUP BY p.doc_id, length(d.text)""".stripMargin),

    "m06_phash_dups" ->
      ("""WITH docs AS (SELECT * FROM documents WHERE length(text) > 0),
         |b AS (
         |  SELECT doc_id, unnest(generate_series(1, length(text))) AS i
         |  FROM docs
         |), v AS (
         |  SELECT b.doc_id,
         |         CAST(((b.i - 1) * 16) // length(d.text) AS INT) AS p,
         |         ord(substring(d.text, b.i, 1)) AS byte
         |  FROM b JOIN docs d USING (doc_id)
         |), pools AS (
         |  SELECT doc_id, p, CAST(sum(byte) // count(*) AS INT) AS px
         |  FROM v GROUP BY 1, 2
         |), tot AS (
         |  SELECT doc_id, CAST(sum(px) AS BIGINT) AS tot FROM pools GROUP BY 1
         |), bits AS (
         |  SELECT p.doc_id,
         |         CAST(sum(CASE WHEN p.px * 16 > t.tot
         |                       THEN (CAST(1 AS BIGINT) << p.p)
         |                       ELSE 0 END) AS BIGINT) AS phash
         |  FROM pools p JOIN tot t USING (doc_id) GROUP BY p.doc_id
         |)
         |SELECT phash, count(*) AS n_assets,
         |       array_to_string(list(doc_id ORDER BY doc_id), ',') AS assets
         |FROM bits GROUP BY phash HAVING count(*) >= 2""".stripMargin),

    // The stub's 8 windowed-mean features are pure integer window
    // arithmetic plus two FLOAT divisions (sw.toFloat / len / 255f) —
    // DuckDB REAL division is the same IEEE float32 op (verified: REAL /
    // REAL stays REAL and rounds identically), so the oracle rebuilds the
    // exact feature vectors from the ASCII bytes and replays the brute
    // top-k. Window w of an n-byte payload starts at (w*n) div 8 and
    // spans min(max(1, n div 8), n - start) bytes — floor division, NOT
    // a tiling (gaps appear when 8 ∤ n), so starts/lengths replay
    // explicitly rather than assigning bytes to windows.
    "m04_feature_knn" ->
      ("""WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
         |win AS (
         |  SELECT d.doc_id, w.w, (w.w * d.len) // 8 AS strt,
         |         LEAST(GREATEST(1, d.len // 8),
         |               d.len - (w.w * d.len) // 8) AS wlen
         |  FROM d, (SELECT unnest(generate_series(0, 7)) AS w) w
         |), b AS (
         |  SELECT doc_id, unnest(generate_series(1, len)) AS i FROM d
         |), sums AS (
         |  SELECT win.doc_id, win.w, win.wlen,
         |         sum(ord(substring(d.text, b.i, 1))) AS sw
         |  FROM win
         |  JOIN b ON b.doc_id = win.doc_id
         |        AND b.i > win.strt AND b.i <= win.strt + win.wlen
         |  JOIN d ON d.doc_id = win.doc_id
         |  GROUP BY 1, 2, 3
         |), feats AS (
         |  SELECT doc_id,
         |         list(CAST(CAST(CAST(sw AS REAL) / CAST(wlen AS REAL) AS REAL)
         |              / CAST(255 AS REAL) AS DOUBLE) ORDER BY w) AS v
         |  FROM sums GROUP BY doc_id
         |), q AS (SELECT * FROM feats WHERE doc_id < 3),
         |scored AS (
         |  SELECT q.doc_id AS q_id, f.doc_id AS n_id,
         |         list_cosine_similarity(q.v, f.v) AS cos
         |  FROM q JOIN feats f ON f.doc_id <> q.doc_id
         |), ranked AS (
         |  SELECT q_id, n_id, cos, row_number() OVER
         |    (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
         |  FROM scored
         |)
         |SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim
         |FROM ranked WHERE rank <= 5""".stripMargin),

    // frame sampling touches only LENGTHS (frame i of an n-byte payload
    // spans [i*fs, min((i+1)*fs, n)) with fs = max(1, n div 4)), so the
    // oracle replays the arithmetic without byte access.
    "m03_frame_sample" ->
      ("""WITH t AS (
         |  SELECT doc_id, length(text) AS len,
         |         GREATEST(1, length(text) // 4) AS fs
         |  FROM documents
         |), f AS (
         |  SELECT doc_id, len, fs,
         |         unnest(generate_series(0, LEAST(4, (len + fs - 1) // fs) - 1)) AS frame_idx
         |  FROM t WHERE len > 0
         |)
         |SELECT doc_id AS asset_id, CAST(frame_idx AS INT) AS frame_idx,
         |       CAST(LEAST((frame_idx + 1) * fs, len) - frame_idx * fs AS INT) AS frame_bytes
         |FROM f""".stripMargin)
  )
}
