package graft.queries

import org.apache.spark.sql.functions._

import graft.streaming.DocStream

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

  val queries: Map[String, Q] = Map(
    "st01_admission_replay" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val arriving = docs.filter(col("doc_id") % 10 === 0)
      DocStream.dupProbe(arriving, corpus, "doc_id", "text",
          k = 3, perms = 16, bands = 4, threshold = 0.5)
        .groupBy("new_doc", "dup_of", "jaccard")
        .agg(count(lit(1)).as("n_bands"))
    })
  )

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
    }
  )
}
