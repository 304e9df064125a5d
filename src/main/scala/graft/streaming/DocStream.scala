package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Streaming twin of the incremental dedup probe (batch: d14 /
  * `Dedup.minhashIncrementalDups`): documents ARRIVE as a stream and each
  * is checked against a STATIC corpus index as it lands — the online
  * admission filter of an ingesting training-data pipeline ("is this
  * crawled page already in the corpus?").
  *
  * Scale design — the whole query is STATELESS streaming:
  *  - the per-doc MinHash signature is a pure per-row expression (no
  *    streaming aggregation, so no state store and no watermark needed;
  *    an explode+groupBy signature — the batch plan — would key state by
  *    doc id, unbounded on an unbounded stream);
  *  - band buckets explode per row, then candidates come from
  *    STREAM-STATIC equi-joins (no stream-stream state either) against
  *    the corpus index relations produced by the same `portableIndex`
  *    family as the batch side, so streaming and batch verdicts agree
  *    exactly;
  *  - the exact-Jaccard verify is another stream-static join on the
  *    collision candidates only.
  *
  * The per-row signature runs through the fused portable kernels
  * ([[graft.functions.PortableText]]: tokens → k-gram md5-prefix hash set
  * → all permutation minima), so statelessness costs O(tokens · perms)
  * CODEGEN'D work per arriving doc with no shuffle at all; bulk
  * (re)deduplication stays on the batch explode+aggregate plan.
  *
  * A doc colliding with the same corpus doc in several bands emits that
  * pair once per band (dedup would need a state store); downstream either
  * tolerates the dup or adds `dropDuplicatesWithinWatermark` when the
  * stream carries event time.
  */
object DocStream {

  /** Near-dup verdicts for a stream of (idCol, textCol) docs against a
    * static corpus. `corpus` must be the bounded-or-indexed standing
    * relation (at warehouse scale: the materialized index table, not a
    * recomputation). Emits (new_doc, dup_of, jaccard) in append mode. */
  def dupProbe(
      docStream: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      perms: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    require(perms % bands == 0, s"perms ($perms) not divisible by bands ($bands)")
    val rows = perms / bands
    val coefs = Dedup.portableCoefs(perms)

    // corpus side: the same index the batch probe uses (band buckets +
    // shingle sets) — static DataFrames, joined per micro-batch
    val (corpusDoc, corpusBanded) =
      Dedup.portableIndex(corpus, idCol, textCol, k, perms, bands)

    // per-row shingle set + signature via the fused portable kernels
    // (PortableShingles/MinHashOverSet): same k-gram construction as the
    // batch KGrams path and the same md5-prefix hash family, one
    // codegen'd pass per row instead of interpreted
    // array_distinct(transform(…)) + perms × array_min(transform(…)) —
    // values bit-identical (kernel parity is property-tested in
    // PortableTextSpec; the stream/batch agreement below pins it again)
    val toks = graft.functions.TextOps.tokens(col(textCol))
    val sh = graft.functions.PortableText.portable_shingles(toks, k)

    // per-row signature: min over the shingle set per permutation —
    // identical values to the batch explode+min aggregation
    val sigCols = coefs.indices.map { i =>
      element_at(col("sig"), i + 1).as(s"m$i")
    }
    val signed = docStream
      // batch shingleRows silently drops NULL-text docs (null comparisons
      // fail both its branches); match that here or the stream would give
      // such docs an empty-string signature and verdicts would diverge
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("new_doc"), sh.as("sh_n"))
      .withColumn("sig", graft.functions.PortableText
        .minhash_over_set(col("sh_n"), coefs))
      .select(col("new_doc") +: col("sh_n") +: sigCols: _*)

    // same band-bucket strings as the corpus index
    val bandBuckets = array((0 until bands).map(b =>
      concat_ws("-", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)): _*)
    val banded = signed.select(col("new_doc"), col("sh_n"),
        posexplode(bandBuckets))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))

    banded.join(corpusBanded.withColumnsRenamed(
        Map("doc" -> "dup_of", "band" -> "c_band", "bucket" -> "c_bucket")),
        col("band") === col("c_band") && col("bucket") === col("c_bucket"))
      .join(corpusDoc.select(col("doc").as("dup_of"), col("sh").as("sh_c")),
        "dup_of")
      .withColumn("n_common", size(array_intersect(col("sh_n"), col("sh_c"))))
      .withColumn("n_union",
        size(col("sh_n")) + size(col("sh_c")) - col("n_common"))
      .withColumn("jaccard",
        round(col("n_common").cast("double") / col("n_union"), 6))
      .filter(col("jaccard") >= threshold)
      .select("new_doc", "dup_of", "jaccard")
  }
}
