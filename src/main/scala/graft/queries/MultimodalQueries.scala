package graft.queries

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

    // binary column plumbing: payload bytes + length + content digest
    "m01_binary_meta" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("digest"))),

    // stub decode + feature extraction over binary payloads (rows-only)
    "m02_decode_features" -> ((s, d) => {
      val assets = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(assets, "doc_id", "payload")
        .toDF()
        .select(col("assetId").as("asset_id"), col("nBytes").as("n_bytes"),
          col("width"), col("height"), col("format"),
          round(col("meanByte"), 4).as("mean_byte"))
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

    // composition: stub-decoded features -> nearest-neighbor assets by the
    // native cosine expression (decode feeds ANN with no intermediate
    // materialization — one plan end to end; rows-only)
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
    "m01_binary_meta" ->
      // DuckDB 1.0 md5() only takes VARCHAR; the payload is the UTF-8
      // encoding of `text`, so md5(text) hashes the identical bytes
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "md5(text) AS digest FROM documents")
  )
}
