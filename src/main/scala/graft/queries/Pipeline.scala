package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data-prep pipeline composed from the individual
  * operators: quality gate → exact dedup (keep-first) → token accounting.
  * One declarative plan — Catalyst fuses the quality expressions into the
  * scan, the dedup is the single shuffle, and the output is the "kept"
  * corpus manifest a downstream tokenizer job would consume. At 100 TB
  * this shape is one scan + one shuffle; nothing touches the driver.
  */
object Pipeline extends QueryPack {

  val queries: Map[String, Q] = Map(
    "p01_prep_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = filter(split(trim(col("text")), "\\s+"),
        x => length(x) > 0)
      val quality = docs
        .withColumn("n_tokens", size(toks))
        .withColumn("clean_ratio",
          round(length(regexp_replace(col("text"), "[^a-zA-Z ]", ""))
            .cast("double") / greatest(length(col("text")), lit(1)), 6))
        .filter(col("n_tokens").between(10, 120) && col("clean_ratio") > 0.9)
      val fp = quality.withColumn("fingerprint",
        md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id").asc)
      fp.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "n_tokens", "clean_ratio", "fingerprint")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "p01_prep_pipeline" ->
      ("WITH scored AS (SELECT doc_id, lang, text, " +
        "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0)) AS n_tokens, " +
        "round(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 6) AS clean_ratio " +
        "FROM documents), " +
        "quality AS (SELECT * FROM scored WHERE n_tokens BETWEEN 10 AND 120 AND clean_ratio > 0.9), " +
        "fp AS (SELECT *, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint, " +
        "row_number() OVER (PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) ORDER BY doc_id) AS rn FROM quality) " +
        "SELECT doc_id, lang, n_tokens, clean_ratio, fingerprint FROM fp WHERE rn = 1")
  )
}
