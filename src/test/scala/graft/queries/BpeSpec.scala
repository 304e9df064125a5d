package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** BPE trainer semantics, hand-verified on a toy corpus (the t18 query has
  * no SQL oracle — iterative training — so this spec carries its
  * correctness): merge order follows pair frequency with lexicographic
  * ties, merges apply left-to-right, and per-doc subword counts match a
  * hand computation.
  */
class BpeSpec extends SparkSpecBase {

  test("merges are learned by weighted pair frequency, ties lexicographic") {
    import spark.implicits._
    // vocab: "aa" ×3, "ab" ×1  →  pair (a,a) weight 3, (a,b) weight 1
    val docs = Seq((1L, "aa ab"), (2L, "aa aa")).toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeMerges(docs, "text", nMerges = 2)
    assert(merges == Seq(("a", "a"), ("a", "b")), s"merges=$merges")
    val counts = vocab.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // after (a,a): "aa" → [aa]; after (a,b): "ab" → [ab]
    assert(counts == Map("aa" -> 1, "ab" -> 1), s"vocab=$counts")
  }

  test("left-to-right merge application: overlapping pairs don't double-merge") {
    import spark.implicits._
    // "aaa" = [a,a,a]: one (a,a) merge gives [aa,a] — the first pair wins,
    // the overlapping second (a,a) must NOT also fire
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeMerges(docs, "text", nMerges = 1)
    assert(merges == Seq(("a", "a")))
    val counts = vocab.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(counts == Map("aaa" -> 2), s"vocab=$counts")
  }

  test("training stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    // all words are single symbols: zero pairs, zero merges, no crash
    val (merges, vocab) = TextAnalysis.bpeMerges(docs, "text", nMerges = 4)
    assert(merges.isEmpty)
    assert(vocab.collect().forall(_.getInt(1) == 1))
  }

  test("t18 per-doc subword counts match a hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab"), (2L, "abab abab cd")).toDF("doc_id", "text")
    // vocab: abab ×3, ab ×1, cd ×1. pairs: (a,b) 3+3+1=7? — abab has
    // (a,b) twice per occurrence: weights: abab contributes (a,b)×2·3,
    // (b,a)×1·3; ab contributes (a,b)×1 → (a,b)=7, (b,a)=3, (c,d)=1
    // merge 1: (a,b) → abab=[ab,ab], ab=[ab], cd=[c,d]
    // merge 2: pairs now (ab,ab)=3, (c,d)=1 → (ab,ab) → abab=[abab]
    val (merges, vocab) = TextAnalysis.bpeMerges(docs, "text", nMerges = 2)
    assert(merges == Seq(("a", "b"), ("ab", "ab")), s"merges=$merges")
    val counts = vocab.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(counts == Map("abab" -> 1, "ab" -> 1, "cd" -> 2), s"vocab=$counts")

    // doc 1 = abab(1) + ab(1) = 2; doc 2 = abab(1)×2 + cd(2) = 4
    val q = docs.select(col("doc_id"), explode(
        filter(split(lower(trim(col("text"))), "\\s+"), x => length(x) > 0))
        .as("w"))
      .join(vocab, "w")
      .groupBy("doc_id")
      .agg(sum(col("n_bpe")).as("n_bpe_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q == Map(1L -> 2L, 2L -> 4L), s"counts=$q")
  }
}
