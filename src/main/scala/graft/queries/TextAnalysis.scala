package graft.queries

import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All operators are pure column expressions (`org.apache.spark.sql.functions`)
  * so they stay inside whole-stage codegen and scale linearly with no
  * shuffle: at 100 TB each is a map-only pass over the corpus. Oracles are
  * expressed with the exact same integer/string semantics in DuckDB SQL, so
  * every operator here is hash-checked (no rows-only entries).
  *
  * The reference has no text surface (SURVEY.md §2.4 [absent]); these are the
  * extension operators called for by the builder prompt (SURVEY.md §7.1 M5).
  */
object TextAnalysis extends QueryPack {

  /** Whitespace token count as a reusable Column expression. Empty/blank
    * text counts 0 (`split` on blank yields one empty token — filtered). */
  private def tokenCount(c: org.apache.spark.sql.Column) =
    size(graft.functions.TextOps.tokens(c, lowercase = false))

  val queries: Map[String, Q] = Map(

    // token counting: whitespace tokens + a BPE-ish subword proxy
    // (4 chars ≈ 1 token, the common rule of thumb) + distinct token count.
    "t01_token_count" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(graft.functions.TextOps
          .tokens(col("text"), lowercase = false))).as("n_distinct_tokens"),
        floor(length(col("text")) / 4).cast("int").as("n_tokens_bpe_est"))),

    // quality scoring: integer counts + one ratio, all deterministic.
    // All four char-class counts come from ONE fused byte scan
    // (AsciiClassCounts) instead of four full
    // `length(regexp_replace(text, "[^…]", ""))` regex passes + string
    // rebuilds per row, and the stopword count is a codegen'd kernel
    // instead of the interpreted `filter(split(…), isin)` lambda
    // (CLAUDE.md's transform trap) — counts identical by construction
    // (byte < 0x80 ⇔ ASCII codepoint; split(trim,"\\s+") ≡ tokens()
    // modulo empties, which are never in the stop set), oracle-hashed.
    "t02_quality_score" -> ((s, d) => {
      val cc = graft.functions.TextOps.ascii_class_counts(col("text"), Seq(
        ".!?",
        ('a' to 'z').mkString,
        ('A' to 'Z').mkString,
        ('a' to 'z').mkString + ('A' to 'Z').mkString + " "))
      t(s, d, "documents")
        .select(col("doc_id"), col("text"), cc.as("cc"))
        .select(
          col("doc_id"),
          length(col("text")).as("n_chars_m"),
          tokenCount(col("text")).as("n_tokens"),
          col("cc")(0).as("n_sentence_punct"),
          col("cc")(1).as("n_lower"),
          col("cc")(2).as("n_upper"),
          graft.functions.TextOps.count_tokens_in(
            graft.functions.TextOps.tokens(col("text"), lowercase = false),
            Seq("the", "a", "of", "and", "to", "in", "is")).as("n_stopwords"),
          round(col("cc")(3).cast("double") /
            greatest(length(col("text")), lit(1)), 6).as("clean_ratio"))
    }),

    // language id: marker-word vote (n-gram heuristic degenerate to word
    // markers — the corpus is synthetic so markers are the honest signal).
    "t03_lang_id" -> ((s, d) => {
      val txt = concat(lit(" "), col("text"), lit(" "))
      t(s, d, "documents").select(
        col("doc_id"),
        col("lang"),
        when(txt.contains(" the ") || txt.contains(" and "), "en")
          .when(txt.contains(" der ") || txt.contains(" und "), "de")
          .when(txt.contains(" el ") || txt.contains(" los "), "es")
          .when(txt.contains(" le ") || txt.contains(" les "), "fr")
          .otherwise("unknown").as("lang_guess"))
    }),

    // document fingerprint: md5 over whitespace-normalized lowercase text —
    // the exact-dedup key. (Rolling-hash shingle fingerprints live in the
    // Dedup pack where they feed MinHash.)
    "t04_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(graft.functions.TextOps.collapse_ws(lower(col("text")))).as("fingerprint"))),

    // corpus bigram frequencies: the n-gram analysis pass. Per-row fused
    // Bigrams kernel + explode + hash-agg — ONE shuffle (the count), no
    // sort. The earlier posexplode + window-lead spelling sort-shuffled
    // the entire corpus token stream by doc_id just to look one slot
    // ahead (the round-4 minhash lesson; ~2x measured) — same gram
    // strings, so the result is identical.
    "t06_bigrams" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      t(s, d, "documents")
        .select(explode(graft.functions.TextOps.bigrams(toks)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 30)
        .orderBy("bigram")
    }),

    // PII / URL scrubbing: the pre-training redaction pass. Patterns kept
    // to the regex subset Java and RE2 interpret identically.
    "t07_redact" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
          "https?://[^ ]+", "<URL>").as("redacted"),
        (length(col("text")) - length(regexp_replace(col("text"),
          "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "")))
          .as("email_chars"))),

    // corpus length histogram: 100-char buckets — the size-distribution
    // report used to pick truncation/packing lengths
    "t08_length_hist" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(floor(length(col("text")) / 100).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(length(col("text"))).as("min_chars"),
          max(length(col("text"))).as("max_chars"))
        .orderBy("bucket")),

    // reproducible sampling: hash the key, keep a hex-prefix range — the
    // deterministic, engine-portable, cluster-stable way to sample (rand()
    // depends on partitioning; hash sampling doesn't, and the same row set
    // is selected on any engine or rerun). ~25% sample: first hex digit
    // of md5 < '4'.
    "t09_hash_sample" -> ((s, d) =>
      t(s, d, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "4")
        .select("doc_id", "lang", "n_chars")),

    // stratified mixing: per-source sample rates (the "temperature" knob
    // of corpus mixing) via per-source hash thresholds, then audit counts
    "t10_stratified_sample" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("h", substring(md5(col("doc_id").cast("string")), 1, 2))
        // src0/src1 keep ~50% ('00'..'7f'), everything else ~12.5%
        // ('00'..'1f'). Same boolean shape as the oracle SQL so NULL
        // sources behave identically (dropped) in both engines.
        .filter((col("source").isin("src0", "src1") && col("h") < "80") ||
          (!col("source").isin("src0", "src1") && col("h") < "20"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("source")),

    // TEMPERATURE-scaled corpus mixing (the multilingual-sampling alpha
    // knob): target per-source shares ∝ n_s^0.5, realized as DATA-DRIVEN
    // acceptance rates against a half-corpus budget, applied by
    // deterministic hash threshold. Unlike t10 (operator-chosen constant
    // rates), the rates here are computed from the corpus itself — the
    // two-phase plan a 100 TB mixer runs: one map-side-partial count per
    // source, a bounded rates relation joined back (AQE broadcasts it),
    // one corpus-scan filter. The 1-row totals use an explicit broadcast
    // (bounded by construction); rates are rounded to 1e-6 before
    // thresholding so ulp-level sum-order differences between engines
    // cannot move an acceptance boundary.
    "t20_mixture_resample" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(
        sum(sqrt(col("n_docs").cast("double"))).as("z"),
        sum(col("n_docs")).as("n_total"))
      // rates is BOUNDED (one row per source) but consumed by two branches
      // with different column pruning — without a cut, each branch re-runs
      // the corpus-counts aggregate (two extra full passes at scale).
      // localCheckpoint materializes the tiny relation once; both the
      // audit output and the per-doc probe read the blocks.
      val rates = counts.crossJoin(broadcast(tot))
        .withColumn("rate", round(least(lit(1.0),
          sqrt(col("n_docs").cast("double")) / col("z")
            * (col("n_total").cast("double") * 0.5) / col("n_docs")), 6))
        .select("source", "n_docs", "rate")
        .localCheckpoint()
      val sampled = docs.select(col("source"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long").as("h"))
        .join(rates, Seq("source"))
        .filter(col("h") < floor(col("rate") * 4294967296.0).cast("long"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("rate"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("source")
    }),

    // TF-IDF-style distinctive terms: top-3 terms per doc by
    // tf × (N / df). N/df is a monotone transform of classic ln(N/df),
    // so the RANKING is identical to tf-idf while staying in IEEE
    // division (exactly rounded on every engine) — ln() differs by ulps
    // between libm implementations and would flake the oracle hash.
    "t11_tfidf_terms" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 50)
      val toks = docs.select(col("doc_id"),
        explode(graft.functions.TextOps.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score_raw").desc, col("tok").asc)
      tf.join(dfreq, "tok")
        .crossJoin(broadcast(n))
        .withColumn("score_raw",
          col("tf") * col("n_docs").cast("double") / col("df"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("tok"),
          round(col("score_raw"), 6).as("score"))
    }),

    // fuzzy string matching: Levenshtein edit distance over a bounded
    // pair space (first-token blocking keeps the self-join from going
    // O(n²) — same discipline as the LSH pipelines). Both engines
    // implement the identical DP, so distances hash-match exactly.
    "t12_edit_distance" -> ((s, d) => {
      val names = t(s, d, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), col("p_name"),
          substring_index(col("p_name"), " ", 1).as("blk"))
      val a = names.alias("a")
      val b = names.alias("b")
      a.join(b, col("a.blk") === col("b.blk") &&
          col("a.p_partkey") < col("b.p_partkey"))
        .select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          levenshtein(col("a.p_name"), col("b.p_name")).as("edit_dist"))
        .filter(col("edit_dist") <= 12)
    }),

    // repetition detection (the duplicate-n-gram quality rule): fraction
    // of 3-gram occurrences that are repeats of an earlier 3-gram in the
    // same doc. High ratio = boilerplate/looping text. Fully per-row via
    // the fused KGrams kernel: size(grams) / size(array_distinct(grams))
    // — ZERO shuffles (grams never leave the row). The earlier
    // posexplode + window-lead spelling sort-shuffled the whole corpus
    // token stream per doc; gram strings are identical so the result is
    // unchanged.
    "t13_repetition" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      // NB: KGrams emits one whole-sequence gram when n < k (the minhash
      // convention), so the <3-token docs must be dropped on token count,
      // not on gram count, to match the windowed formulation.
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"),
          graft.functions.TextOps.kgrams(col("t"), 3).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .withColumn("dup_ratio",
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
        .select("doc_id", "n_grams", "n_distinct", "dup_ratio")
    }),

    // token-window CHUNKING: split each doc into 64-token chunks with
    // 16-token overlap (stride 48) — the context-window packing step
    // before tokenization/training export. explode(sequence) over the
    // per-doc chunk count (a few entries, so the interpreted sequence
    // lambda is negligible) + codegen'd slice/concat per chunk; rows
    // pipeline with no shuffle. The md5 digest makes chunk CONTENT
    // (not just boundaries) oracle-checked.
    "t14_chunking" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("t"))
        .withColumn("n", size(col("t")))
        .filter(col("n") > 0)
        // n_chunks = ceil(n/48) = floor((n-1)/48) + 1 for n > 0
        .withColumn("chunk_idx",
          explode(sequence(lit(0), floor((col("n") - 1) / 48).cast("int"))))
        .withColumn("chunk",
          slice(col("t"), col("chunk_idx") * 48 + 1, lit(64)))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("digest"))
    }),

    // Gopher/C4-style quality RULES: token-level heuristics (mean word
    // length, most-frequent-token dominance, duplicate-token fraction)
    // plus the pass/fail gate a filtering pipeline applies before
    // training. One explode + two hash aggregations (token counts per
    // doc, then per-doc rollup) — map-side partials carry both; ratios
    // are single IEEE divisions so the DuckDB oracle hash-matches.
    "t15_gopher_rules" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      // every output is a PER-DOC integer over the row's own token array,
      // so the aggregate spelling (explode → groupBy(doc, tok) →
      // groupBy(doc)) shuffled the entire corpus token stream TWICE to
      // rebuild per-row facts — the fused TokenStats kernel computes the
      // identical integers in one narrow pass, ZERO exchanges. Docs with
      // no tokens vanish from the explode formulation, so filter them.
      val perDoc = t(s, d, "documents")
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"),
          graft.functions.TextOps.token_stats(col("t")).as("st"))
        .select(col("doc_id"),
          col("st")("n_tokens").as("n_tokens"),
          col("st")("n_distinct").as("n_distinct"),
          col("st")("top_n").as("top_n"),
          col("st")("sum_len").as("sum_len"))
      val mwl = col("sum_len").cast("double") / col("n_tokens")
      val topr = col("top_n").cast("double") / col("n_tokens")
      perDoc.select(
        col("doc_id"),
        col("n_tokens"),
        round(mwl, 6).as("mean_word_len"),
        round(topr, 6).as("top_tok_ratio"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_tok_ratio"),
        (col("n_tokens") >= 10 && col("n_tokens") <= 100000 &&
          mwl >= 2.0 && mwl <= 12.0 && topr <= 0.20)
          .cast("int").as("passes"))
    }),

    // bigram-LM quality proxy (perplexity stand-in): fraction of a doc's
    // bigram transitions that are RARE in the whole corpus (< 3
    // occurrences). A doc full of transitions no other doc makes is
    // gibberish; a doc of only-common transitions is boilerplate. Counts
    // stay integers (sums of doubles would be order-dependent across
    // engines); the corpus LM is the bigram-count aggregate, joined back
    // to the doc's bigrams on the same key — both sides exchange on
    // `bigram`, so AQE reuses one shuffle. Bigram pairing is the fused
    // Bigrams kernel (one narrow projection per doc) rather than
    // posexplode + window lead, which would sort-shuffle the whole token
    // stream by doc_id just to look one array slot ahead.
    // O(total tokens) end to end.
    "t16_rare_bigrams" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      val bg = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextOps.bigrams(toks)).as("bigram"))
      val lm = bg.groupBy("bigram").agg(count(lit(1)).as("cf"))
      bg.join(lm, "bigram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("cf") < 3, 1L).otherwise(0L)).as("n_rare"))
        .withColumn("rare_ratio",
          round(col("n_rare").cast("double") / col("n_transitions"), 6))
        .select("doc_id", "n_transitions", "n_rare", "rare_ratio")
    }),

    // sequence PACKING: assign docs to fixed-budget training bins (4096
    // tokens) by a running per-language token total — the deterministic
    // batch-packing step before export. A naive window
    // `sum OVER (PARTITION BY lang ORDER BY doc_id)` collapses
    // parallelism to n_languages (few groups × the whole corpus — the
    // banned top-k-per-group shape), so the prefix sum is TWO-PHASE:
    // per-(lang, id-range-bucket) partial sums (hash agg, fully
    // parallel), a window over the tiny bucket relation for the bucket
    // offsets, then a within-bucket cumsum windowed by (lang, bucket) —
    // many small groups. Identical integers, no collapsed stage.
    "t17_packing" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, d, "documents")
        .select(col("lang"), col("doc_id"),
          tokenCount(col("text")).as("n_tokens"))
        .withColumn("bkt", floor(col("doc_id") / 1000))
      val offsets = toks.groupBy("lang", "bkt")
        .agg(sum(col("n_tokens")).as("bt"))
        .withColumn("off", coalesce(sum(col("bt")).over(
          Window.partitionBy(col("lang")).orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
        .select("lang", "bkt", "off")
      val within = Window.partitionBy(col("lang"), col("bkt"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("wc", coalesce(sum(col("n_tokens")).over(within), lit(0)))
        .join(offsets, Seq("lang", "bkt"))
        // bin = floor(tokens-before-this-doc / 4096): a doc starts a new
        // bin when the running total crosses the budget boundary
        .withColumn("bin", floor((col("off") + col("wc")) / 4096).cast("int"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"))
        .orderBy("lang", "bin")
    }),

    // real BPE token counting: train 16 byte-pair merges on the corpus
    // word vocabulary (see bpeMerges — the whitespace/4-chars estimates
    // in t01 are the cheap proxies; this is the honest subword count),
    // then count each doc's subword tokens by joining its words against
    // the trained vocab. The corpus pass is explode + join + sum; the
    // vocab side is word-distinct (bounded far below the corpus) with no
    // broadcast hint — statistics/AQE pick the strategy. Rows-only:
    // iterative training has no SQL oracle; BpeSpec hand-verifies the
    // merge semantics and counts on a toy corpus.
    "t18_bpe_tokens" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val (_, vocab) = bpeMerges(docs, "text", nMerges = 16)
      val toks = graft.functions.TextOps.tokens(col("text"))
      docs.select(col("doc_id"), explode(toks).as("w"))
        .join(vocab, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_bpe")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // approximate HEAVY HITTERS: the top-20 most frequent tokens via a
    // SpaceSaving sketch (64 counters) — the frequent-items member of
    // the sketch toolbox next to q36's HLL/KLL. The exact formulation
    // (groupBy token + global sort) shuffles every distinct token; the
    // sketch ships 64 counters per partition and guarantees
    // count−error ≤ f ≤ count, with anything above n/64 always present.
    // Rows-only: merge order varies with scheduling, so estimates are
    // run-dependent within the bound; SpaceSavingSpec pins the bounds.
    "t19_heavy_hitters" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      t(s, d, "documents")
        .select(explode(toks).as("tok"))
        .agg(graft.functions.SpaceSavingSketch
          .space_saving(col("tok"), 64).as("sketch"))
        .select(posexplode(col("sketch")).as(Seq("pos", "e")))
        .filter(col("pos") < 20)
        .select((col("pos") + 1).as("rank"), col("e.item").as("token"),
          col("e.count").as("est_count"), col("e.error").as("max_err"))
    }),

    // EXACT-REGIME twin of t19 (the d03→d07 pattern applied to sketches):
    // the SAME SpaceSaving aggregate, over a key domain (event_type, 5
    // values) strictly smaller than the counter capacity. Below capacity
    // the sketch never evicts, partial sketches hold exact counts with
    // error 0, and merges sum exactly regardless of scheduling order — so
    // the sketch output is deterministic and the DuckDB oracle (an exact
    // GROUP BY) hash-checks the insert/merge/sort machinery end to end.
    // t19 stays rows-only: it exercises the over-capacity regime whose
    // estimates are scheduling-dependent within the proven bound.
    "t22_heavy_exact" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type").as("item"))
        .agg(graft.functions.SpaceSavingSketch
          .space_saving(col("item"), 64).as("sketch"))
        .select(posexplode(col("sketch")).as(Seq("pos", "e")))
        .filter(col("pos") < 20)
        .select((col("pos") + 1).as("rank"), col("e.item").as("item"),
          col("e.count").as("est_count"), col("e.error").as("max_err"))
    }),

    // corpus-derived STOPWORD STRIPPING (the CCNet/C4 boilerplate-removal
    // step): rank tokens by document frequency, take the top 10
    // (deterministic df-desc, token-asc tie-break), and emit each doc
    // with those tokens REMOVED — order preserved, content digest-checked
    // so the oracle verifies the cleaned text, not just counts. The stop
    // set folds to a ONE-ROW array (TakeOrderedAndProject → collect_list;
    // the broadcast hint is policy-legal on a 1-row aggregate) and the
    // corpus pass is NARROW: the fused RemoveTokens kernel filters each
    // doc's token array in place, so the only shuffles are the two inside
    // the df ranking — the explode → anti-join → collect_list(struct) →
    // array_sort reassembly (two more corpus-wide shuffles to rebuild an
    // order the input array never lost) is gone.
    "t21_stopword_strip" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      val docs = t(s, d, "documents")
      val dfreq = docs.select(col("doc_id"), explode(toks).as("tok"))
        .distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val stopArr = dfreq.orderBy(col("df").desc, col("tok").asc).limit(10)
        .agg(collect_list(col("tok")).as("stop"))
      val kept = graft.functions.TextOps.remove_tokens(col("toks"), col("stop"))
      docs
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
          toks.as("toks"))
        .crossJoin(broadcast(stopArr))
        .select(col("doc_id"), col("n_tokens"),
          coalesce(size(kept).cast("long"), lit(0L)).as("n_kept"),
          md5(concat_ws(" ", kept)).as("clean_digest"))
    }),

    // corpus-level stats: tokens and length percentiles per language —
    // the "what's in this corpus" report; partial aggregation map-side.
    "t05_corpus_stats" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"),
          min(length(col("text"))).as("min_chars"),
          max(length(col("text"))).as("max_chars"),
          sum(tokenCount(col("text"))).as("total_tokens"))
        .orderBy("lang")),

    // model-scored quality CLASSIFIER: a linear model with FIXED literal
    // weights over per-doc features — the trained-classifier analog of
    // t15's hand rules (fastText-style quality scoring with the model
    // shipped as literals). Features are integer counts and single IEEE
    // divisions; the dot product is a fixed-order double expression, so
    // the score is bit-identical cross-engine and fully oracle-hashed.
    // Selection is global top-100 → TakeOrderedAndProject (bounded heap
    // per partition, no full sort shuffle); map-only otherwise.
    "t23_quality_classifier" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      val nTok = size(toks).cast("double")
      // non-whitespace chars = length − \s-class count (one byte scan, no
      // regex rebuild); stop count via the codegen'd kernel, not the
      // interpreted filter() lambda — identical integers, oracle-hashed
      val meanLen = (length(col("text")) - graft.functions.TextOps
        .ascii_class_counts(col("text"), Seq(" \t\n\u000B\f\r"))(0))
        .cast("double") / nTok
      val stopRatio = graft.functions.TextOps.count_tokens_in(toks,
        Seq("the", "a", "data", "value")).cast("double") / nTok
      val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
      val langBoost = when(col("lang") === "en", 0.05)
        .when(col("lang") === "de", 0.03)
        .when(col("lang") === "es", 0.02)
        .otherwise(0.0)
      val score = lit(-1.2) * stopRatio + lit(0.9) * distinctRatio +
        lit(0.15) * meanLen + lit(0.002) * nTok + langBoost
      t(s, d, "documents")
        .filter(size(toks) > 0)
        .select(col("doc_id"), col("lang"), score.as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(100)
    }),

    // seeded-merge BPE application — t18's d07-pattern twin. t18's merges
    // are TRAINED (driver-side on the capped dictionary) so it is
    // rows-only; this twin applies a FIXED literal merge list, making the
    // whole apply-merges + per-doc subword count path oracle-expressible.
    // Application is fully distributed: every token occurrence is
    // rewritten by a chain of codegen'd string replaces (no vocab join,
    // no driver state), then one hash-agg rollup on doc_id — at 100 TB a
    // map-only pass plus a single shuffle. Left-to-right single-pass BPE
    // semantics are preserved by the '|'-anchored '|a|b|'→'|ab|' DOUBLE
    // replace: adjacent occurrences share a separator so one pass merges
    // every other pair and the second pass the rest — equivalent to
    // bpeMerges' applyMerge for a≠b merges (BpeSpec pins this against
    // the full corpus vocabulary).
    // INVERTED-INDEX keyword search: the posting list (token, doc_id)
    // lives in a GraftTable laid out by `bucket(16, tok)`, and the
    // probe's IN-list predicate prunes to ≤2 of the 16 bucket slices
    // via the manifest's derived-key stats BEFORE Spark plans a file —
    // the "index once, probe per query" pattern where a keyword query
    // reads O(selectivity), not O(corpus). Index build is one explode +
    // hash-distributed write (each bucket written by its own task);
    // conjunctive search = posting intersection via one hash agg on
    // doc_id. The oracle recomputes containment by scanning the raw
    // corpus — proving index-served ≡ full-scan semantics.
    "t27_inverted_index" -> ((s, d) => {
      val idx = Versioned.invertedIndexFixture(s, d)
      val hits = idx.scan(s, Some(col("tok").isin("spark", "join")))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).as("n_terms"))
        .filter(col("n_terms") === 2)
      hits.join(t(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id")
        .select(col("doc_id"), col("n_terms"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // DISTRIBUTED CLASSIFIER TRAINING, oracle-exact: five full-batch
    // gradient steps of a logistic-style model (hard-sigmoid
    // clamp(0.25z+0.5) — no transcendental, so every op is IEEE-exact
    // cross-engine) predicting lang='en' from three quality features.
    // The g01/s12 technique applied to ML training: per-row gradient
    // contributions are quantized to Q20 longs and INTEGER-summed
    // (order-independent under any parallelism), the 4-weight vector is
    // bounded driver state recomputed from the sums with the exact
    // operation sequence the oracle replays, and weights re-quantize to
    // Q20 after every step so both engines carry identical doubles.
    // Per step: ONE hash aggregation over the cached narrow feature
    // relation (4 doubles + label) — at 100 TB, 5 map-reduce passes and
    // 40 bytes of driver state. Output is all-integer (Q20 weights,
    // counts), so the driver hash-match is bulletproof.
    "t26_train_classifier" -> ((s, d) => {
      val Q = 1048576.0 // Q20
      val toks = graft.functions.TextOps.tokens(col("text"))
      val nTok = size(toks).cast("double")
      val feats = t(s, d, "documents")
        .filter(size(toks) > 0)
        .select(
          (graft.functions.TextOps.count_tokens_in(toks,
            Seq("the", "a", "data", "value"))
            .cast("double") / nTok).as("x1"),
          (size(array_distinct(toks)).cast("double") / nTok).as("x2"),
          (nTok / lit(100.0)).as("x3"),
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
        .persist()
      var w = Array(0.0, 0.0, 0.0, 0.0)
      def zExpr = lit(w(0)) + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
      def pExpr = greatest(lit(0.0), least(lit(1.0),
        lit(0.25) * zExpr + lit(0.5)))
      for (_ <- 1 to 5) {
        val err = pExpr - col("y")
        val row = feats.agg(
          count(lit(1)).as("n"),
          sum(floor(err * lit(Q))).as("s0"),
          sum(floor((err * col("x1")) * lit(Q))).as("s1"),
          sum(floor((err * col("x2")) * lit(Q))).as("s2"),
          sum(floor((err * col("x3")) * lit(Q))).as("s3")).head()
        val n = row.getLong(0).toDouble
        w = w.indices.map { j =>
          val sj = row.getLong(1 + j).toDouble
          math.floor((w(j) - (0.5 * (sj / Q) / n)) * Q) / Q
        }.toArray
      }
      val pred = pExpr >= lit(0.5)
      val correct = (pred && col("y") === 1.0) || (!pred && col("y") === 0.0)
      feats.agg(
        count(lit(1)).as("n_docs"),
        sum(when(correct, 1L).otherwise(0L)).as("n_correct"))
        .select(
          lit(math.floor(w(0) * Q).toLong).as("w0_q"),
          lit(math.floor(w(1) * Q).toLong).as("w1_q"),
          lit(math.floor(w(2) * Q).toLong).as("w2_q"),
          lit(math.floor(w(3) * Q).toLong).as("w3_q"),
          col("n_docs"), col("n_correct"))
    }),

    "t24_bpe_seeded" -> ((s, d) => {
      val toks = graft.functions.TextOps.tokens(col("text"))
      val spaced = concat(lit("|"), regexp_replace(col("w"), "(?<=.)", "|"))
      val merged = seededBpeMerges.foldLeft(spaced) { case (c, (a, b)) =>
        val once = replace(c, lit(s"|$a|$b|"), lit(s"|$a$b|"))
        replace(once, lit(s"|$a|$b|"), lit(s"|$a$b|"))
      }
      val nBpe = length(merged) - length(replace(merged, lit("|"))) - 1
      t(s, d, "documents")
        .select(col("doc_id"), explode(toks).as("w"))
        .select(col("doc_id"), nBpe.as("n_bpe"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_bpe")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // per-source document CAPS: the corpus-curation "no source dominates"
    // rule (keep the k best docs per source, rest dropped). With few
    // sources and many docs, row_number() OVER (PARTITION BY source)
    // collapses parallelism to n_sources and sorts every row; the
    // bounded-heap top_k_by_score aggregate keeps O(k) state per source
    // with map-side partials (the s01 lesson — CLAUDE.md top-k policy).
    // Score is n_chars (bigger = better), ties break toward the smaller
    // doc_id inside the heap — exactly row_number(ORDER BY n_chars DESC,
    // doc_id) ≤ k in the oracle.
    "t25_source_cap" -> ((s, d) => {
      val top = t(s, d, "documents")
        .groupBy(col("source"))
        .agg(graft.functions.GraftFunctions.top_k_by_score(
          col("n_chars").cast("double"), col("doc_id"), 10).as("top"))
      top.select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("doc_id"))
    })
  )

  /** The fixed merge list for t24_bpe_seeded (frozen from a 12-merge
    * training run over the corpus vocabulary, then hard-coded — the twin
    * must not retrain). All pairs satisfy a ≠ b, which the anchored
    * double-replace equivalence (see t24) requires. */
  val seededBpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "r"), ("o", "w"), ("s", "t"), ("a", "l"),
    ("a", "r"), ("a", "t"), ("m", "er"), ("p", "ar"), ("u", "p"), ("a", "b"))

  /** Train `nMerges` BPE merges — the byte-pair-encoding trainer, shaped
    * the way production tokenizers train: merges are learned from the
    * (word, count) DICTIONARY capped at the `trainCap` most frequent
    * words (one TakeOrdered job — the sentencepiece/HF recipe; training
    * input is bounded regardless of corpus size), iterated driver-side
    * (O(trainCap · wordLen) per merge — training is inherently
    * sequential, so per-merge cluster round-trips would be pure barrier
    * overhead, the s06-codebook lesson). The learned merges then apply
    * to the FULL corpus-distinct vocabulary as one lazy chained fold —
    * interpreted lambdas, but over the word-distinct relation, never the
    * corpus — and t18's corpus pass is a plain join against that vocab.
    *
    * Pair frequencies count every adjacent position (overlaps included);
    * ties break lexicographically; merge application is left-to-right
    * single-pass — identical semantics driver-side and in the fold
    * (BpeSpec pins both). */
  def bpeMerges(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      nMerges: Int,
      trainCap: Int = 4096): (Seq[(String, String)], org.apache.spark.sql.DataFrame) = {
    val toks = graft.functions.TextOps.tokens(col(textCol))
    val wordCounts = docs
      .select(explode(toks).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // split-to-chars; Spark's split keeps a trailing empty match (the
    // lookahead also fires at end-of-string) — drop it
    def charSplit(c: org.apache.spark.sql.Column) =
      filter(split(c, "(?!^)"), x => length(x) > 0)

    // bounded training dictionary
    val dict: Array[(Array[String], Long)] = wordCounts
      .orderBy(col("cnt").desc, col("w").asc).limit(trainCap)
      .collect()
      .map(r => (r.getString(0).split("(?!^)").filter(_.nonEmpty), r.getLong(1)))

    def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    var words = dict
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    for (_ <- 0 until nMerges if !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) += c
      if (pairCounts.isEmpty) done = true
      else {
        val (a, b) = pairCounts.toSeq
          .maxBy { case ((pa, pb), n) => (n, pa, pb) } (
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
      }
    }

    // apply the learned merges to the full vocab as one lazy chained fold
    val symsCol = merges.foldLeft(charSplit(col("w"))) { case (c, (a, b)) =>
      aggregate(c, array().cast("array<string>"),
        (acc, x) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    }
    (merges.toSeq, wordCounts.select(col("w"), size(symsCol).as("n_bpe")))
  }

  val oracleSql: Map[String, String] = {
    // DuckDB equivalents of the Spark-side expressions, kept in one place so
    // the two stay reviewably in sync.
    val dTok = "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0))"
    val dDistinctTok = "len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> len(x) > 0)))"
    Map(
      "t22_heavy_exact" ->
        ("WITH c AS (SELECT event_type AS item, count(*) AS est_count " +
          "FROM events GROUP BY 1) " +
          "SELECT row_number() OVER (ORDER BY est_count DESC, item ASC) AS rank, " +
          "item, est_count, CAST(0 AS BIGINT) AS max_err FROM c"),
      "t01_token_count" ->
        s"SELECT doc_id, $dTok AS n_tokens, $dDistinctTok AS n_distinct_tokens, CAST(floor(length(text) / 4) AS INT) AS n_tokens_bpe_est FROM documents",
      "t02_quality_score" ->
        (s"SELECT doc_id, length(text) AS n_chars_m, $dTok AS n_tokens, " +
          "length(regexp_replace(text, '[^.!?]', '', 'g')) AS n_sentence_punct, " +
          "length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_lower, " +
          "length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper, " +
          "len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x IN ('the','a','of','and','to','in','is'))) AS n_stopwords, " +
          "round(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 6) AS clean_ratio " +
          "FROM documents"),
      "t03_lang_id" ->
        ("SELECT doc_id, lang, CASE " +
          "WHEN contains(' ' || text || ' ', ' the ') OR contains(' ' || text || ' ', ' and ') THEN 'en' " +
          "WHEN contains(' ' || text || ' ', ' der ') OR contains(' ' || text || ' ', ' und ') THEN 'de' " +
          "WHEN contains(' ' || text || ' ', ' el ') OR contains(' ' || text || ' ', ' los ') THEN 'es' " +
          "WHEN contains(' ' || text || ' ', ' le ') OR contains(' ' || text || ' ', ' les ') THEN 'fr' " +
          "ELSE 'unknown' END AS lang_guess FROM documents"),
      "t04_fingerprint" ->
        "SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint FROM documents",
      "t06_bigrams" ->
        ("WITH toks AS (SELECT list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS l FROM documents), " +
          "bg AS (SELECT unnest(list_transform(range(len(l) - 1), i -> l[i + 1] || ' ' || l[i + 2])) AS bigram FROM toks) " +
          "SELECT bigram, count(*) AS n FROM bg GROUP BY bigram HAVING count(*) >= 30 ORDER BY bigram"),
      "t07_redact" ->
        ("SELECT doc_id, regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'), 'https?://[^ ]+', '<URL>', 'g') AS redacted, " +
          "length(text) - length(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '', 'g')) AS email_chars FROM documents"),
      "t08_length_hist" ->
        ("SELECT CAST(floor(length(text) / 100) AS INT) AS bucket, count(*) AS n_docs, " +
          "min(length(text)) AS min_chars, max(length(text)) AS max_chars " +
          "FROM documents GROUP BY 1 ORDER BY 1"),
      "t09_hash_sample" ->
        ("SELECT doc_id, lang, n_chars FROM documents " +
          "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'"),
      "t10_stratified_sample" ->
        ("SELECT source, count(*) AS n_sampled FROM (" +
          "SELECT source, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h FROM documents) " +
          "WHERE (source IN ('src0','src1') AND h < '80') " +
          "OR (source NOT IN ('src0','src1') AND h < '20') " +
          "GROUP BY source ORDER BY source"),
      "t20_mixture_resample" ->
        ("WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), " +
          "tot AS (SELECT sum(sqrt(CAST(n_docs AS DOUBLE))) AS z, sum(n_docs) AS n_total FROM counts), " +
          "rates AS (SELECT source, n_docs, round(least(1.0, " +
          "sqrt(CAST(n_docs AS DOUBLE)) / z * (CAST(n_total AS DOUBLE) * 0.5) / n_docs), 6) AS rate " +
          "FROM counts, tot), " +
          "smp AS (SELECT d.source, count(*) AS n_sampled FROM documents d JOIN rates r USING (source) " +
          "WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) " +
          "< CAST(floor(r.rate * 4294967296.0) AS BIGINT) GROUP BY d.source) " +
          "SELECT r.source, r.n_docs, r.rate, COALESCE(s.n_sampled, 0) AS n_sampled " +
          "FROM rates r LEFT JOIN smp s USING (source) ORDER BY source"),
      "t11_tfidf_terms" ->
        ("WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50), " +
          "toks AS (SELECT doc_id, u.tok FROM (SELECT doc_id, " +
          "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t " +
          "FROM docs), UNNEST(t) AS u(tok)), " +
          "tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2), " +
          "dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1), " +
          "n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs), " +
          "scored AS (SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df, " +
          "tf.tf * CAST(n.n_docs AS DOUBLE) / dfreq.df AS score_raw " +
          "FROM tf JOIN dfreq USING (tok) CROSS JOIN n), " +
          "ranked AS (SELECT doc_id, tok, score_raw, row_number() OVER " +
          "(PARTITION BY doc_id ORDER BY score_raw DESC, tok ASC) AS rank FROM scored) " +
          "SELECT doc_id, rank, tok, round(score_raw, 6) AS score " +
          "FROM ranked WHERE rank <= 3"),
      "t14_chunking" ->
        ("WITH toks AS (SELECT doc_id, list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t " +
          "FROM documents), " +
          "sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0), " +
          "c AS (SELECT doc_id, t, n, unnest(range(0, (n - 1) // 48 + 1)) AS chunk_idx FROM sized) " +
          "SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, " +
          "CAST(len(t[chunk_idx * 48 + 1 : LEAST(chunk_idx * 48 + 64, n)]) AS INT) AS n_tokens, " +
          "md5(array_to_string(t[chunk_idx * 48 + 1 : LEAST(chunk_idx * 48 + 64, n)], ' ')) AS digest " +
          "FROM c"),
      "t13_repetition" ->
        ("WITH toks AS (SELECT doc_id, list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS t " +
          "FROM documents), " +
          "g3 AS (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g " +
          "FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3) " +
          "SELECT doc_id, count(*) AS n_grams, " +
          "count(DISTINCT g) AS n_distinct, " +
          "round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6) AS dup_ratio " +
          "FROM g3 GROUP BY doc_id"),
      "t12_edit_distance" ->
        ("WITH names AS (SELECT p_partkey, p_name, " +
          "split_part(p_name, ' ', 1) AS blk FROM part WHERE p_partkey <= 200) " +
          "SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, " +
          "levenshtein(a.p_name, b.p_name) AS edit_dist " +
          "FROM names a JOIN names b ON a.blk = b.blk AND a.p_partkey < b.p_partkey " +
          "WHERE levenshtein(a.p_name, b.p_name) <= 12"),
      "t15_gopher_rules" ->
        ("WITH toks AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS tok " +
          "FROM documents), " +
          "pt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2), " +
          "pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
          "count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS top_n, " +
          "CAST(sum(len(tok) * c) AS BIGINT) AS sum_len FROM pt GROUP BY 1) " +
          "SELECT doc_id, n_tokens, " +
          "round(CAST(sum_len AS DOUBLE) / n_tokens, 6) AS mean_word_len, " +
          "round(CAST(top_n AS DOUBLE) / n_tokens, 6) AS top_tok_ratio, " +
          "round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_tok_ratio, " +
          "CAST(n_tokens >= 10 AND n_tokens <= 100000 " +
          "AND CAST(sum_len AS DOUBLE) / n_tokens BETWEEN 2.0 AND 12.0 " +
          "AND CAST(top_n AS DOUBLE) / n_tokens <= 0.20 AS INT) AS passes " +
          "FROM pd"),
      "t16_rare_bigrams" ->
        ("WITH toks AS (SELECT doc_id, list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS l " +
          "FROM documents), " +
          "bg AS (SELECT doc_id, l[i] || ' ' || l[i+1] AS bigram " +
          "FROM toks, UNNEST(range(1, len(l))) AS u(i) WHERE len(l) >= 2), " +
          "cf AS (SELECT bigram, count(*) AS cf FROM bg GROUP BY 1) " +
          "SELECT doc_id, count(*) AS n_transitions, " +
          "CAST(sum(CASE WHEN cf.cf < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare, " +
          "round(CAST(sum(CASE WHEN cf.cf < 3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS rare_ratio " +
          "FROM bg JOIN cf USING (bigram) GROUP BY doc_id"),
      "t17_packing" ->
        (s"WITH toks AS (SELECT lang, doc_id, $dTok AS n_tokens FROM documents), " +
          "binned AS (SELECT lang, doc_id, n_tokens, " +
          "CAST(floor(COALESCE(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096) AS INT) AS bin " +
          "FROM toks) " +
          "SELECT lang, bin, count(*) AS n_docs, " +
          "CAST(sum(n_tokens) AS BIGINT) AS bin_tokens " +
          "FROM binned GROUP BY 1, 2 ORDER BY 1, 2"),
      "t21_stopword_strip" ->
        ("WITH toks AS (SELECT doc_id, list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS l " +
          "FROM documents), " +
          "tr AS (SELECT doc_id, i, l[i] AS tok " +
          "FROM toks, UNNEST(range(1, len(l) + 1)) AS u(i)), " +
          "dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tr GROUP BY 1), " +
          "stop AS (SELECT tok FROM dfreq ORDER BY df DESC, tok ASC LIMIT 10), " +
          "kept AS (SELECT doc_id, count(*) AS n_kept, " +
          "md5(array_to_string(list(tok ORDER BY i), ' ')) AS digest " +
          "FROM tr WHERE tok NOT IN (SELECT tok FROM stop) GROUP BY doc_id) " +
          "SELECT t.doc_id, len(t.l) AS n_tokens, " +
          "COALESCE(k.n_kept, 0) AS n_kept, " +
          "COALESCE(k.digest, md5('')) AS clean_digest " +
          "FROM toks t LEFT JOIN kept k USING (doc_id)"),
      "t05_corpus_stats" ->
        // CAST the integer sums: DuckDB sum(INT) returns HUGEINT, which the
        // driver-side pandas bridge renders as float ("3.0" vs Spark's "3")
        (s"SELECT lang, count(*) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS total_chars, " +
          "min(length(text)) AS min_chars, max(length(text)) AS max_chars, " +
          s"CAST(sum($dTok) AS BIGINT) AS total_tokens FROM documents GROUP BY lang ORDER BY lang"),

      "t23_quality_classifier" ->
        // feature expressions and the weighted sum mirror the Spark side
        // term by term IN ORDER — fixed-order IEEE arithmetic is
        // bit-identical cross-engine, so the double score hash-matches
        ("WITH f AS (SELECT doc_id, lang, " +
          "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS l, " +
          "CAST(len(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS nws " +
          "FROM documents), " +
          "feat AS (SELECT doc_id, lang, " +
          "CAST(len(l) AS DOUBLE) AS n_tok, " +
          "nws / CAST(len(l) AS DOUBLE) AS mean_len, " +
          "CAST(len(list_filter(l, x -> x IN ('the', 'a', 'data', 'value'))) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS stop_ratio, " +
          "CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS distinct_ratio, " +
          "CASE WHEN lang = 'en' THEN 0.05 WHEN lang = 'de' THEN 0.03 " +
          "WHEN lang = 'es' THEN 0.02 ELSE 0.0 END AS lang_boost " +
          "FROM f WHERE len(l) > 0) " +
          "SELECT doc_id, lang, " +
          "-1.2 * stop_ratio + 0.9 * distinct_ratio + 0.15 * mean_len + 0.002 * n_tok + lang_boost AS score " +
          "FROM feat ORDER BY score DESC, doc_id ASC LIMIT 100"),

      "t27_inverted_index" ->
        // full-scan containment recompute: index-served search must
        // return exactly the docs whose token set holds both terms,
        // MINUS the curation-deleted victim (the smallest hit doc —
        // its postings were equality-tombstoned out of the index)
        ("WITH toks AS (SELECT doc_id, n_chars, " +
          "list_distinct(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS t " +
          "FROM documents), " +
          "hits AS (SELECT doc_id, n_chars FROM toks " +
          "WHERE list_contains(t, 'spark') AND list_contains(t, 'join')) " +
          "SELECT doc_id, CAST(2 AS BIGINT) AS n_terms, n_chars FROM hits " +
          "WHERE doc_id <> (SELECT min(doc_id) FROM hits) " +
          "ORDER BY doc_id"),

      "t26_train_classifier" -> {
        // the five gradient steps unrolled as (g_k, w_k) CTE pairs — the
        // weight vector is carried as a ONE-ROW relation cross-joined
        // into each step, every arithmetic op in the same order as the
        // Spark side, gradient sums as integers, weights re-quantized to
        // Q20 per step. MATERIALIZED throughout (the inlining lesson).
        val Q = "1048576.0"
        val z = "(w.a + w.b * x1 + w.c * x2 + w.dd * x3)"
        val p = s"greatest(0.0, least(1.0, 0.25 * $z + 0.5))"
        val xs = Seq("1.0" -> "s0", "x1" -> "s1", "x2" -> "s2", "x3" -> "s3")
        val steps = (1 to 5).map { k =>
          val sums = xs.map { case (x, sn) =>
            val g = if (x == "1.0") "err" else s"(err * $x)"
            s"CAST(sum(CAST(floor($g * $Q) AS BIGINT)) AS DOUBLE) AS $sn"
          }.mkString(", ")
          val upd = Seq("a" -> "s0", "b" -> "s1", "c" -> "s2", "dd" -> "s3")
            .map { case (wn, sn) =>
              s"floor((w.$wn - (0.5 * (g.$sn / $Q) / g.n)) * $Q) / $Q AS $wn"
            }.mkString(", ")
          s"g$k AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n, $sums " +
            s"FROM (SELECT $p - y AS err, x1, x2, x3 " +
            s"FROM feats, w${k - 1} w)), " +
            s"w$k AS MATERIALIZED (SELECT $upd FROM w${k - 1} w, g$k g)"
        }.mkString(", ")
        "WITH f0 AS (SELECT lang, " +
          "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0) AS l " +
          "FROM documents), " +
          "feats AS MATERIALIZED (SELECT " +
          "CAST(len(list_filter(l, x -> x IN ('the', 'a', 'data', 'value'))) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS x1, " +
          "CAST(len(list_distinct(l)) AS DOUBLE) / CAST(len(l) AS DOUBLE) AS x2, " +
          "CAST(len(l) AS DOUBLE) / 100.0 AS x3, " +
          "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y " +
          "FROM f0 WHERE len(l) > 0), " +
          "w0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c, 0.0 AS dd), " +
          steps + ", " +
          s"fin AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(CASE WHEN (p >= 0.5 AND y = 1.0) OR (p < 0.5 AND y = 0.0) " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_correct FROM " +
          s"(SELECT $p AS p, y FROM feats, w5 w)) " +
          s"SELECT CAST(floor(w.a * $Q) AS BIGINT) AS w0_q, " +
          s"CAST(floor(w.b * $Q) AS BIGINT) AS w1_q, " +
          s"CAST(floor(w.c * $Q) AS BIGINT) AS w2_q, " +
          s"CAST(floor(w.dd * $Q) AS BIGINT) AS w3_q, " +
          "fin.n_docs, fin.n_correct FROM w5 w, fin"
      },

      "t24_bpe_seeded" -> {
        // nested anchored double-replace generated from the SAME literal
        // merge list the Spark side folds over (can't drift)
        val bpeExpr = seededBpeMerges.foldLeft(
          "'|' || regexp_replace(w, '(.)', '\\1|', 'g')") { case (e, (a, b)) =>
          s"replace(replace($e, '|$a|$b|', '|$a$b|'), '|$a|$b|', '|$a$b|')"
        }
        s"WITH toks AS (SELECT doc_id, unnest(list_filter(" +
          "regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w " +
          "FROM documents), " +
          s"m AS (SELECT doc_id, $bpeExpr AS c FROM toks) " +
          "SELECT doc_id, count(*) AS n_words, " +
          "CAST(sum(len(c) - len(replace(c, '|', '')) - 1) AS BIGINT) AS n_bpe_tokens " +
          "FROM m GROUP BY doc_id ORDER BY doc_id"
      },

      "t25_source_cap" ->
        ("SELECT source, CAST(rn AS INT) AS rank, doc_id FROM (" +
          "SELECT source, doc_id, " +
          "row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn " +
          "FROM documents) WHERE rn <= 10")
    )
  }
}
