package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float> ×64, label).
  *
  * Scale design:
  *  - brute-force top-k is the exact baseline: the (small) query set is
  *    broadcast against the corpus, so the corpus is scanned ONCE with no
  *    shuffle of the big side; per-query top-k is a bounded O(k)-state
  *    aggregate with map-side partials (TopKByScore), so the scored rows
  *    are reduced in place and parallelism never collapses to the query
  *    count — at 100 TB you'd still cap n_queries per pass (broadcast
  *    width), which is how batch ANN evaluation jobs are run;
  *  - the LSH variant (random-hyperplane sign buckets) is the scale path:
  *    candidates come from a bucket equi-join (shuffle on bucket id,
  *    O(n·probes) rows), then exact rescoring only within buckets. Recall
  *    vs brute force is asserted in SimilaritySpec.
  *
  * Cosine math is a sequential left-to-right fold in double precision
  * (`Dedup.cosineSim`), reproducible across engines — the DuckDB oracle
  * casts to DOUBLE[] to match.
  */
object Similarity extends QueryPack {

  private def vecD(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors for each query vector by brute-force cosine.
    *
    * Top-k selection is the [[graft.functions.TopKByScore]] bounded
    * aggregate, NOT `row_number() OVER (PARTITION BY q_id)`: the window
    * form repartitions every scored row into n_queries tasks (parallelism
    * collapses to the query count and each task sorts its whole slice of
    * the corpus), while the aggregate keeps an O(k) heap per query in
    * every map task and ships only partitions×k rows per query through the
    * shuffle — the corpus-sized scored relation never moves. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxQueries: Int = 1024): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    // the broadcast side must be PROVABLY bounded (the broadcast-policy
    // audit rejects unbounded hinted subtrees): cap the query set per pass
    // — batch ANN jobs loop passes over query chunks anyway
    val q = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
    val scored = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  /** Per-q_id exact top-k of (cos, n_id) rows → (q_id, rank, n_id,
    * cos_sim), identical to the window formulation's output. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions
        .top_k_by_score(col("cos"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("n_id"), round(col("col.score"), 6).as("cos_sim"))

  /** LSH-bucketed approximate top-k: `nTables` independent random-
    * hyperplane tables, `nPlanes` sign bits each. A vector lands in one
    * bucket per table (explode → nTables rows); candidates = bucket
    * collisions in ANY table, deduped, then exactly rescored. More tables
    * → higher recall at linearly more candidate rows — the standard
    * recall/cost dial. Shuffle volume is O(n · nTables), never O(n²). */
  /** The seeded hyperplane tables shared by the Spark query and the DuckDB
    * oracle (both sides embed the SAME literal doubles, so sign-bucketing
    * matches bit for bit — the d06 pattern). */
  private[queries] def lshTables(
      nPlanes: Int, nTables: Int, seed: Long, dim: Int = 64): Seq[Seq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nTables)(Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian())))
  }

  /** Seeded literal coarse-quantizer codebook shared by the Spark query
    * and the DuckDB oracle (the [[lshTables]] pattern applied to IVF). */
  private[queries] def seededCentroids(
      nCentroids: Int, seed: Long, dim: Int = 64): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nCentroids)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Portable-twin IVF (the d03→d07 pattern): the SAME candidate-generation
    * + rescore machinery as [[ivfTopK]] — argmax cell assignment over the
    * corpus, nProbe best cells per query, exact cosine rescoring inside the
    * probed cells, bounded-heap top-k — but the coarse quantizer is a
    * seeded LITERAL codebook instead of trained k-means, so the DuckDB
    * oracle replays assignment, probing, and rescoring end to end and the
    * whole IVF path is hash-checked (the trained variants s05/s08 stay
    * rows-only with recall specs). Cell-membership comparisons go through
    * `round(sim, 6)` on BOTH sides so a 1-ulp cosine difference between
    * engines cannot flip an argmax at a near-tie; the OUTPUT score is the
    * exact cosine rounded at the edge like every other sNN query. */
  def ivfTopKSeeded(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nProbe: Int = 2,
      seed: Long = 23L,
      maxQueries: Int = 1024): DataFrame = {
    // fused-kernel cell assignment (CellAssign — the PqEncode pattern;
    // bit-identical to the composed struct-argmax, ties to the larger
    // cid, rounded sims mirrored in the oracle's ORDER BY)
    val cb = graft.functions.CellAssign.codebook(
      seededCentroids(nCentroids, seed), roundTo = 6)
    val assigned = corpus
      .select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
      .withColumn("cid", graft.functions.CellAssign.cell_argmax(col("n_v"), cb))
    val q = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
      .withColumn("cid",
        explode(graft.functions.CellAssign.cell_topn(col("q_v"), cb, nProbe)))
      .select(col("q_id"), col("q_v"), col("cid"))
    // broadcast the LIMIT-bounded probe side (same rationale as
    // ivfProbeIndexed: nCentroids distinct join keys would collapse a
    // shuffle join's parallelism; broadcast keeps the corpus in place)
    val scored = assigned.join(broadcast(q), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6,
      nTables: Int = 8,
      seed: Long = 11L,
      maxQueries: Int = 1024): DataFrame = {
    // sign-bucket keys per table via the fused HyperplaneBuckets kernel
    // (table index folded into the key; sign semantics identical to the
    // composed when(cosine >= 0) fold — see LshBuckets)
    val fam = graft.functions.LshBuckets.family(lshTables(nPlanes, nTables, seed))
    def buckets(v: Column): Column =
      graft.functions.LshBuckets.hyperplane_buckets(v, fam)

    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
      .withColumn("bucket", explode(buckets(col("n_v"))))
    // bounded broadcast side, same per-pass cap as bruteForceTopK
    val q = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
      .withColumn("bucket", explode(buckets(col("q_v"))))

    // score BEFORE the pair dedup: multi-table collisions of one (q, n)
    // pair produce bit-identical cosines, so deduping after the rescore
    // keeps the same rows while the dedup exchange carries THREE SCALARS
    // per candidate instead of two dim-length vectors (~40x fewer shuffle
    // bytes; the §8 "decide on small rows" rule — the cosine kernel is
    // cheaper than shipping the vectors again)
    val scored = c.join(broadcast(q),
        c("bucket") === q("bucket") && col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
      .select(col("q_id"), col("n_id"), col("cos"))
      .dropDuplicates("q_id", "n_id")
    rankTopK(scored, k)
  }

  /** kNN JOIN: top-k neighbors for EVERY corpus row (vs [[lshTopK]]'s
    * bounded query batch) — the all-to-all shape behind dedup-graph
    * construction and recommendation candidate generation. All-pairs is
    * the trap; the pair space is LSH sign-bucket blocked (collisions in
    * ANY of the tables), deduped per pair, exactly rescored, and reduced
    * with the bounded-heap top-k aggregate — O(n · tables) bucket rows
    * and O(collisions) scored pairs, never O(n²). More planes shrink
    * buckets (recall/cost dial, same as [[lshTopK]]). Seeded literal
    * hyperplanes, so the DuckDB oracle replays blocking + rescoring and
    * the whole join is hash-checked. */
  def knnJoinSeeded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6,
      nTables: Int = 8,
      seed: Long = 11L): DataFrame = {
    val fam = graft.functions.LshBuckets.family(lshTables(nPlanes, nTables, seed))
    def buckets(v: Column): Column =
      graft.functions.LshBuckets.hyperplane_buckets(v, fam)
    val base = corpus.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
    val lb = base.withColumn("bucket", explode(buckets(col("q_v"))))
    val rb = base.select(col("q_id").as("n_id"), col("q_v").as("n_v"))
      .withColumn("bucket", explode(buckets(col("n_v"))))
    // corpus-vs-corpus: both sides shuffle on the bucket key (no
    // broadcast — neither side is bounded). The exact rescore runs
    // BEFORE the per-(q, n) dedup: duplicate collisions across tables
    // yield bit-identical cosines, so the result is unchanged while the
    // dedup exchange ships (q_id, n_id, cos) — three scalars — instead
    // of both dim-length vectors per candidate pair (~40x fewer shuffle
    // bytes at dim=64; the §8 "decide on small rows" rule)
    val scored = lb.join(rb, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
      .select(col("q_id"), col("n_id"), col("cos"))
      .dropDuplicates("q_id", "n_id")
    rankTopK(scored, k)
  }

  val queries: Map[String, Q] = Map(

    // kNN JOIN: LSH-blocked top-3 neighbors for EVERY vector (the
    // dedup-graph/recommendation all-to-all shape) — oracle-hashed end
    // to end via the seeded literal hyperplanes
    "s18_knn_join" -> ((s, d) =>
      knnJoinSeeded(t(s, d, "embeddings"), "vec_id", "embedding", k = 3,
        nPlanes = 8)),

    // exact k-NN for 5 fixed query vectors (vec_id < 5), k = 10
    "s01_knn_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      bruteForceTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
    }),

    // FILTERED vector search (the vector-store "metadata filter"): top-k
    // within the label=3 slice only. PRE-filtering the corpus composes
    // with the scan (the predicate pushes into parquet, the candidate
    // space shrinks BEFORE any distance is computed) — post-filtering a
    // global top-k instead under-fills k whenever the filter is
    // selective. Same bounded-heap aggregate as s01, so the filtered
    // corpus relation never shuffles.
    "s13_knn_filtered" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      bruteForceTopK(emb.filter(col("label") === 3),
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    }),

    // MMR DIVERSIFIED RETRIEVAL (maximal marginal relevance): re-rank the
    // top-50 candidate pool of one query into 10 results that balance
    // relevance against redundancy (λ=0.7) — the diversity-aware
    // retrieval / diverse-subset-selection primitive of a curation
    // pipeline, where plain top-k returns 10 near-copies of the same
    // neighborhood. Scale split: candidate generation is the DISTRIBUTED
    // part (the s01 bounded-heap kernel — corpus never shuffles) and the
    // greedy selection runs driver-side over the POOL-BOUNDED state
    // (50 rows + 50×49 pairwise sims, constant in SF — the localKMeans
    // class of bounded driver work; the greedy argmax chain is inherently
    // sequential). Determinism: relevance and pairwise sims are rounded
    // to 6 decimals by the SAME engine expressions the s01/d06 oracles
    // prove cross-engine exact, and the MMR score is quantized to a Q6
    // LONG via floor(x·1e6) — the identical double multiply/subtract/
    // floor on both engines — so the argmax (mmr_e6 DESC, id ASC) is
    // bit-stable and the whole greedy chain hash-matches the oracle's
    // ten unrolled selection steps.
    "s15_mmr_rerank" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val topk = bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 50)
        .select(col("n_id").as("id"), col("cos_sim").as("rel"))
      val candV = topk.join(
        emb.select(col("vec_id").as("id"), vecD(col("embedding")).as("v")),
        "id")
      val simRows = candV.alias("a")
        .join(candV.alias("b"), col("a.id") =!= col("b.id"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"),
          round(Dedup.cosineSim(col("a.v"), col("b.v")), 6).as("sim"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
      val pool = candV.select(col("id"), col("rel")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val selected = scala.collection.mutable.ArrayBuffer.empty[
        (Int, Long, Double, Long)]
      val chosen = scala.collection.mutable.Set.empty[Long]
      for (rank <- 1 to math.min(10, pool.length)) {
        val best = pool.iterator.filterNot(p => chosen(p._1)).map {
          case (id, rel) =>
            val maxSim =
              if (chosen.isEmpty) 0.0
              else chosen.iterator.map(sid => simRows((id, sid))).max
            (id, rel, math.floor((0.7 * rel - 0.3 * maxSim) * 1e6).toLong)
        }.reduce { (x, y) =>
          if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
        }
        selected += ((rank, best._1, best._2, best._3))
        chosen += best._1
      }
      import s.implicits._
      selected.toSeq.toDF("rank", "vec_id", "rel", "mmr_e6")
    }),

    // HYBRID RETRIEVAL with reciprocal-rank fusion (RRF, k=60): the
    // modern search stack's fusion of a KEYWORD ranking (t27's bucketed
    // posting-list index — terms 'spark','join', ranked by terms-matched
    // then id) with a VECTOR ranking (s01's bounded-heap top-k for query
    // vec 0), full-outer-joined on id, scored 1/(60+rank) per leg.
    // Partial-coverage is the realistic case (only some docs carry
    // embeddings) and RRF handles it natively — a missing leg
    // contributes 0. Both legs select their top-50 via the
    // (score DESC, id ASC) bounded-heap aggregate, so neither ranking
    // ever sorts a corpus-scale relation globally; the fusion join runs
    // on two ≤50-row inputs. All arithmetic is exact (integer ranks,
    // one IEEE division + one sum per leg), so the fused scores
    // hash-match the oracle bit for bit.
    "s16_hybrid_rrf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val vecTop = bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 50)
        .select(col("n_id").as("id"), col("rank").as("vec_rank"))
      val idx = Versioned.invertedIndexFixture(s, d)
      // snapshot 1 = the full pre-curation posting list (snapshot 2
      // tombstones t27's planted victim); the pin keeps this query's
      // oracle the raw-corpus recompute and exercises time travel
      // composing with the bucket-pruned index scan
      val kwTop = idx.scan(s, Some(col("tok").isin("spark", "join")),
          snapshotId = Some(1L))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("tok")).cast("double").as("n_terms"))
        .agg(graft.functions.GraftFunctions
          .top_k_by_score(col("n_terms"), col("doc_id"), 50).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("id"), (col("pos") + 1).as("kw_rank"))
      vecTop.join(kwTop, Seq("id"), "full")
        .select(col("id"),
          (coalesce(lit(1.0) / (lit(60) + col("kw_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
            .as("rrf"),
          coalesce(col("kw_rank"), lit(-1)).as("kw_rank"),
          coalesce(col("vec_rank"), lit(-1)).as("vec_rank"))
        .orderBy(col("rrf").desc, col("id").asc)
        .limit(20)
    }),

    // ANN via sign-LSH buckets — the oracle replicates the bucketing with
    // the same literal hyperplanes, so the approximate result is itself
    // hash-checked; recall vs brute force is asserted in SimilaritySpec
    "s02_knn_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10)
    }),

    // k-means corpus clustering (rows-only: iterative ML, no SQL oracle;
    // SimilaritySpec checks cluster count/coverage)
    "s04_kmeans" -> ((s, d) =>
      kmeansClusters(t(s, d, "embeddings"), "vec_id", "embedding", k = 10)),

    // IVF ANN: k-means cells + nProbe cell rescoring (rows-only — the
    // quantizer is iterative ML; SimilaritySpec bounds recall vs brute
    // force instead)
    "s05_knn_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10)
    }),

    // PQ ANN: codebook-compressed scan + exact re-rank (rows-only — the
    // quantizer is trained k-means; SimilaritySpec bounds recall vs brute
    // force instead)
    "s06_knn_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      pqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10)
    }),

    // IVF-PQ ANN: coarse cells + compressed in-cell scoring + exact
    // re-rank (rows-only: two trained quantizers; SimilaritySpec bounds
    // recall vs brute force)
    "s08_knn_ivfpq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      ivfPqTopK(emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10)
    }),

    // IVF with a SEEDED literal codebook — the oracle-hashed twin of s05
    // (same cell-assign → probe → rescore plan; only the quantizer
    // training differs), so the IVF machinery itself is hash-checked
    "s09_knn_ivf_seeded" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      ivfTopKSeeded(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
    }),

    // INCREMENTALLY-maintained stored IVF index: corpus + index live in
    // versioned graft tables, a new-vector batch refreshes the index via
    // the change feed (O(batch), no rescan/retrain), and the probe scans
    // only the probed cells' files. Seeded quantizer ⇒ incremental union
    // == full rebuild, so the result hash-matches the s09-style oracle
    // computed over the raw corpus
    "s17_incremental_index" -> ((s, d) => incIdxProbe(s, d)),

    // PQ with a SEEDED literal codebook — the oracle-hashed twin of s06
    // (same encode → ADC → rerank-cut → exact-rerank plan; only the
    // codebook training differs), so the PQ machinery itself is
    // hash-checked
    "s10_knn_pq_seeded" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      pqTopKSeeded(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
    }),

    // IVF-PQ with BOTH quantizers seeded — the oracle-hashed twin of s08
    // (same index → probe → ADC → rerank plan), completing the seeded-twin
    // family: every ANN path (LSH s02, IVF s09, PQ s10, IVF-PQ s11) has a
    // hash-checked variant while the trained forms keep recall specs
    "s11_knn_ivfpq_seeded" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      ivfPqTopKSeeded(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", k = 10)
    }),

    // MATERIALIZED IVF-PQ index (s17 applied to s11): codes live in a
    // cid-partitioned graft table, refreshed from the change feed; the
    // probe reads probed cells' CODES only — no corpus pq_encode in the
    // plan (SimilaritySpec asserts it). Same seeded quantizers as s11,
    // so the result hash-matches the same oracle
    "s19_ivfpq_indexed" -> ((s, d) => ivfPqIdxProbe(s, d)),

    // SPHERICAL-KMEANS Lloyd step with SEEDED centroids — the machinery
    // twin of s04 (assign every vector to its best centroid, then reduce
    // per-cell coordinate sums + member counts: exactly the corpus pass
    // KMeans‖ repeats per iteration). Coordinates ship as floor(x·2^24)
    // integers so the per-cell sums are exact and order-independent —
    // hash-checkable despite the shuffle — while the trained s04 path
    // stays rows-only
    "s12_lloyd_step_seeded" -> ((s, d) =>
      lloydStepSeeded(t(s, d, "embeddings"), "vec_id", "embedding", k = 10)),

    // RETRIEVAL composition (the RAG read path): exact top-k vector
    // search, then the hits joined back to the documents table for their
    // text — the k×queries result relation is tiny, so the doc fetch is
    // an AQE-broadcast join against the corpus regardless of SF
    "s07_retrieval" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val docs = t(s, d, "documents")
      val topk = bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id",
        "embedding", k = 5)
      topk.join(docs, topk("n_id") === docs("doc_id"))
        .select(col("q_id"), col("rank"), col("n_id"), col("cos_sim"),
          substring(col("text"), 1, 40).as("snippet"))
        .orderBy("q_id", "rank")
    }),

    // label-centroid similarity: per-label mean vector, then each label's
    // centroid norm — a "cluster quality" style aggregate over vectors
    // (element-wise mean via 64 unrolled array sums; exact integer-free
    // double math is avoided in the oracle by rounding)
    "s03_label_centroid_norm" -> ((s, d) => {
      val dims = 0 until 64
      val emb = t(s, d, "embeddings")
        .select(col("label"),
          vecD(col("embedding")).as("v"))
      val sums = dims.map(i =>
        sum(element_at(col("v"), i + 1)).as(s"s$i"))
      val withN = emb.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sums: _*)
      val normSq = dims.map(i => pow(col(s"s$i") / col("n"), 2))
        .reduce(_ + _)
      withN.select(col("label"), col("n").as("n_vecs"),
        round(sqrt(normSq), 6).as("centroid_norm"))
        .orderBy("label")
    })
  )

  /** IVF (inverted-file) approximate top-k — the OTHER standard ANN scale
    * path next to LSH (s02): a k-means coarse quantizer splits the corpus
    * into `nCentroids` cells; each query probes its `nProbe`
    * most-similar cells and rescores exactly inside them, so the exact
    * cosine runs against ~nProbe/nCentroids of the corpus instead of all
    * of it.
    *
    * Scale design: the trained centroids are the ONLY driver-side state
    * (nCentroids × dim doubles — bounded, independent of corpus size) and
    * re-enter the plan as literal arrays, so cell assignment is a pure
    * codegen'd projection over one corpus scan; candidates come from a
    * cell-id equi-join (shuffle O(n·nProbe/nCentroids)); final top-k is
    * the bounded-heap aggregate. Assignment probes by cosine (spherical-
    * IVF style), which matches the cosine rescoring metric. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L,
      maxQueries: Int = 1024): DataFrame = {
    val (assigned, centers) =
      ivfIndex(corpus, idCol, vecCol, nCentroids, seed)
    ivfProbeIndexed(assigned, centers, queries, idCol, vecCol, k,
      nProbe, maxQueries)
  }

  /** The IVF INDEX of a corpus: `(n_id, n_v, cid)` cell assignments plus
    * the trained centroid vectors. At warehouse scale this pair is built
    * once and MATERIALIZED (assignments into a cid-partitioned table —
    * probing then scans only the probed cells' files; centroids are
    * nCentroids × dim doubles, metadata-sized); every query batch runs
    * [[ivfProbeIndexed]] against it. */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 16,
      seed: Long = 42L): (DataFrame, Seq[Seq[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    val model = new KMeans().setK(nCentroids).setSeed(seed).setMaxIter(10)
      .fit(c.select(array_to_vector(col("n_v")).as("features")))
    val centers: Seq[Seq[Double]] = model.clusterCenters.map(_.toArray.toSeq).toSeq
    val assigned = c.withColumn("cid", graft.functions.CellAssign
      .cell_argmax(col("n_v"), graft.functions.CellAssign.codebook(centers)))
    (assigned, centers)
  }

  /** IVF probe against a PREBUILT index ([[ivfIndex]]'s output, possibly
    * loaded back from storage): assign each query to its `nProbe` best
    * cells, rescore exactly inside them. Per batch the corpus-sized side
    * is read-only — nothing is retrained or reassigned. */
  def ivfProbeIndexed(
      assigned: DataFrame,
      centers: Seq[Seq[Double]],
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      maxQueries: Int = 1024): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
      .withColumn("cid", explode(graft.functions.CellAssign.cell_topn(
        col("q_v"), graft.functions.CellAssign.codebook(centers), nProbe)))
      .select(col("q_id"), col("q_v"), col("cid"))
    // broadcast the (LIMIT-bounded) probe side: the join key has only
    // nCentroids distinct values, so a shuffle join here would hash the
    // whole corpus into nCentroids partitions (parallelism collapse +
    // skew); with the probes broadcast the corpus never moves at all
    val scored = assigned.join(broadcast(q), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  /** INCREMENTALLY-MAINTAINED stored IVF index: the corpus lives in a
    * versioned graft table, the index in a second, cid-partitioned one —
    * and when a batch of new vectors lands on the corpus, the index is
    * refreshed by assigning ONLY the change feed (O(batch) work, no
    * corpus rescan or retrain) and appending those rows. The quantizer
    * is the s09 seeded literal codebook, so per-row assignment is
    * deterministic and "incremental union == full rebuild" holds exactly
    * — which is what lets the probe result hash-match the s09 oracle
    * over the raw corpus. The 100 TB maintenance story: a nightly
    * embedding batch costs O(batch) index work, and probes read only the
    * probed cells' files (manifest partition pruning on cid). */
  /** The two-snapshot versioned embedding corpus shared by the stored
    * ANN indexes (s17 IVF, s19 IVF-PQ): 90% of the vectors land at
    * snapshot 1, the rest arrive as the snapshot-2 "nightly batch" the
    * incremental refreshes consume through the change feed. */
  private[queries] def incCorpusFixture(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): graft.table.GraftTable =
    Versioned.cachedFixture(sfDir, "emb_inc", 3) { dir =>
      val emb = t(spark, sfDir, "embeddings")
        .select(col("vec_id"), vecD(col("embedding")).as("v"))
      val tb = graft.table.GraftTable.create(dir, emb.schema)
      tb.append(emb.filter(col("vec_id") % 10 =!= 0), committedAt = Some(1000L))
      tb.append(emb.filter(col("vec_id") % 10 === 0), committedAt = Some(2000L))
      // the curation pass (snapshot 3): a p04-style delete retracts a
      // key slice — the event a feed-only index refresh would MISS
      // (serving retracted vectors until a rebuild); the CDC-driven
      // refresh below propagates it as equality tombstones
      tb.delete(spark, col("vec_id") % 10 === 7, Some(3000L))
      tb
    }

  /** Apply a corpus CDC window to a materialized index table, O(batch):
    * the feed nets per key (latest event wins, so an update's
    * retract+insert lands as ONE upsert), insert rows are (re)indexed
    * through `encode`, delete rows become EQUALITY TOMBSTONES on the
    * index key. An insert-only window keeps the plain-append fast path;
    * any deletes take one tombstone+upsert commit
    * ([[graft.table.GraftTable.mergeEqualityConditional]]) — no index
    * data file rewrites, nothing rebuilds. This closes the gap a
    * feed-only (append) refresh leaves: a curation delete on the corpus
    * no longer leaves the index serving retracted vectors. */
  private[queries] def refreshIndexCdc(
      spark: org.apache.spark.sql.SparkSession,
      idx: graft.table.GraftTable,
      feed: DataFrame,
      keyCol: String,
      encode: DataFrame => DataFrame,
      committedAt: Option[Long],
      foldEvery: Int = 1): Unit = {
    import org.apache.spark.sql.expressions.Window
    // per-key netting: O(batch) rows, ~unique keys — the window groups
    // are the batch's keys, not a handful of partitions
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("snapshot__id").desc, col("_change_type").desc)
    val netted = feed
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "snapshot__id")
    val ins = encode(netted.filter(col("_change_type") === "insert")
      .drop("_change_type"))
    val delKeys = netted.filter(col("_change_type") === "delete")
      .select(col(keyCol).as("n_id"))
    if (delKeys.isEmpty) { idx.append(ins, committedAt); return }
    val whole = idx.schema.fieldNames.map(c => c -> col(c)).toMap
    val src = ins.withColumn("_change_type", lit("insert"))
      .unionByName(delKeys.withColumn("_change_type", lit("delete")),
        allowMissingColumns = true)
    idx.mergeEqualityConditional(spark, src, Seq("n_id" -> "n_id"),
      matched = Seq(
        graft.table.MergeDelete(Some(col("_change_type") === "delete")),
        graft.table.MergeUpdate(None, whole)),
      notMatched = Seq(graft.table.MergeInsert(
        Some(col("_change_type") === "insert"), whole)),
      committedAt = committedAt): Unit
    // probe-side debt bound (GraftCdcMirror's compactEvery treatment):
    // each delete window would otherwise stack one more pending equality
    // entry on the index and EVERY probe pays the anti-join against the
    // tombstone key relation (measured: s17 0.65→1.17 s, s19 0.85→1.40 s
    // after ONE window). An ANN index is probed orders of magnitude more
    // often than it is refreshed, so the default folds immediately —
    // one row-preserving replace of the covered files (O(index)/
    // foldEvery amortized; readers and additive streams undisturbed),
    // after which the probe plan loses the anti-join entirely.
    idx.foldDeleteDebt(spark, foldEvery, committedAt.map(_ + 1)): Unit
  }

  private[queries] def incIdxFixture(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): graft.table.GraftTable = {
    val corpus = incCorpusFixture(spark, sfDir)
    // 4 snapshots: base, insert refresh, tombstone merge, debt fold
    Versioned.cachedFixture(sfDir, "emb_inc_idx", 4) { dir =>
      val cb = graft.functions.CellAssign.codebook(
        seededCentroids(nCentroids = 8, seed = 23L), roundTo = 6)
      def assign(df: DataFrame): DataFrame = df
        .select(col("vec_id").as("n_id"), col("v").as("n_v"))
        .withColumn("cid",
          graft.functions.CellAssign.cell_argmax(col("n_v"), cb))
      val base = assign(corpus.read(spark, Some(1L)).drop("snapshot__id"))
      val idx = graft.table.GraftTable.create(dir, base.schema,
        // hash distribution: one writer task per cell — 8 cells must not
        // become 8 × n_tasks small files
        properties = Map(graft.table.GraftTable.PropWriteDistribution -> "hash"),
        partitionBy = Seq("cid"))
      idx.append(base, committedAt = Some(1000L))
      // incremental refreshes consume the corpus CDC feed — insert-only
      // windows keep the plain-append path (snapshot 2), the curation
      // delete propagates as equality tombstones (snapshot 3)
      refreshIndexCdc(spark, idx, corpus.changesCdc(spark, 1L, Some(2L)),
        "vec_id", assign, Some(2000L))
      refreshIndexCdc(spark, idx, corpus.changesCdc(spark, 2L, Some(3L)),
        "vec_id", assign, Some(3000L))
      idx
    }
  }

  /** Probe the stored incremental index: queries go to their nProbe best
    * cells, and the index SCAN is pinned to exactly those cells — the
    * probed-cell id set is bounded (≤ queries × nProbe values, driver
    * metadata-class), so manifest partition pruning keeps the read to
    * the probed cells' files. */
  private[queries] def incIdxProbe(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String,
      k: Int = 10,
      nProbe: Int = 2): DataFrame = {
    val idx = incIdxFixture(spark, sfDir)
    val cb = graft.functions.CellAssign.codebook(
      seededCentroids(nCentroids = 8, seed = 23L), roundTo = 6)
    val q = t(spark, sfDir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), vecD(col("embedding")).as("q_v"))
      .limit(1024) // broadcast-policy bound, same as every probe side
      .withColumn("cid",
        explode(graft.functions.CellAssign.cell_topn(col("q_v"), cb, nProbe)))
      .select(col("q_id"), col("q_v"), col("cid"))
    val cids = q.select("cid").distinct().collect().map(_.getInt(0))
    val assigned = idx
      .scan(spark, Some(col("cid").isin(cids.map(Int.box).toSeq: _*)))
      .select("n_id", "n_v", "cid")
    val scored = assigned.join(broadcast(q), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  // shared s19 quantizers — the s11 seeds, so the stored-index probe
  // hash-matches the s11 oracle computed over the raw corpus
  private def s19CellCb = graft.functions.CellAssign.codebook(
    seededCentroids(nCentroids = 8, seed = 53L), roundTo = 6)
  private def s19PqCb = graft.functions.PqCodebook(
    seededPqBooks(m = 8, k = 16, seed = 61L), roundTo = 6)

  /** MATERIALIZED IVF-PQ index — the FAISS-on-a-lake shape (the s17
    * stored-IVF machinery applied to the s11 IVF-PQ plan): `(n_id, cid,
    * codes)` persisted in a cid-partitioned graft table, built once from
    * the corpus and refreshed INCREMENTALLY by encoding only the change
    * feed (O(batch) — no corpus re-encode, no retrain). This is the
    * scale fix for the one per-query O(corpus) compute left in the ANN
    * surface: the inline-encode paths (s10/s11) re-run `pq_encode` over
    * every vector per query batch, where a probe of this table reads m
    * small int codes for the PROBED CELLS' files only. Deterministic
    * seeded quantizers ⇒ incremental union == full rebuild exactly
    * (asserted in SimilaritySpec). */
  private[queries] def ivfPqIdxFixture(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): graft.table.GraftTable = {
    val corpus = incCorpusFixture(spark, sfDir)
    // 4 snapshots: base, insert refresh, tombstone merge, debt fold
    Versioned.cachedFixture(sfDir, "emb_ivfpq_idx", 4) { dir =>
      val cellCb = s19CellCb
      val pqCb = s19PqCb
      // one fused pass per batch: cell argmax + PQ encode, nothing else
      // ever recomputes codes (the probe is lookup-only)
      def index(df: DataFrame): DataFrame = df
        .select(col("vec_id").as("n_id"),
          graft.functions.CellAssign.cell_argmax(col("v"), cellCb).as("cid"),
          graft.functions.ProductQuantization.pq_encode(col("v"), pqCb)
            .as("codes"))
      val base = index(corpus.read(spark, Some(1L)).drop("snapshot__id"))
      val idx = graft.table.GraftTable.create(dir, base.schema,
        // hash distribution: one writer task per cell — 8 cells must not
        // become 8 × n_tasks small files
        properties = Map(graft.table.GraftTable.PropWriteDistribution -> "hash"),
        partitionBy = Seq("cid"))
      idx.append(base, committedAt = Some(1000L))
      // incremental refreshes consume the corpus CDC feed: the nightly
      // batch encodes O(batch) (snapshot 2), the curation delete lands
      // as equality tombstones — no re-encode, no rebuild (snapshot 3)
      refreshIndexCdc(spark, idx, corpus.changesCdc(spark, 1L, Some(2L)),
        "vec_id", index, Some(2000L))
      refreshIndexCdc(spark, idx, corpus.changesCdc(spark, 2L, Some(3L)),
        "vec_id", index, Some(3000L))
      idx
    }
  }

  /** Probe the stored IVF-PQ index: queries go to their nProbe best
    * cells; the index scan is pinned to exactly those cells (manifest
    * partition pruning on cid) and yields CODES ONLY — no corpus vector
    * is read and no `pq_encode` of the corpus appears anywhere in the
    * probe plan (SimilaritySpec asserts this). ADC-score the probed
    * cells' codes, cut to `rerank` candidates with the bounded heap,
    * then re-rank exactly against the corpus table (a candidate-sized
    * id join — O(queries × rerank) full vectors, not O(corpus)). */
  private[queries] def ivfPqIdxProbe(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String,
      k: Int = 10,
      nProbe: Int = 3,
      rerank: Int = 256): DataFrame = {
    import graft.functions.DotProduct.dot_product
    import graft.functions.ProductQuantization
    val corpus = incCorpusFixture(spark, sfDir)
    val idx = ivfPqIdxFixture(spark, sfDir)
    val cellCb = s19CellCb
    val pqCb = s19PqCb
    val q0 = t(spark, sfDir, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), vecD(col("embedding")).as("q_v"))
      .limit(1024) // broadcast-policy bound, same as every probe side
    val probes = q0.select(col("q_id"),
      sqrt(dot_product(col("q_v"), col("q_v"))).as("q_norm"),
      ProductQuantization.pq_dot_tables(col("q_v"), pqCb).as("tab"),
      explode(graft.functions.CellAssign.cell_topn(col("q_v"), cellCb,
        nProbe)).as("cid"))
    // bounded driver state: ≤ queries × nProbe cell ids
    val cids = probes.select("cid").distinct().collect().map(_.getInt(0))
    val indexed = idx
      .scan(spark, Some(col("cid").isin(cids.map(Int.box).toSeq: _*)))
      .select("n_id", "cid", "codes")
    val cand = indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("approx_cos", adcCos(pqCb, roundApprox = 6))
      .groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions
        .top_k_by_score(col("approx_cos"), col("n_id"), rerank).as("top"))
      .select(col("q_id"), explode(col("top")).as("cnd"))
      .select(col("q_id"), col("cnd.id").as("n_id"))
    val c = corpus.read(spark)
      .select(col("vec_id").as("n_id"), col("v").as("n_v"))
    val scored = cand.join(broadcast(q0), "q_id").join(c, "n_id")
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  /** Product-quantization (PQ) approximate top-k — the memory-bounded ANN
    * scale path next to LSH (s02) and IVF (s05): the corpus is compressed
    * to `m` per-subspace codebook indices (one byte each at k=16), every
    * candidate is scored against the CODES via per-query lookup tables
    * (asymmetric distance computation), and only the top `rerank`
    * candidates per query are rescored against full vectors. At 100 TB
    * the ADC scan reads m small int columns instead of the 64-float
    * vector (32× less I/O at m=8: 8 byte-codes vs 256 vector bytes), and
    * full-precision vectors are fetched for O(queries × rerank) rows only.
    *
    * Codebooks are per-subspace k-means trained on a BOUNDED sample
    * (deterministic md5 hash sample, id-ordered, capped at `trainCap`
    * rows — the t09 sampling discipline): PQ codebooks need a few
    * thousand vectors regardless of corpus size (the FAISS training
    * recipe), so training is one TakeOrdered scan + O(trainCap·k·iters)
    * driver arithmetic — no per-subspace cluster jobs. The codebooks
    * re-enter the plan as literal arrays (m × k × dim/m doubles of
    * driver state, corpus-independent).
    * Encode (exact-L2 argmin) and the query dot tables run through the
    * dedicated [[graft.functions.PqEncode]] / [[graft.functions.PqDotTables]]
    * expressions — the codebook ships as one reference object and each
    * generates a single fused loop, where the equivalent composed-Column
    * form (m × k slice/dot/argmax trees) costs seconds of Janino compile
    * time PER PLAN. ADC approximates
    * cos(q,x) ≈ Σ_m dot(q_m, c_code) / (‖q‖·√Σ_m ‖c_code‖²) with m array
    * lookups per row; top-`rerank` selection is the bounded-heap
    * aggregate, so the scored relation never shuffles. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      codebook: Int = 16,
      rerank: Int = 64,
      seed: Long = 7L,
      maxQueries: Int = 1024,
      trainCap: Int = 2048): DataFrame = {
    import graft.functions.PqCodebook
    val dim = 64
    val sub = dim / m

    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    // codebook training input: deterministic hash sample, id-ordered and
    // capped — bounded driver state (trainCap × dim doubles ≈ 1 MB),
    // one TakeOrderedAndProject job for all m codebooks
    val sampleRows = c
      .filter(substring(md5(col("n_id").cast("string")), 1, 1) < "8")
      .orderBy(col("n_id")).limit(trainCap)
      .collect().map(_.getSeq[Double](1).toArray)
    val cb = PqCodebook((0 until m).map { mi =>
      val slices = sampleRows.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      localKMeans(slices, codebook, iters = 8, seed = seed + mi).toArray
    }.toArray)
    val q0 = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
    pqAdcTopK(c, q0, cb, k, rerank)
  }

  /** Seeded random per-subspace codebooks — [[seededCentroids]] for PQ;
    * shared by the s10 Spark query and its DuckDB oracle. */
  private[queries] def seededPqBooks(
      m: Int, k: Int, seed: Long, dim: Int = 64): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    val sub = dim / m
    Array.fill(m)(Array.fill(k)(Array.fill(sub)(rng.nextGaussian())))
  }

  /** Portable-twin PQ (the s09 pattern applied to s06): the SAME
    * encode → ADC scan → bounded-heap candidate cut → exact re-rank
    * machinery as [[pqTopK]], but the codebook is seeded LITERAL random
    * codewords instead of trained k-means, so the DuckDB oracle replays
    * encoding (rounded-L2 argmin, code-asc ties), the ADC projection
    * (identical left-assoc summation order), the rerank cut
    * (approx desc, id asc — the bounded-heap total order) and the exact
    * re-rank end to end, hash-checking the whole PQ path. Near-tie
    * comparisons go through `round(_, 6)` on BOTH sides (encode distance
    * and ADC score), the CellCodebook discipline. */
  def pqTopKSeeded(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      codebook: Int = 16,
      rerank: Int = 256,
      seed: Long = 31L,
      maxQueries: Int = 1024): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    val q0 = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
    val cb = graft.functions.PqCodebook(seededPqBooks(m, codebook, seed), roundTo = 6)
    pqAdcTopK(c, q0, cb, k, rerank, roundApprox = 6)
  }

  /** The ADC score column shared by every PQ consumer (trained s06/s08,
    * seeded s10/s11, the stored s19 index): m lookups into the query's
    * per-subspace dot tables (`tab`) by the row's `codes`, normalized by
    * `q_norm` and the codeword-norm literal table. Left-assoc sum order
    * on both terms — the seeded oracles replay it bit for bit. */
  private def adcCos(
      cb: graft.functions.PqCodebook, roundApprox: Int): Column = {
    val m = cb.m
    val normSqLit = typedLit(cb.normSq.map(_.toSeq).toSeq)
    val approxDot = (0 until m)
      .map(mi => element_at(element_at(col("tab"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)).reduce(_ + _)
    val approxNormSq = (0 until m)
      .map(mi => element_at(element_at(normSqLit, mi + 1),
        element_at(col("codes"), mi + 1) + 1)).reduce(_ + _)
    val raw = approxDot / (col("q_norm") * sqrt(approxNormSq))
    if (roundApprox < 0) raw else round(raw, roundApprox)
  }

  /** The PQ ADC plan shared by the trained ([[pqTopK]]) and seeded
    * ([[pqTopKSeeded]]) paths: encode the corpus, score with per-query dot
    * tables, cut to `rerank` candidates with the bounded heap, re-rank the
    * survivors exactly. `roundApprox >= 0` rounds the ADC score before the
    * candidate cut (seeded-oracle determinism). */
  private def pqAdcTopK(
      c: DataFrame,
      q0: DataFrame,
      cb: graft.functions.PqCodebook,
      k: Int,
      rerank: Int,
      roundApprox: Int = -1): DataFrame = {
    import graft.functions.DotProduct.dot_product
    import graft.functions.ProductQuantization

    // encode: exact-L2 nearest codeword per subspace, one fused loop
    val codes = c.select(col("n_id"),
      ProductQuantization.pq_encode(col("n_v"), cb).as("codes"))

    // query side: per-subspace dot tables against the codebook
    val qTabs = q0.select(col("q_id"),
      sqrt(dot_product(col("q_v"), col("q_v"))).as("q_norm"),
      ProductQuantization.pq_dot_tables(col("q_v"), cb).as("tab"))

    // ADC scan: m table lookups per row — neither the full vectors nor
    // any vector math enter this pass
    val approxCos = adcCos(cb, roundApprox)
    val cand = codes.join(broadcast(qTabs), col("n_id") =!= col("q_id"))
      .withColumn("approx_cos", approxCos)
      .groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions
        .top_k_by_score(col("approx_cos"), col("n_id"), rerank).as("top"))
      .select(col("q_id"), explode(col("top")).as("cnd"))
      .select(col("q_id"), col("cnd.id").as("n_id"))

    // exact re-rank of the bounded candidate set: q side is LIMIT-bounded
    // (hint allowed); the corpus side joins by n_id with NO hint — AQE
    // broadcasts the tiny candidate relation at runtime
    val scored = cand.join(broadcast(q0), "q_id").join(c, "n_id")
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  /** IVF-PQ approximate top-k — the composition the two scale paths are
    * FOR (the FAISS `IVFx,PQy` index shape): an IVF coarse quantizer
    * restricts each query to `nProbe` of `nCells` cells, PQ codes score
    * the candidates inside those cells with table lookups, and only the
    * top `rerank` survivors touch full vectors. At 100 TB the scan cost
    * is nProbe/nCells of the corpus × m byte-codes per row — both
    * sublinear candidate count AND compressed I/O, where s05 pays full
    * vectors in probed cells and s06 scans every code.
    *
    * Both quantizers train on one bounded sample (localKMeans); codes are
    * plain codebooks over raw vectors (no residual encoding — documented
    * simplification; residual PQ needs per-cell re-centering). Everything
    * is one corpus scan → cell equi-join → ADC projection → bounded-heap
    * top-k → tiny exact re-rank. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 6,
      m: Int = 8,
      codebook: Int = 16,
      rerank: Int = 64,
      seed: Long = 7L,
      maxQueries: Int = 1024,
      trainCap: Int = 2048): DataFrame = {
    import graft.functions.PqCodebook
    val dim = 64
    val sub = dim / m

    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    val sampleRows = c
      .filter(substring(md5(col("n_id").cast("string")), 1, 1) < "8")
      .orderBy(col("n_id")).limit(trainCap)
      .collect().map(_.getSeq[Double](1).toArray)
    val cells: Seq[Seq[Double]] =
      localKMeans(sampleRows, nCells, iters = 8, seed = seed + 100).map(_.toSeq)
    val cb = PqCodebook((0 until m).map { mi =>
      val slices = sampleRows.map(v =>
        java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
      localKMeans(slices, codebook, iters = 8, seed = seed + mi).toArray
    }.toArray)
    val q0 = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
    ivfPqAdcTopK(c, q0, graft.functions.CellAssign.codebook(cells), cb,
      k, nProbe, rerank)
  }

  /** Portable-twin IVF-PQ (the s09+s10 patterns composed): the SAME
    * cell-index → probed-cell ADC → rerank-cut → exact-rerank machinery
    * as [[ivfPqTopK]], with BOTH quantizers seeded literals, so the DuckDB
    * oracle replays the full FAISS-shape `IVFx,PQy` read path end to end
    * and it is hash-checked. All near-tie comparisons round at 6 decimals
    * on both engines (cell sims, encode distances, ADC scores). */
  def ivfPqTopKSeeded(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 8,
      nProbe: Int = 3,
      m: Int = 8,
      codebook: Int = 16,
      rerank: Int = 256,
      seedCells: Long = 53L,
      seedPq: Long = 61L,
      maxQueries: Int = 1024): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), vecD(col(vecCol)).as("n_v"))
    val q0 = queries.select(col(idCol).as("q_id"), vecD(col(vecCol)).as("q_v"))
      .limit(maxQueries)
    val cellCb = graft.functions.CellAssign.codebook(
      seededCentroids(nCells, seedCells), roundTo = 6)
    val cb = graft.functions.PqCodebook(
      seededPqBooks(m, codebook, seedPq), roundTo = 6)
    ivfPqAdcTopK(c, q0, cellCb, cb, k, nProbe, rerank, roundApprox = 6)
  }

  /** The IVF-PQ plan shared by the trained ([[ivfPqTopK]]) and seeded
    * ([[ivfPqTopKSeeded]]) paths. */
  private def ivfPqAdcTopK(
      c: DataFrame,
      q0: DataFrame,
      cellCb: graft.functions.CellCodebook,
      cb: graft.functions.PqCodebook,
      k: Int,
      nProbe: Int,
      rerank: Int,
      roundApprox: Int = -1): DataFrame = {
    import graft.functions.DotProduct.dot_product
    import graft.functions.ProductQuantization

    // index pass: one corpus scan emits (cell id, PQ codes) per vector
    val indexed = c.select(col("n_id"),
      graft.functions.CellAssign.cell_argmax(col("n_v"), cellCb).as("cid"),
      ProductQuantization.pq_encode(col("n_v"), cb).as("codes"))

    // query side: nProbe probed cells × the PQ dot tables
    val probes = q0.select(col("q_id"),
        sqrt(dot_product(col("q_v"), col("q_v"))).as("q_norm"),
        ProductQuantization.pq_dot_tables(col("q_v"), cb).as("tab"),
        explode(graft.functions.CellAssign.cell_topn(col("q_v"), cellCb,
          nProbe)).as("cid"))

    // ADC inside probed cells only; broadcast the LIMIT-bounded probe side
    // (cid has nCells distinct values — a shuffle join would hash the
    // corpus into nCells partitions, the s05 lesson)
    val approxCos = adcCos(cb, roundApprox)
    val cand = indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("approx_cos", approxCos)
      .groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions
        .top_k_by_score(col("approx_cos"), col("n_id"), rerank).as("top"))
      .select(col("q_id"), explode(col("top")).as("cnd"))
      .select(col("q_id"), col("cnd.id").as("n_id"))

    val scored = cand.join(broadcast(q0), "q_id").join(c, "n_id")
      .withColumn("cos", Dedup.cosineSim(col("q_v"), col("n_v")))
    rankTopK(scored, k)
  }

  /** Driver-side Lloyd's k-means over a BOUNDED collected sample — the PQ
    * codebook trainer. Deterministic (seeded shuffle init, fixed iteration
    * count); empty cells keep their previous center. This is intentionally
    * NOT distributed: the input is capped independent of corpus size, so
    * a cluster round-trip per subspace would be pure scheduling overhead
    * (measured: 8 KMeans fits cost ~9 s of job launches at any SF). */
  private def localKMeans(
      points: Array[Array[Double]], k: Int, iters: Int, seed: Long): Seq[Array[Double]] = {
    require(points.length >= k, s"need >= $k training points, got ${points.length}")
    val d = points.head.length
    val rng = new scala.util.Random(seed)
    val centers = rng.shuffle(points.indices.toList).take(k)
      .map(i => points(i).clone).toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      for (p <- points) {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = p(i) - centers(j)(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        counts(best) += 1
        val s = sums(best); var i = 0
        while (i < d) { s(i) += p(i); i += 1 }
      }
      for (j <- 0 until k if counts(j) > 0; i <- 0 until d)
        centers(j)(i) = sums(j)(i) / counts(j)
    }
    centers.toSeq
  }

  /** SemDeDup-style SEMANTIC dedup: k-means cells over the embedding
    * corpus, then near-duplicate detection only WITHIN each cell — a
    * vector is dropped when a lower-id member of its cell has cosine ≥
    * `tau` to it. Returns the dropped vectors with their keep-witness.
    *
    * Scale: the pair space is Σ|cell|², bounded by cell granularity — at
    * scale k grows with the corpus (k ≈ n / target cell size) so the
    * per-cell quadratic term stays a constant and join parallelism is the
    * cell count; the centers are the only driver-side state (k × dim
    * doubles). The d06 hyperplane variant is the oracle-checkable twin;
    * this is the trained-quantizer form the SemDeDup recipe uses.
    *
    * The quantizer is trained on a bounded deterministic hash sample
    * (the PQ-codebook discipline — cell BOUNDARIES only block the pair
    * space, they don't need full-corpus convergence, and a sample-trained
    * quantizer costs one TakeOrdered scan instead of k-means-‖ corpus
    * passes per iteration); assignment is a literal-center projection
    * over one corpus scan. The distributed trainer itself stays
    * demonstrated by s04/s05. */
  def semanticDedup(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      tau: Double = 0.97,
      seed: Long = 42L,
      trainCap: Int = 2048): DataFrame = {
    val c = emb.select(col(idCol).as("vid"), vecD(col(vecCol)).as("v"))
    val sampleRows = c
      .filter(substring(md5(col("vid").cast("string")), 1, 1) < "8")
      .orderBy(col("vid")).limit(trainCap)
      .collect().map(_.getSeq[Double](1).toArray)
    val centers: Seq[Seq[Double]] =
      localKMeans(sampleRows, k, iters = 8, seed = seed).map(_.toSeq)
    semanticDedupWithCenters(c, centers, tau)
  }

  /** The SemDeDup cell-block + within-cell pair scan, parameterized by the
    * cell centers — shared by the trained path ([[semanticDedup]]) and the
    * seeded oracle twin ([[semanticDedupSeeded]]). */
  private def semanticDedupWithCenters(
      c: DataFrame,
      centers: Seq[Seq[Double]],
      tau: Double,
      roundTo: Int = -1): DataFrame = {
    val a = c.withColumn("cid", graft.functions.CellAssign.cell_argmax(
      col("v"), graft.functions.CellAssign.codebook(centers, roundTo)))
    val keep = a.select(col("cid"), col("vid").as("kept_id"), col("v").as("kv"))
    val drop = a.select(col("cid"), col("vid").as("dropped_id"), col("v").as("dv"))
    keep.join(drop, Seq("cid"))
      .filter(col("kept_id") < col("dropped_id"))
      .withColumn("cos", Dedup.cosineSim(col("kv"), col("dv")))
      .filter(col("cos") >= tau)
      .groupBy(col("dropped_id"))
      .agg(min(col("kept_id")).as("kept_id"),
        count(lit(1)).as("n_witnesses"),
        round(max(col("cos")), 6).as("max_cos"))
      .orderBy("dropped_id")
  }

  /** Portable-twin SemDeDup (the s09 pattern applied to d11): the SAME
    * cell-block + within-cell cosine machinery as [[semanticDedup]], but
    * the cells come from a seeded LITERAL codebook instead of trained
    * k-means, so the DuckDB oracle replays assignment and pair scan end to
    * end and the SemDeDup path is hash-checked. Cell argmax goes through
    * `round(sim, 6)` on both sides (ties to the larger cid), the d16
    * oracle mirrors it. */
  def semanticDedupSeeded(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      tau: Double = 0.35,
      seed: Long = 97L): DataFrame = {
    val c = emb.select(col(idCol).as("vid"), vecD(col(vecCol)).as("v"))
    semanticDedupWithCenters(c, seededCentroids(k, seed), tau, roundTo = 6)
  }

  /** One distributed Lloyd update step of spherical k-means from SEEDED
    * literal centroids — the oracle-hashable twin of the corpus pass
    * inside [[kmeansClusters]]. Assignment reuses the shared coarse
    * quantizer ([[graft.functions.CellAssign]], rounded-cosine argmax,
    * ties to the larger cid — the SemDeDup/IVF discipline); the update
    * reduce emits per-(cell, coordinate) member counts and EXACT integer
    * coordinate sums: each double element maps to `floor(x · 2^24)`
    * (power-of-two scaling is exact in IEEE754, floor is engine-portable),
    * so the sum is order-independent under the shuffle and both engines
    * agree bit-for-bit. One corpus scan, one hash aggregation — the same
    * shape a 100 TB Lloyd iteration runs per step. */
  def lloydStepSeeded(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 131L): DataFrame = {
    val c = emb.select(col(idCol).as("vid"), vecD(col(vecCol)).as("v"))
    val cb = graft.functions.CellAssign.codebook(
      seededCentroids(k, seed), roundTo = 6)
    val a = c.withColumn("cid",
      graft.functions.CellAssign.cell_argmax(col("v"), cb))
    a.select(col("cid"), posexplode(col("v")).as(Seq("pos", "elem")))
      .select(col("cid"), col("pos"),
        floor(col("elem") * lit(16777216.0)).cast("long").as("ci"))
      .groupBy("cid", "pos")
      .agg(count(lit(1)).as("n_members"), sum(col("ci")).as("coord_sum"))
      .orderBy("cid", "pos")
  }

  /** K-means clustering of the embedding corpus (diversity sampling /
    * dedup-by-centroid building block). Distributed via Spark ML's
    * KMeans|| (fixed seed → deterministic on a fixed layout); returns one
    * row per cluster with its size and center norm. */
  def kmeansClusters(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = emb.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // 10 iterations: cluster assignments for corpus sampling stabilize
    // well before classic-KMeans convergence, and each extra iteration is
    // a full corpus pass (this is the bench's second-heaviest query)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      .fit(feats)
    val centerNorms = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(c.toArray.map(x => x * x).sum)) }
    val assigned = model.transform(feats)
    val norms = emb.sparkSession.createDataFrame(centerNorms)
      .toDF("prediction", "center_norm")
    assigned.groupBy(col("prediction"))
      .agg(count(lit(1)).as("n_members"))
      .join(broadcast(norms), "prediction")
      .select(col("prediction").as("cluster"), col("n_members"),
        round(col("center_norm"), 6).as("center_norm"))
      .orderBy("cluster")
  }

  /** Shared DuckDB fragments for the seeded-PQ oracles (s10/s11):
    * per-subspace codebook VALUES CTEs with precomputed ‖codeword‖²
    * literals, rounded-L2 argmin encode CTEs (code-asc ties —
    * PqEncode's first-match-wins), the code→codeword joins, and the
    * left-assoc ADC sum terms matching the Spark side's `reduce(_ + _)`
    * order. Aliases: `e` = corpus CTE, `q` = query row with `v`/`q_norm`,
    * `n` = the codes CTE row. */
  private case class PqOracleFragments(cbCtes: String, encCtes: String,
    codeJoins: String, codeCols: String, dotTerms: String, nsTerms: String)

  private def pqOracleFragments(
      cb: graft.functions.PqCodebook): PqOracleFragments = {
    val m = cb.m; val sub = cb.sub
    val cbCtes = (0 until m).map { mi =>
      val vals = cb.books(mi).zipWithIndex.map { case (cw, j) =>
        s"($j, ${cw.map(_.toString).mkString("[", ", ", "]")}, ${cb.normSq(mi)(j)})"
      }.mkString(", ")
      s"cb$mi(code, c, ns) AS (SELECT * FROM (VALUES $vals) t(code, c, ns))"
    }.mkString(", ")
    val encCtes = (0 until m).map { mi =>
      val lo = mi * sub + 1; val hi = (mi + 1) * sub
      s"enc$mi AS (SELECT vec_id, code FROM (SELECT e.vec_id, cb.code, " +
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
        s"round(list_distance(list_slice(e.v, $lo, $hi), cb.c), ${cb.roundTo}) ASC, " +
        s"cb.code ASC) AS rn FROM e, cb$mi cb) WHERE rn = 1)"
    }.mkString(", ")
    val codeJoins = (0 until m).map { mi =>
      s"JOIN enc$mi x$mi ON x$mi.vec_id = e.vec_id " +
        s"JOIN cb$mi y$mi ON y$mi.code = x$mi.code"
    }.mkString(" ")
    val codeCols = (0 until m).map(mi => s"y$mi.c AS cc$mi, y$mi.ns AS ns$mi")
      .mkString(", ")
    val dotTerms = (0 until m).map { mi =>
      val lo = mi * sub + 1; val hi = (mi + 1) * sub
      s"list_dot_product(list_slice(q.v, $lo, $hi), n.cc$mi)"
    }.reduce((a, b) => s"($a + $b)")
    val nsTerms = (0 until m).map(mi => s"n.ns$mi").reduce((a, b) => s"($a + $b)")
    PqOracleFragments(cbCtes, encCtes, codeJoins, codeCols, dotTerms, nsTerms)
  }

  /** The seeded IVF-PQ oracle (s09's assign/probe CTEs composed with
    * s10's encode/ADC CTEs): the candidate space is (probed cell ∩
    * corpus cell) — each corpus vector lives in exactly one cell, so no
    * pair dedup is needed — and the ADC scoring, rerank cut, and exact
    * re-rank replay s10. Shared by s11 (inline encode) and s19 (stored
    * index) — both compute the identical result. */
  /** The s11/s19 IVF-PQ oracle; `corpusWhere` restricts the corpus CTE —
    * s19's stored index excludes the curation-deleted slice. */
  private def ivfPqSeededOracleSql(corpusWhere: String = ""): String = {
    val cells = seededCentroids(nCentroids = 8, seed = 53L)
    val cb = graft.functions.PqCodebook(
      seededPqBooks(m = 8, k = 16, seed = 61L), roundTo = 6)
    val f = pqOracleFragments(cb)
      val centValues = cells.zipWithIndex.map { case (c, i) =>
        s"($i, ${c.map(_.toString).mkString("[", ", ", "]")})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v " +
        s"FROM embeddings $corpusWhere), " +
        s"cents(cid, c) AS (SELECT * FROM (VALUES $centValues) t(cid, c)), " +
        "sims AS (SELECT vec_id, cid, round(list_cosine_similarity(v, c), 6) AS sim " +
        "FROM e, cents), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims) WHERE rn = 1), " +
        "probe AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims " +
        "WHERE vec_id < 5) WHERE rn <= 3), " +
        s"${f.cbCtes}, ${f.encCtes}, " +
        s"codes AS (SELECT e.vec_id, ${f.codeCols} FROM e ${f.codeJoins}), " +
        "qt AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS q_norm " +
        "FROM e WHERE vec_id < 5), " +
        "adc AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id, " +
        s"round(${f.dotTerms} / (q.q_norm * sqrt(${f.nsTerms})), 6) AS approx " +
        "FROM probe p JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.vec_id " +
        "JOIN qt q ON q.vec_id = p.vec_id " +
        "JOIN codes n ON n.vec_id = a.vec_id), " +
        "cand AS (SELECT q_id, n_id FROM (SELECT q_id, n_id, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY approx DESC, n_id ASC) AS rn FROM adc) WHERE rn <= 256), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"
  }

  val oracleSql: Map[String, String] = Map(
    "s01_knn_brute" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "q AS (SELECT vec_id, v FROM e WHERE vec_id < 5), " +
        "scored AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id, " +
        "list_cosine_similarity(q.v, e.v) AS cos FROM q JOIN e ON e.vec_id <> q.vec_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"),
    "s13_knn_filtered" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings " +
        "WHERE label = 3), " +
        "q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings " +
        "WHERE vec_id < 5), " +
        "scored AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id, " +
        "list_cosine_similarity(q.v, e.v) AS cos FROM q JOIN e ON e.vec_id <> q.vec_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"),
    "s16_hybrid_rrf" ->
      // both legs re-ranked with the same (score DESC, id ASC) order,
      // integer 60+rank denominators keep the division in DOUBLE (a bare
      // 60.0 literal is DECIMAL in DuckDB and its arithmetic is not IEEE)
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "q AS (SELECT v FROM e WHERE vec_id = 0), " +
        "scored AS (SELECT e.vec_id AS id, list_cosine_similarity(q.v, e.v) AS cos " +
        "FROM q, e WHERE e.vec_id <> 0), " +
        "vec AS (SELECT id, CAST(rk AS INTEGER) AS vec_rank FROM " +
        "(SELECT id, row_number() OVER (ORDER BY cos DESC, id ASC) AS rk FROM scored) " +
        "WHERE rk <= 50), " +
        "toks AS (SELECT doc_id, " +
        "list_distinct(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS t " +
        "FROM documents), " +
        "kwc AS (SELECT doc_id, " +
        "CAST(list_contains(t, 'spark') AS INT) + CAST(list_contains(t, 'join') AS INT) AS n " +
        "FROM toks WHERE list_contains(t, 'spark') OR list_contains(t, 'join')), " +
        "kw AS (SELECT doc_id AS id, CAST(rk AS INTEGER) AS kw_rank FROM " +
        "(SELECT doc_id, row_number() OVER (ORDER BY n DESC, doc_id ASC) AS rk FROM kwc) " +
        "WHERE rk <= 50) " +
        "SELECT COALESCE(v.id, k.id) AS id, " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (60 + k.kw_rank), 0.0) + " +
        "COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0.0) AS rrf, " +
        "COALESCE(k.kw_rank, -1) AS kw_rank, " +
        "COALESCE(v.vec_rank, -1) AS vec_rank " +
        "FROM vec v FULL JOIN kw k ON v.id = k.id " +
        "ORDER BY rrf DESC, id ASC LIMIT 20"),

    "s15_mmr_rerank" -> {
      // the greedy chain unrolled as ten selection CTEs: each step picks
      // the (mmr_e6 DESC, id ASC) argmax among unselected candidates,
      // with the identical floor((0.7·rel − 0.3·maxSim)·1e6) Q6 score
      // (maxSim = 0 at step 1 — subtracting 0.0 is exact, so one
      // uniform formula matches the Spark side bit for bit)
      // every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
      // each step references its predecessor three times — inlining
      // would expand 3^10 copies of the whole chain (and reopen the
      // parquet once per copy)
      val steps = (2 to 10).map { k =>
        s"sel$k AS MATERIALIZED (SELECT c.id, c.rel, CAST(floor((0.7 * c.rel - 0.3 * " +
          s"(SELECT max(s.sim) FROM sims s WHERE s.ia = c.id AND s.ib IN " +
          s"(SELECT id FROM u${k - 1}))) * 1000000) AS BIGINT) AS mmr_e6, " +
          s"$k AS rank FROM cand c WHERE c.id NOT IN (SELECT id FROM u${k - 1}) " +
          s"ORDER BY mmr_e6 DESC, c.id ASC LIMIT 1), " +
          s"u$k AS MATERIALIZED (SELECT * FROM u${k - 1} UNION ALL SELECT * FROM sel$k)"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "q AS (SELECT v FROM e WHERE vec_id = 0), " +
        "scored AS (SELECT e.vec_id AS id, e.v, " +
        "list_cosine_similarity(q.v, e.v) AS cos FROM q, e WHERE e.vec_id <> 0), " +
        "cand AS MATERIALIZED (SELECT id, round(cos, 6) AS rel, v FROM " +
        "(SELECT id, cos, v, row_number() OVER (ORDER BY cos DESC, id ASC) AS rk " +
        "FROM scored) WHERE rk <= 50), " +
        "sims AS MATERIALIZED (SELECT a.id AS ia, b.id AS ib, " +
        "round(list_cosine_similarity(a.v, b.v), 6) AS sim " +
        "FROM cand a JOIN cand b ON a.id <> b.id), " +
        "sel1 AS MATERIALIZED (SELECT id, rel, CAST(floor((0.7 * rel - 0.3 * 0.0) * 1000000) " +
        "AS BIGINT) AS mmr_e6, 1 AS rank FROM cand " +
        "ORDER BY mmr_e6 DESC, id ASC LIMIT 1), " +
        "u1 AS MATERIALIZED (SELECT * FROM sel1), " +
        steps + " " +
        "SELECT rank, id AS vec_id, rel, mmr_e6 FROM u10 ORDER BY rank"
    },

    "s02_knn_lsh" -> {
      // one bucket expression per hyperplane table, table index folded in
      // exactly like the Spark side (bucket + ti * 2^nPlanes)
      val tables = lshTables(nPlanes = 6, nTables = 8, seed = 11L)
      val bucketExprs = tables.zipWithIndex.map { case (planes, ti) =>
        val bits = planes.zipWithIndex.map { case (p, i) =>
          val arr = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_cosine_similarity(v, $arr) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        s"($bits + ${ti.toLong * 64L})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        s"b AS (SELECT vec_id, v, unnest([$bucketExprs]) AS bucket FROM e), " +
        "q AS (SELECT * FROM b WHERE vec_id < 5), " +
        "cand AS (SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS n_id " +
        "FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id <> q.vec_id), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"
    },
    "s18_knn_join" -> {
      // same literal hyperplane family as the Spark side (the s02
      // spelling, at 8 planes — 256 buckets/table keeps the blocked
      // pair space ~4x tighter than the s02 search setting); both join
      // sides are the full corpus
      val tables = lshTables(nPlanes = 8, nTables = 8, seed = 11L)
      val bucketExprs = tables.zipWithIndex.map { case (planes, ti) =>
        val bits = planes.zipWithIndex.map { case (p, i) =>
          val arr = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_cosine_similarity(v, $arr) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        s"($bits + ${ti.toLong * 256L})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        s"b AS (SELECT vec_id, v, unnest([$bucketExprs]) AS bucket FROM e), " +
        "cand AS (SELECT DISTINCT l.vec_id AS q_id, r.vec_id AS n_id " +
        "FROM b l JOIN b r ON l.bucket = r.bucket AND r.vec_id <> l.vec_id), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 3"
    },
    "s09_knn_ivf_seeded" -> {
      // the SAME seeded centroids as the Spark side, embedded as literal
      // double lists; assignment/probe replay the rounded-sim argmax with
      // ties to the larger cid (ORDER BY sim DESC, cid DESC)
      val centers = seededCentroids(nCentroids = 8, seed = 23L)
      val centValues = centers.zipWithIndex.map { case (c, i) =>
        s"($i, ${c.map(_.toString).mkString("[", ", ", "]")})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        s"cents(cid, c) AS (SELECT * FROM (VALUES $centValues) t(cid, c)), " +
        "sims AS (SELECT vec_id, cid, round(list_cosine_similarity(v, c), 6) AS sim " +
        "FROM e, cents), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims) WHERE rn = 1), " +
        "probe AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims " +
        "WHERE vec_id < 5) WHERE rn <= 2), " +
        "cand AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id FROM probe p " +
        "JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.vec_id), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"
    },
    "s17_incremental_index" -> {
      // identical computation to s09's oracle (same seed/cells/probes)
      // over the VISIBLE corpus — the %10=7 slice was curation-deleted
      // and the CDC refresh tombstoned it out of the index, so the
      // stored index provably equals the full assignment of what's left
      val centers = seededCentroids(nCentroids = 8, seed = 23L)
      val centValues = centers.zipWithIndex.map { case (c, i) =>
        s"($i, ${c.map(_.toString).mkString("[", ", ", "]")})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v " +
        "FROM embeddings WHERE vec_id % 10 <> 7), " +
        s"cents(cid, c) AS (SELECT * FROM (VALUES $centValues) t(cid, c)), " +
        "sims AS (SELECT vec_id, cid, round(list_cosine_similarity(v, c), 6) AS sim " +
        "FROM e, cents), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims) WHERE rn = 1), " +
        "probe AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims " +
        "WHERE vec_id < 5) WHERE rn <= 2), " +
        "cand AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id FROM probe p " +
        "JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.vec_id), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"
    },
    "s12_lloyd_step_seeded" -> {
      // same seeded centroids, same rounded-cosine argmax assignment as
      // the Spark side; coordinates replay floor(v[i]·2^24) and the sums
      // are exact integers, so no rounding discipline is needed on the
      // reduce itself
      val centers = seededCentroids(nCentroids = 10, seed = 131L)
      val centValues = centers.zipWithIndex.map { case (c, i) =>
        s"($i, ${c.map(_.toString).mkString("[", ", ", "]")})"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        s"cents(cid, c) AS (SELECT * FROM (VALUES $centValues) t(cid, c)), " +
        "sims AS (SELECT vec_id, cid, round(list_cosine_similarity(v, c), 6) AS sim " +
        "FROM e, cents), " +
        "assign AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number() OVER " +
        "(PARTITION BY vec_id ORDER BY sim DESC, cid DESC) AS rn FROM sims) WHERE rn = 1), " +
        "x AS (SELECT a.cid, p.pos - 1 AS pos, " +
        "CAST(floor(e.v[p.pos] * 16777216.0) AS BIGINT) AS ci " +
        "FROM assign a JOIN e ON e.vec_id = a.vec_id, " +
        "(SELECT unnest(generate_series(1, 64)) AS pos) p) " +
        "SELECT cid, CAST(pos AS INT) AS pos, count(*) AS n_members, " +
        "CAST(sum(ci) AS BIGINT) AS coord_sum FROM x GROUP BY 1, 2 ORDER BY 1, 2"
    },
    "s10_knn_pq_seeded" -> {
      // the SAME seeded codebooks as the Spark side as literal DOUBLE[]s
      // (with precomputed ‖codeword‖² literals so the ADC norm table is
      // bit-identical); encode = rounded-L2 argmin with code-asc ties
      // (PqEncode's first-match-wins), ADC = the same left-assoc sum
      // order, rerank cut = (approx DESC, n_id ASC) — the bounded heap's
      // total order — then the exact re-rank
      val cb = graft.functions.PqCodebook(
        seededPqBooks(m = 8, k = 16, seed = 31L), roundTo = 6)
      val f = pqOracleFragments(cb)
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        s"${f.cbCtes}, ${f.encCtes}, " +
        s"codes AS (SELECT e.vec_id, ${f.codeCols} FROM e ${f.codeJoins}), " +
        "qt AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS q_norm " +
        "FROM e WHERE vec_id < 5), " +
        "adc AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id, " +
        s"round(${f.dotTerms} / (q.q_norm * sqrt(${f.nsTerms})), 6) AS approx " +
        "FROM qt q JOIN codes n ON n.vec_id <> q.vec_id), " +
        "cand AS (SELECT q_id, n_id FROM (SELECT q_id, n_id, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY approx DESC, n_id ASC) AS rn FROM adc) WHERE rn <= 256), " +
        "scored AS (SELECT q_id, n_id, list_cosine_similarity(eq.v, en.v) AS cos " +
        "FROM cand JOIN e eq ON eq.vec_id = q_id JOIN e en ON en.vec_id = n_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT q_id, rank, n_id, round(cos, 6) AS cos_sim FROM ranked WHERE rank <= 10"
    },
    "s11_knn_ivfpq_seeded" -> ivfPqSeededOracleSql(),
    // the stored-index probe computes the SAME result as s11 (identical
    // seeded quantizers, corpus, queries) — only WHERE the codes come
    // from differs (materialized cid-partitioned table vs inline encode)
    "s19_ivfpq_indexed" -> ivfPqSeededOracleSql("WHERE vec_id % 10 <> 7"),
    "s07_retrieval" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings), " +
        "q AS (SELECT vec_id, v FROM e WHERE vec_id < 3), " +
        "scored AS (SELECT q.vec_id AS q_id, e.vec_id AS n_id, " +
        "list_cosine_similarity(q.v, e.v) AS cos FROM q JOIN e ON e.vec_id <> q.vec_id), " +
        "ranked AS (SELECT q_id, n_id, cos, row_number() OVER " +
        "(PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank FROM scored) " +
        "SELECT r.q_id, r.rank, r.n_id, round(r.cos, 6) AS cos_sim, " +
        "substring(d.text, 1, 40) AS snippet " +
        "FROM ranked r JOIN documents d ON d.doc_id = r.n_id " +
        "WHERE r.rank <= 5 ORDER BY r.q_id, r.rank"),
    "s03_label_centroid_norm" -> {
      val sumTerms = (0 until 64)
        .map(i => s"pow(sum(v[${i + 1}]) / count(*), 2)").mkString(" + ")
      "WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) v FROM embeddings) " +
        s"SELECT label, count(*) AS n_vecs, round(sqrt($sumTerms), 6) AS centroid_norm " +
        "FROM e GROUP BY label ORDER BY label"
    }
  )
}
