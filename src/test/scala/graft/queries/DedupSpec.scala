package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Behavior of the near-dup operators on planted duplicates — the checks
  * the DuckDB oracle can't express (MinHash/SimHash aren't SQL).
  */
class DedupSpec extends SparkSpecBase {

  private lazy val base =
    "the quick brown fox jumps over the lazy dog and runs far away " +
      "while the hunter watches from the hill with a long rifle"

  /** corpus: two exact copies, one near-copy (one word changed), one
    * shuffled-tail variant, and unrelated documents. */
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, base),
      (1L, base), // exact dup of 0
      (2L, base.replace("lazy", "sleepy")), // near dup of 0
      (3L, "completely different content about spark query engines and " +
        "distributed columnar execution at large scale with shuffles"),
      (4L, "yet another unrelated text mentioning parquet manifests " +
        "snapshots and time travel over versioned tables in a lake"),
      (5L, base + " extra trailing words appended here") // superset near dup
    ).toDF("doc_id", "text")
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup missed: $pairs")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      s"near dup missed: $pairs")
    assert(pairs.contains((0L, 5L)) || pairs.contains((1L, 5L)),
      s"superset dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc 3 matched: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc 4 matched: $pairs")
  }

  test("exact duplicates have jaccard 1.0; near dups below") {
    val rows = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.1)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(rows((0L, 1L)) == 1.0)
    rows.get((0L, 2L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("simhash: identical texts share signature; near dups are close in hamming") {
    val sh = Dedup.simhashDups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) == sh(1L))
    assert(hamming(sh(0L), sh(2L)) <= 12,
      s"near dup too far: ${hamming(sh(0L), sh(2L))}")
    assert(hamming(sh(0L), sh(3L)) > 12,
      s"unrelated too close: ${hamming(sh(0L), sh(3L))}")
  }

  test("embedding near-dup finds planted duplicate vectors only") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    def vec() = Array.fill(64)(rng.nextGaussian().toFloat)
    val v0 = vec()
    // v1 = v0 plus tiny noise (cos ≈ 1); v2..v9 random
    val v1 = v0.map(x => x + 0.001f * rng.nextGaussian().toFloat)
    val rows = Seq((0L, v0), (1L, v1)) ++ (2L to 9L).map(i => (i, vec()))
    val emb = rows.toDF("vec_id", "embedding")

    val dups = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      threshold = 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.toSet == Set((0L, 1L)), s"got: ${dups.mkString(",")}")
  }

  test("unigram shingles (k=1) work; invalid parameters are rejected") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", k = 1,
        threshold = 0.4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"exact dup missed at k=1: $pairs")
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDups(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDups(docs, "doc_id", "text", perms = 64, bands = 15)
    }
  }

  test("dupClusters converges on a diameter-8 planted chain") {
    import spark.implicits._
    // a path graph 10-11-12-...-18: diameter 8, so any fixed small
    // iteration count would split it; the fixpoint loop must not.
    // plus a disjoint triangle {30,31,32} and a singleton pair {40,41}.
    val chain = (10L until 18L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((30L, 31L), (31L, 32L), (30L, 32L), (40L, 41L)))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (10L to 18L).foreach(d => assert(got(d) == 10L, s"chain split at $d: $got"))
    (30L to 32L).foreach(d => assert(got(d) == 30L))
    assert(got(40L) == 40L && got(41L) == 40L)
    assert(got.size == 14)
  }

  test("dupClusters throws rather than returning split clusters at maxIters") {
    import spark.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // the single-partition fast path raises the guard INSIDE its one
    // task, so Spark may wrap it — assert on the cause chain, not the
    // outermost type (the distributed path throws driver-side directly)
    val e = intercept[Exception] {
      Dedup.dupClusters(chain, maxIters = 2).collect()
    }
    def chainOf(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chainOf(t.getCause)
    assert(chainOf(e).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("no fixpoint")), e.toString)
  }

  test("incremental dedup: batch probes corpus only, not itself") {
    import spark.implicits._
    val corpus = docs.filter(col("doc_id") <= 4)
    // batch: one dup of corpus doc 0, one batch-internal dup pair (10/11),
    // one fresh doc — only the corpus hit may be reported
    val batch = Seq(
      (10L, base),
      (11L, base),
      (12L, "entirely novel content that matches nothing in the corpus " +
        "about streaming watermarks and stateful aggregation semantics")
    ).toDF("doc_id", "text")
    val hits = Dedup.minhashIncrementalDups(corpus, batch, "doc_id", "text",
        threshold = 0.4)
      .select("new_doc", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((10L, 0L)) || hits.contains((10L, 1L)),
      s"batch dup of corpus doc missed: $hits")
    assert(hits.contains((11L, 0L)) || hits.contains((11L, 1L)),
      s"batch dup of corpus doc missed: $hits")
    // batch-internal pair (10, 11) must NOT appear — that's the next
    // batch-self-dedup pass, not the corpus-membership probe
    assert(!hits.exists(h => h._1 == 10L && h._2 == 11L), s"self pair: $hits")
    assert(!hits.exists(_._1 == 12L), s"false positive: $hits")
    // every reported dup_of is a corpus doc, every new_doc a batch doc
    assert(hits.forall { case (n, c) => n >= 10L && c <= 4L }, s"$hits")
  }

  test("minhash pipeline has no driver-side materialization") {
    // the whole near-dup plan must stay a DataFrame lineage (no collect):
    // building it must not trigger any Spark job
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = Dedup.minhashNearDups(docs, "doc_id", "text")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(plan.queryExecution.logical != null)
    assert(before == after, "plan construction ran Spark jobs")
  }
}
