package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** ANN quality: the LSH path must recover most of the exact top-k, and the
  * exact path must agree with a driver-side reference computation.
  */
class SimilaritySpec extends SparkSpecBase {

  private lazy val emb = spark.read.parquet(sf("embeddings"))

  test("brute-force top-k matches a driver-side reference on one query") {
    val got = Similarity.bruteForceTopK(emb,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("n_id")).toSeq

    // reference: local computation over collected vectors (test-only!)
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs(0L)
    val expect = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("k-means clusters cover the corpus with k non-empty clusters") {
    val out = Similarity.kmeansClusters(emb, "vec_id", "embedding", k = 10)
      .collect()
    assert(out.length == 10, s"got ${out.length} clusters")
    assert(out.map(_.getAs[Long]("n_members")).sum == emb.count())
    assert(out.forall(_.getAs[Long]("n_members") > 0))
    assert(out.forall(_.getAs[Double]("center_norm") > 0.0))
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10,
        nPlanes = 4, nTables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random gaussian data is LSH's hardest case (no cluster structure);
    // 8 tables × 4 planes should still recover most of the true top-10
    assert(recall >= 0.5, s"recall $recall")
    // and every approx hit must be a genuine neighbor ordering: approx
    // results are a subset of each query's bucket, scored exactly
    assert(approx.nonEmpty)
  }

  test("PQ top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(emb, queries, "vec_id", "embedding", 10,
        m = 8, codebook = 16, rerank = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 8×16 codebooks compress 64 dims 32×; the 64-candidate exact re-rank
    // must still recover most of the true top-10 even on gaussian data
    // (the quantizer's hardest case)
    assert(recall >= 0.5, s"PQ recall $recall")
    // exactly k per query: re-rank always has >= k candidates (rerank=64)
    assert(approx.size == exact.size)
  }

  test("IVF-PQ top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", 10,
        nCells = 16, nProbe = 6, m = 8, codebook = 16, rerank = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // the composed index stacks two approximations (probed cells AND
    // coded scoring) — the exact re-rank must still recover most of the
    // true top-10 on gaussian data
    assert(recall >= 0.5, s"IVF-PQ recall $recall")
    assert(approx.size == exact.size)
  }

  test("semantic dedup drops planted near-duplicate vectors and nothing else") {
    import spark.implicits._
    // plant: 3 exact/near copies of vector 0 (ids 9001-9003) + the corpus
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val v0 = base.filter(col("vec_id") === 0).head().getSeq[Double](1).toArray
    def jitter(eps: Double) = v0.zipWithIndex.map { case (x, i) =>
      x + (if (i % 2 == 0) eps else -eps) }
    val planted = Seq(
      (9001L, v0.toSeq), (9002L, jitter(1e-3).toSeq), (9003L, jitter(2e-3).toSeq))
      .toDF("vec_id", "v")
    val corpus = base.unionByName(planted)
    val dropped = Similarity.semanticDedup(corpus, "vec_id", "v",
        k = 8, tau = 0.97)
      .collect().map(_.getAs[Long]("dropped_id")).toSet
    // all planted copies are dropped (vector 0 itself is the lowest-id
    // witness and is kept)
    assert(Set(9001L, 9002L, 9003L).subsetOf(dropped), s"dropped=$dropped")
    assert(!dropped.contains(0L))
    // nothing unrelated is dropped at the real-world threshold: the
    // gaussian corpus tops out near cos 0.5
    assert(dropped.forall(_ >= 9001L), s"false positives: ${dropped.filter(_ < 9001L)}")
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nCentroids = 16, nProbe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // gaussian data has no cluster structure — the quantizer's worst
    // case; probing 4/16 cells must still recover most true neighbors
    assert(recall >= 0.5, s"IVF recall $recall")
    // k results per query: the probed cells always hold >= k candidates
    // at this corpus size
    assert(approx.size == exact.size)
  }

  test("IVF probe against an index materialized in a GraftTable is identical") {
    import graft.table.GraftTable
    val queries = emb.filter(col("vec_id") < 10)
    val direct = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 10,
        nCentroids = 8, nProbe = 3)
      .collect().map(_.toSeq).toSet
    assert(direct.nonEmpty)

    // build the index once, store assignments cid-PARTITIONED (probing a
    // cell then reads only that cell's files) + centroids as a tiny table
    val (assigned, centers) = Similarity.ivfIndex(emb, "vec_id", "embedding",
      nCentroids = 8)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    val at = GraftTable.create(s"$dir/assigned", assigned.schema,
      partitionBy = Seq("cid"))
    at.append(assigned, committedAt = Some(1000L))
    import spark.implicits._
    val ct = GraftTable.create(s"$dir/centers",
      centers.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cid", "vec").schema)
    ct.append(centers.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cid", "vec"), committedAt = Some(1000L))

    // probe with everything corpus-sized READ from storage
    val storedAssigned = GraftTable.load(s"$dir/assigned").read(spark)
      .drop("snapshot__id")
    val storedCenters = GraftTable.load(s"$dir/centers").read(spark)
      .orderBy("cid").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    val res = Similarity.ivfProbeIndexed(storedAssigned, storedCenters,
        queries, "vec_id", "embedding", 10, nProbe = 3)
      .collect().map(_.toSeq).toSet
    assert(res == direct, s"stored=${res.size} direct=${direct.size}")

    // the scale property the partitioned layout buys: one probed cell's
    // scan plans only that partition's files
    val oneCell = graft.table.GraftTable.load(s"$dir/assigned")
      .scan(spark, Some(col("cid") === 0))
    assert(oneCell.inputFiles.length <
      GraftTable.load(s"$dir/assigned").read(spark).inputFiles.length,
      "cid filter did not prune partitions")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("s17: incremental index == full rebuild; batch refresh is O(batch); probe prunes") {
    val sfDir = "/root/testdata/sf0.001"
    val idx = Similarity.incIdxFixture(spark, sfDir)

    // the snapshot-2 refresh wrote exactly the BATCH's rows — no corpus
    // reassignment (files added at snap 2 hold only the 10% batch)
    val m1 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(1L).get.manifestList}")
    val m2 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(2L).get.manifestList}")
    val snap1Paths = m1.files.map(_.path).toSet
    val added = m2.files.filterNot(f => snap1Paths.contains(f.path))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val batchRows = emb.filter(col("vec_id") % 10 === 0).count()
    val corpusRows = emb.count()
    assert(added.map(_.recordCount).sum == batchRows,
      "refresh rewrote more than the batch")
    assert(m2.totalRecords == corpusRows)

    // the snapshot-3 CURATION refresh (corpus delete → CDC window with
    // delete rows) landed as equality tombstones: not a single index
    // data file was added or rewritten by THAT commit — O(batch)
    // metadata, no rebuild
    val m3 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(3L).get.manifestList}")
    assert(m3.files.map(_.path).toSet == m2.files.map(_.path).toSet,
      "delete refresh must not touch index data files")
    assert(idx.log.byId(3L).get
        .summary.getOrElse("equality-deletes", "[]") != "[]",
      "delete refresh must land as equality tombstones")

    // the snapshot-4 DEBT FOLD (refreshIndexCdc's foldEvery threshold):
    // one row-preserving replace drains the tombstones, so probes stop
    // paying the per-read anti-join — the current probe plan has NO
    // anti-join while a snapshot-3 (pre-fold) read keeps one (control)
    assert(idx.log.byId(4L).exists(_.operation == "replace"),
      "delete refresh must fold the tombstone debt")
    assert(idx.equalityDeletes.isEmpty,
      "fold must drain the pending equality entries")
    val foldedPlan = idx.read(spark).queryExecution.optimizedPlan.toString
    assert(!foldedPlan.contains("LeftAnti"),
      s"post-fold read still pays the tombstone anti-join:\n$foldedPlan")
    assert(idx.read(spark, Some(3L)).queryExecution.optimizedPlan
        .toString.contains("LeftAnti"),
      "control: the pre-fold snapshot read should carry the anti-join")

    // incremental union equals a from-scratch assignment of the VISIBLE
    // corpus (the %10=7 slice was curation-deleted); a deleted vector is
    // never served
    val cb = graft.functions.CellAssign.codebook(
      Similarity.seededCentroids(nCentroids = 8, seed = 23L), roundTo = 6)
    val full = emb.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("n_v"))
      .withColumn("cid", graft.functions.CellAssign.cell_argmax(col("n_v"), cb))
      .select("n_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val inc = idx.read(spark).select("n_id", "cid")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(inc == full, "incremental index diverged from full rebuild")
    assert(!inc.keySet.exists(_ % 10 == 7),
      "index still serves curation-deleted vectors")

    // a probe's pinned-cell scan plans fewer files than the full index
    val probed = idx.scan(spark, Some(col("cid").isin(0, 1)))
    assert(probed.inputFiles.length < idx.read(spark).inputFiles.length,
      "probe scan did not prune to the probed cells")
    // and the probed-cell read applies the tombstones too
    assert(probed.filter(col("n_id") % 10 === 7).count() == 0L,
      "probed-cell scan served a deleted vector")
  }

  test("s19: stored IVF-PQ codes — incremental == rebuild; probe never re-encodes") {
    val sfDir = "/root/testdata/sf0.001"
    val idx = Similarity.ivfPqIdxFixture(spark, sfDir)

    // the snapshot-2 refresh ENCODED exactly the batch's rows — no
    // corpus re-encode (files added at snap 2 hold only the 10% batch)
    val m1 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(1L).get.manifestList}")
    val m2 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(2L).get.manifestList}")
    val snap1Paths = m1.files.map(_.path).toSet
    val added = m2.files.filterNot(f => snap1Paths.contains(f.path))
    val embRaw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val batchRows = embRaw.filter(col("vec_id") % 10 === 0).count()
    assert(added.map(_.recordCount).sum == batchRows,
      "refresh encoded more than the batch")
    assert(m2.totalRecords == embRaw.count())

    // the snapshot-3 curation refresh: equality tombstones only, no
    // index data file added or rewritten, no re-encode
    val m3 = graft.table.Manifest.read(
      s"${idx.dir}/${idx.log.byId(3L).get.manifestList}")
    assert(m3.files.map(_.path).toSet == m2.files.map(_.path).toSet,
      "delete refresh must not touch index data files")
    assert(idx.log.byId(3L).get
        .summary.getOrElse("equality-deletes", "[]") != "[]",
      "delete refresh must land as equality tombstones")
    // snapshot-4 debt fold: tombstones drained, probes anti-join-free
    assert(idx.log.byId(4L).exists(_.operation == "replace"),
      "delete refresh must fold the tombstone debt")
    assert(idx.equalityDeletes.isEmpty,
      "fold must drain the pending equality entries")
    assert(!idx.read(spark).queryExecution.optimizedPlan.toString
        .contains("LeftAnti"),
      "post-fold read still pays the tombstone anti-join")

    // incremental union equals a from-scratch (cid, codes) assignment
    // of the VISIBLE corpus (%10=7 curation-deleted)
    val cellCb = graft.functions.CellAssign.codebook(
      Similarity.seededCentroids(nCentroids = 8, seed = 53L), roundTo = 6)
    val pqCb = graft.functions.PqCodebook(
      Similarity.seededPqBooks(m = 8, k = 16, seed = 61L), roundTo = 6)
    val full = embRaw.filter(col("vec_id") % 10 =!= 7)
      .select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("n_v"))
      .select(col("n_id"),
        graft.functions.CellAssign.cell_argmax(col("n_v"), cellCb).as("cid"),
        graft.functions.ProductQuantization.pq_encode(col("n_v"), pqCb)
          .as("codes"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2))))
      .toMap
    val inc = idx.read(spark).select("n_id", "cid", "codes")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2))))
      .toMap
    assert(inc == full, "incremental index diverged from full rebuild")
    assert(!inc.keySet.exists(_ % 10 == 7),
      "index still serves curation-deleted vectors")

    // the probe hash-matches the inline-encode s11 plan over the
    // visible corpus (same seeded quantizers, queries)
    val probe = Similarity.ivfPqIdxProbe(spark, sfDir)
    val inline = Similarity.ivfPqTopKSeeded(
      emb.filter(col("vec_id") % 10 =!= 7),
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    assert(probe.collect().map(_.toSeq).toSet ==
      inline.collect().map(_.toSeq).toSet,
      "stored-index probe diverged from the inline IVF-PQ plan")

    // the materialization payoff: NO pq_encode of the corpus anywhere in
    // the probe plan (the inline plan has one — control)
    val probePlan = probe.queryExecution.optimizedPlan.toString
    assert(!probePlan.contains("pq_encode"),
      "probe plan re-encodes the corpus")
    assert(inline.queryExecution.optimizedPlan.toString.contains("pq_encode"),
      "control: the inline plan should contain pq_encode")

    // probed-cell file pruning on the stored codes
    val probedScan = idx.scan(spark, Some(col("cid").isin(0, 1)))
    assert(probedScan.inputFiles.length < idx.read(spark).inputFiles.length,
      "probe scan did not prune to the probed cells")
  }

  test("refreshIndexCdc bounds tombstone debt across delete windows") {
    import graft.table.GraftTable
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idx-debt").toString
    val corpusDf = emb.limit(60)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpus = GraftTable.create(s"$dir/corpus", corpusDf.schema)
    corpus.append(corpusDf, Some(1000L))
    val cb = graft.functions.CellAssign.codebook(
      Similarity.seededCentroids(nCentroids = 8, seed = 23L), roundTo = 6)
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").as("n_id"), col("v").as("n_v"))
      .withColumn("cid", graft.functions.CellAssign.cell_argmax(col("n_v"), cb))
    def build(name: String): GraftTable = {
      val base = assign(corpus.read(spark, Some(1L)).drop("snapshot__id"))
      val t = GraftTable.create(s"$dir/$name", base.schema)
      t.append(base, Some(1000L))
      t
    }
    def depth(t: GraftTable): Int = t.equalityDeletes.map(_.covs.size).sum
    // three delete windows on the corpus
    (0 until 3).foreach { w =>
      corpus.delete(spark, col("vec_id") % 7 === w, Some(2000L + w)): Unit
    }
    // default policy (foldEvery=1): debt NEVER accumulates — every
    // delete window folds immediately, probes stay anti-join-free
    val eager = build("eager")
    val depthsEager = (0 until 3).map { w =>
      Similarity.refreshIndexCdc(spark, eager,
        corpus.changesCdc(spark, 1L + w, Some(2L + w)), "vec_id", assign,
        Some(2000L + 2 * w))
      depth(eager)
    }
    assert(depthsEager == Seq(0, 0, 0), s"debt leaked: $depthsEager")
    // raised threshold (foldEvery=3): depth grows to the threshold and
    // then folds — bounded by the policy, amortized O(index)/3
    val lazyIdx = build("lazied")
    val depthsLazy = (0 until 3).map { w =>
      Similarity.refreshIndexCdc(spark, lazyIdx,
        corpus.changesCdc(spark, 1L + w, Some(2L + w)), "vec_id", assign,
        Some(2000L + 2 * w), foldEvery = 3)
      depth(lazyIdx)
    }
    assert(depthsLazy == Seq(1, 2, 0), s"threshold not honored: $depthsLazy")
    // both policies serve the identical visible index
    val a = eager.read(spark).select("n_id", "cid")
      .collect().map(_.toSeq).toSet
    val b = lazyIdx.read(spark).select("n_id", "cid")
      .collect().map(_.toSeq).toSet
    assert(a == b, "fold policy changed the served index")
    assert(!a.map(_.head.asInstanceOf[Long]).exists(id =>
      (0 until 3).exists(w => id % 7 == w)), "retracted ids still served")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("corpus curation delete + index tombstone publish as ONE transaction") {
    import graft.table.{GraftCatalog, GraftTable}
    // the consistency story end-to-end: a curation DELETE on the corpus
    // and the CDC-driven index refresh consuming it (equality tombstone)
    // stage inside one warehouse transaction — a reader between stage
    // and publish sees NEITHER; after publish the index never serves
    // the retracted vectors and "incremental == rebuild" still holds
    val wh = java.nio.file.Files
      .createTempDirectory("graft-txn-idx").toString
    val cat = new GraftCatalog(wh)
    val corpusDf = emb.limit(60)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpus = cat.createTable("db.corpus", corpusDf.schema)
    corpus.append(corpusDf, Some(1000L))
    val cb = graft.functions.CellAssign.codebook(
      Similarity.seededCentroids(nCentroids = 8, seed = 23L), roundTo = 6)
    def assign(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").as("n_id"), col("v").as("n_v"))
      .withColumn("cid", graft.functions.CellAssign.cell_argmax(col("n_v"), cb))
    val base = assign(corpus.read(spark).drop("snapshot__id"))
    val index = cat.createTable("db.index", base.schema)
    index.append(base, Some(1000L))

    val txn = cat.beginTransaction()
    val c = txn.table("db.corpus")
    val i = txn.table("db.index")
    c.delete(spark, col("vec_id") % 3 === 0, Some(2000L))
    // the refresh consumes the STAGED CDC window — visible only inside
    // the transaction
    Similarity.refreshIndexCdc(spark, i,
      c.changesCdc(spark, 1L, Some(2L)), "vec_id", assign, Some(2000L))
    // published names still serve the PRE-curation state of BOTH tables
    assert(GraftTable.load(s"$wh/db/corpus").read(spark).count() == 60L)
    assert(GraftTable.load(s"$wh/db/index").read(spark)
      .filter(col("n_id") % 3 === 0).count() > 0L)
    txn.commit()
    // one visible event: corpus and index agree, retracted ids gone
    val cIds = GraftTable.load(s"$wh/db/corpus").read(spark)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val iIds = GraftTable.load(s"$wh/db/index").read(spark)
      .select("n_id").collect().map(_.getLong(0)).toSet
    assert(cIds == iIds, s"corpus/index diverged: ${cIds.diff(iIds)} / " +
      s"${iIds.diff(cIds)}")
    assert(!iIds.exists(_ % 3 == 0), "index serves retracted vectors")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(wh))
  }
}
