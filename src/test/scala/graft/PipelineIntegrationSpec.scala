package graft

import org.apache.spark.sql.functions._

import graft.table.{GraftChangeFeed, GraftTable}

/** Full-stack integration: the prep pipeline's output lands in a graft
  * table via append commits, is consumed incrementally by a change feed,
  * and remains time-travelable — query surface and storage layer working
  * as one system, the way a production corpus-curation job would run.
  */
class PipelineIntegrationSpec extends SparkSpecBase {

  test("curated corpus: pipeline → graft table → incremental consumer → time travel") {
    val d = "/root/testdata/sf0.001"
    val curated = graft.queries.Pipeline
      .queries("p01_prep_pipeline")(spark, d)

    val dir = tmpDir("pipeline-sink")
    val t = GraftTable.create(s"$dir/corpus", curated.schema)

    // batch 1: documents with doc_id < 250; batch 2: the rest — two
    // snapshots, as if the pipeline ran on two ingest partitions
    t.append(curated.filter(col("doc_id") < 250), Some(1000L))
    t.append(curated.filter(col("doc_id") >= 250), Some(2000L))

    val total = curated.count()
    assert(total > 0)
    assert(t.read(spark).count() == total)

    // snapshot 1 holds exactly the first batch (time travel)
    val snap1 = t.read(spark, Some(1L))
    assert(snap1.count() == curated.filter(col("doc_id") < 250).count())
    assert(snap1.filter(col("doc_id") >= 250).count() == 0)

    // an incremental consumer sees each batch exactly once
    val feed = new GraftChangeFeed(t, s"$dir/ckpt")
    var batches = List.empty[Long]
    while (feed.poll(spark)(df => batches :+= df.count()).isDefined) {}
    // first poll catches up to the current snapshot in one go
    assert(batches == List(total))

    // fingerprints stay unique end to end (dedup survived the write)
    val fps = t.read(spark).select("fingerprint")
    assert(fps.distinct().count() == fps.count())

    // and the sink's min/max manifest stats prune on doc_id: a batch-2-only
    // key keeps exactly the batch-2 file(s), not batch 1's
    val manifest = graft.table.Manifest.read(
      s"${t.dir}/${t.log.current.get.manifestList}")
    val expr = GraftTable.resolveAgainst(spark, t.schema,
      org.apache.spark.sql.classic.GraftBridge.expr(col("doc_id") === 260L))
    val kept = manifest.files.filter(f =>
      graft.table.Pruning.mayMatch(expr, f.stats, t.schema))
    assert(kept.nonEmpty && kept.size < manifest.files.size,
      s"pruning kept ${kept.size} of ${manifest.files.size} files")
  }

  test("write-audit-publish ingest: stage on a branch, dedup-audit, publish only novel docs") {
    val d = "/root/testdata/sf0.001"
    val curated = graft.queries.Pipeline
      .queries("p01_prep_pipeline")(spark, d)

    val dir = tmpDir("wap-ingest")
    val t = GraftTable.create(s"$dir/corpus", curated.schema)
    t.append(curated.filter(col("doc_id") < 250), Some(1000L))
    val corpusCount = t.read(spark).count()

    // the arriving batch: genuinely new docs PLUS re-crawls of five
    // already-ingested ones — same content (fingerprint), fresh crawl
    // ids, the realistic duplicate shape
    val arriving = curated.filter(col("doc_id") >= 250)
      .union(curated.filter(col("doc_id") < 5)
        .withColumn("doc_id", col("doc_id") + 100000L))

    // stage on a branch — the corpus never sees the raw batch
    val br = t.createBranch("ingest", Some(1500L))
    br.append(arriving, Some(2000L))
    assert(t.read(spark).count() == corpusCount)

    // audit ON THE BRANCH: staged rows whose fingerprint already exists
    // at the FORK snapshot are duplicates; delete them branch-side
    // (d14's batch-vs-corpus probe with the branch as the staging area —
    // the id guard keeps the fork files themselves out of the rewrite)
    val corpusFps = t.read(spark).select(col("fingerprint")).distinct()
      .collect().map(_.getString(0)) // bounded here; at scale: anti-join
    br.delete(spark,
      col("doc_id") >= 100000L &&
        col("fingerprint").isin(corpusFps.toIndexedSeq: _*), Some(2500L))

    // publish: one atomic commit lands exactly the novel docs
    t.publishBranch("ingest", Some(3000L))
    t.dropBranch("ingest")
    val fps = t.read(spark).select("fingerprint")
    assert(fps.distinct().count() == fps.count(),
      "published corpus must hold no duplicate fingerprints")
    assert(t.read(spark).count() == curated.count())
    // the change feed nets the publish to exactly the novel rows
    val delta = t.changes(spark, fromSnapshotId = 1L)
    assert(delta.count() == curated.filter(col("doc_id") >= 250).count())
  }
}
