package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpecBase
import graft.queries.Dedup

/** The streaming dedup admission probe agrees with its batch twin, and the
  * corpus index round-trips through a materialized GraftTable — together
  * these back the d14 scaladoc's production claim: index once, probe each
  * arriving batch/stream in O(batch).
  */
class DocStreamSpec extends SparkSpecBase {

  private lazy val base =
    "the quick brown fox jumps over the lazy dog and runs far away " +
      "while the hunter watches from the hill with a long rifle"

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (0L, base),
      (1L, "completely different content about spark query engines and " +
        "distributed columnar execution at large scale with shuffles"),
      (2L, "yet another unrelated text mentioning parquet manifests " +
        "snapshots and time travel over versioned tables in a lake")
    ).toDF("doc_id", "text")
  }

  private lazy val batchDocs = Seq(
    (10L, base), // dup of corpus 0
    (11L, base.replace("lazy", "sleepy")), // near dup of corpus 0
    (12L, "entirely novel content that matches nothing in the corpus " +
      "about streaming watermarks and stateful aggregation semantics"))

  test("streaming probe verdicts match the batch incremental probe") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val expected = Dedup.minhashIncrementalDups(
        corpus, batchDocs.toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.4)
      .select("new_doc", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "batch probe found nothing — fixture broken")

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val query = DocStream.dupProbe(stream, corpus, "doc_id", "text",
        threshold = 0.4)
      .writeStream.format("memory").queryName("dprobe")
      .outputMode(OutputMode.Append()).start()
    // two micro-batches: verdicts must not depend on arrival batching
    input.addData(batchDocs.take(2): _*)
    query.processAllAvailable()
    input.addData(batchDocs.drop(2): _*)
    query.processAllAvailable()
    query.stop()

    // multi-band collisions may emit a pair once per band (documented);
    // the verdict SET is what must agree
    val got = spark.table("dprobe").select("new_doc", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"stream=$got batch=$expected")
  }

  test("st01 driver entry replays the streaming plan: a real MemoryStream " +
      "over the fixture produces identical verdicts and band counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val arriving = docs.filter(col("doc_id") % 10 === 0)
      .filter(col("text").isNotNull)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(arriving.nonEmpty)

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val query = DocStream.dupProbe(stream, corpus, "doc_id", "text",
        threshold = 0.5)
      .writeStream.format("memory").queryName("st01probe")
      .outputMode(OutputMode.Append()).start()
    // arrival batching must not matter
    input.addData(arriving.take(arriving.length / 2): _*)
    query.processAllAvailable()
    input.addData(arriving.drop(arriving.length / 2): _*)
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("st01probe")
      .groupBy("new_doc", "dup_of", "jaccard")
      .agg(count(lit(1)).as("n_bands"))
      .collect().map(_.toSeq).toSet
    val batch = graft.SparkEntry.queries("st01_admission_replay")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(batch == streamed && batch.nonEmpty,
      s"replay/stream divergence: batch=${batch.size} stream=${streamed.size}")
  }

  test("probe against an index materialized in a GraftTable is identical") {
    import graft.table.GraftTable
    val batch = {
      import spark.implicits._
      batchDocs.toDF("doc_id", "text")
    }
    val direct = Dedup.minhashIncrementalDups(
        corpus, batch, "doc_id", "text", threshold = 0.4)
      .collect().map(_.toSeq).toSet
    assert(direct.nonEmpty)

    // materialize the per-doc index relation once...
    val (perDoc, _) = Dedup.portableIndex(corpus, "doc_id", "text",
      k = 3, perms = 16, bands = 4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dedup-index").toString
    val tbl = GraftTable.create(s"$dir/idx", perDoc.schema)
    tbl.append(perDoc, committedAt = Some(1000L))

    // ...then probe with ONLY the batch recomputed: the corpus side is
    // the stored table (sets) + its re-exploded banded view
    val stored = GraftTable.load(s"$dir/idx").read(spark)
      .drop("snapshot__id")
    val res = Dedup.minhashProbeIndexed(
        stored, Dedup.bandBucketsFrom(stored, perms = 16, bands = 4),
        batch, "doc_id", "text", threshold = 0.4)
      .collect().map(_.toSeq).toSet
    assert(res == direct, s"stored-index=$res direct=$direct")
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
