package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Multimodal plumbing: binary payloads survive the round trip, the stub
  * codec is deterministic, frame sampling covers the payload exactly, and
  * processing is partition-parallel (no driver materialization).
  */
class MultimodalSpec extends SparkSpecBase {

  private lazy val assets = {
    import spark.implicits._
    Seq(
      (1L, "hello multimodal world".getBytes("UTF-8")),
      (2L, Array.tabulate(1000)(i => (i % 251).toByte)),
      (3L, Array.emptyByteArray)
    ).toDF("asset_id", "payload").repartition(3)
  }

  test("extractFeatures: deterministic stub decode with full schema") {
    val out = Multimodal.extractFeatures(assets, "asset_id", "payload")
      .collect().map(f => f.assetId -> f).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).nBytes == 22L)
    assert(out(2L).nBytes == 1000L)
    assert(out(3L).nBytes == 0L && out(3L).meanByte == 0.0)
    assert(out(1L).features.length == 8)
    // determinism: a second run yields bit-identical features
    val again = Multimodal.extractFeatures(assets, "asset_id", "payload")
      .collect().map(f => f.assetId -> f).toMap
    assert(out(2L).features.toSeq == again(2L).features.toSeq)
    assert(out(2L).width == again(2L).width)
  }

  test("sampleFrames: frames partition the payload, empty payload yields none") {
    val frames = Multimodal.sampleFrames(assets, "asset_id", "payload", 4)
      .collect()
    val byAsset = frames.groupBy(_.assetId)
    assert(!byAsset.contains(3L))
    assert(byAsset(2L).length == 4)
    assert(byAsset(2L).map(_.frameBytes.length).sum == 1000)
    // frame order + reassembly = original payload
    val reassembled = byAsset(2L).sortBy(_.frameIdx)
      .flatMap(_.frameBytes).toSeq
    assert(reassembled == Array.tabulate(1000)(i => (i % 251).toByte).toSeq)
  }

  test("m04 decode->ANN composition: neighbors match an independent exact recompute") {
    // m04 has no SQL oracle (binary codec + float cosine), so this is its
    // quality bound: recompute exact cosine top-5 over the SAME decoded
    // features with plain Scala and require >= 0.9 recall of the
    // distributed result (ties at the k-boundary may legally differ).
    val d = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("m04_feature_knn")(spark, d)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val feats = {
      import spark.implicits._
      val assets = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .collect()
      assets.map { case (id, p) =>
        id -> Multimodal.decodeStub(p).features.map(_.toDouble)
      }.toMap
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na) / math.sqrt(nb)
    }
    val expected = (for {
      q <- feats.keys.filter(_ < 3)
      top = feats.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(feats(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5)
      (n, _) <- top
    } yield (q, n)).toSet
    val recall = (got & expected).size.toDouble / expected.size
    assert(recall >= 0.9, s"decode->ANN recall $recall vs exact recompute")
  }

  test("feature extraction distributes: runs per-partition, not on the driver") {
    val ds = Multimodal.extractFeatures(assets, "asset_id", "payload")
    assert(ds.rdd.getNumPartitions == 3)
    // payloads joinable downstream without shuffle of binary data back
    val joined = ds.toDF().join(assets, ds("assetId") === assets("asset_id"))
    assert(joined.count() == 3)
  }

  test("m06 perceptual hash: identical payloads group, a re-encode with a " +
      "flipped tail does not") {
    // two docs with byte-identical text + one whose trailing half differs
    // everywhere: the first pair MUST share a phash group; the third must
    // not join it (its upper pools sit on the other side of its mean).
    import spark.implicits._
    val base = ("spark " * 40).trim            // 239 ASCII bytes
    val loud = ("spark " * 20 + "ZZZZZ " * 20).trim
    val docs = Seq(
      (101L, base, "en", "srcA", base.length.toLong),
      (102L, base, "en", "srcA", base.length.toLong),
      (103L, loud, "en", "srcA", loud.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("m06-docs")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val groups = graft.SparkEntry.queries("m06_phash_dups")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("assets").split(',').map(_.toLong).toSet)
    assert(groups.exists(_ == Set(101L, 102L)),
      s"identical payloads must share a phash group; got ${groups.toSeq}")
    assert(!groups.exists(g => g.contains(103L)),
      "the tail-flipped payload must not collide with the base pair")
  }

  test("resizeStub: average-pools bytes; empty and short payloads are total") {
    // 16 bytes → 4 pools of 4: means of consecutive quads
    val p16 = Array.tabulate(16)(i => (i * 10).toByte)
    assert(Multimodal.resizeStub(p16, 4).toSeq ==
      Seq((0 + 10 + 20 + 30) / 4, (40 + 50 + 60 + 70) / 4,
        (80 + 90 + 100 + 110) / 4, (120 + 130 + 140 + 150) / 4))
    // empty payload → all-zero pixels, never a crash
    assert(Multimodal.resizeStub(Array.empty[Byte], 4).toSeq == Seq(0, 0, 0, 0))
    // payload SHORTER than the target: byte j lands in pool j*target/len,
    // unhit pools stay 0
    assert(Multimodal.resizeStub(Array[Byte](10, 20), 4).toSeq ==
      Seq(10, 0, 20, 0))
    // unsigned byte handling: 0xFF pools to 255, not -1
    assert(Multimodal.resizeStub(Array(0xff.toByte), 2).toSeq == Seq(255, 0))
  }
}
