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

  test("feature extraction distributes: runs per-partition, not on the driver") {
    val ds = Multimodal.extractFeatures(assets, "asset_id", "payload")
    assert(ds.rdd.getNumPartitions == 3)
    // payloads joinable downstream without shuffle of binary data back
    val joined = ds.toDF().join(assets, ds("assetId") === assets("asset_id"))
    assert(joined.count() == 3)
  }
}
