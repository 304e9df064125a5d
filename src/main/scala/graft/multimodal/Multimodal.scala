package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: images / audio /
  * video ride through the engine as opaque `binary` columns next to typed
  * metadata, and all per-asset compute happens inside `mapPartitions` so
  * executors process assets in batches with zero driver involvement.
  *
  * The actual codec is STUBBED ([[decodeStub]]) — image/audio libraries are
  * not available in this environment — with a deterministic fake whose
  * outputs depend only on the payload bytes, so the Spark-side plumbing
  * (schema, encoders, partition batching, explode shapes) is fully real
  * and testable. Swap [[decodeStub]] for a real codec (JNI/FFI or an
  * external service call batched per partition) and nothing else changes.
  *
  * Scale notes: payloads never pass through the driver; per-partition
  * iterators stream assets one at a time (no per-partition materialization
  * beyond the current asset); frame sampling is a flatMap so output rows
  * pipeline into downstream operators without a shuffle.
  */
object Multimodal {

  /** Fake decode result standing in for a decoded image/audio buffer. */
  case class Decoded(
      width: Int,
      height: Int,
      format: String,
      meanByte: Double,
      features: Array[Float])

  case class AssetFeatures(
      assetId: Long,
      nBytes: Long,
      width: Int,
      height: Int,
      format: String,
      meanByte: Double,
      features: Array[Float])

  case class Frame(assetId: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** STUB codec: deterministic pseudo-decode from the payload bytes.
    * A real implementation would parse the container format here. */
  def decodeStub(payload: Array[Byte]): Decoded = {
    val h = payload.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 10, 1024).toInt
    val mean =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
    // 8-dim "embedding": moments of byte windows — deterministic fake
    val feats = Array.tabulate(8) { i =>
      val slice = payload.drop(i * payload.length / 8)
        .take(math.max(1, payload.length / 8))
      if (slice.isEmpty) 0.0f
      else (slice.map(b => (b & 0xff).toLong).sum.toFloat / slice.length / 255f)
    }
    Decoded(width, height, if (payload.length % 2 == 0) "even" else "odd",
      mean, feats)
  }

  /** Decode + feature-extract each asset, batched per partition.
    * Input needs columns (`idCol`: long, `payloadCol`: binary). */
  def extractFeatures(
      assets: DataFrame,
      idCol: String,
      payloadCol: String): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition batch: real codecs would init once here
        it.map { case (id, payload) =>
          val d = decodeStub(payload)
          AssetFeatures(id, payload.length.toLong, d.width, d.height,
            d.format, d.meanByte, d.features)
        }
      }
  }

  /** Sample up to `nFrames` fixed-size chunks ("frames") per asset —
    * the video-frame-sampling shape: one input row explodes to n output
    * rows, pipelined (no shuffle). */
  def sampleFrames(
      assets: DataFrame,
      idCol: String,
      payloadCol: String,
      nFrames: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        if (payload.isEmpty) Iterator.empty
        else {
          val frameSize = math.max(1, payload.length / nFrames)
          (0 until math.min(nFrames,
            (payload.length + frameSize - 1) / frameSize)).iterator
            .map(i => Frame(id, i,
              payload.slice(i * frameSize,
                math.min((i + 1) * frameSize, payload.length))))
        }
      }
  }
}
