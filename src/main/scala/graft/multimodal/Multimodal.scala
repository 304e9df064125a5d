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
    * A real implementation would parse the container format here.
    *
    * The pseudo-metadata hash is a position-weighted byte sum, NOT a
    * Java-wraparound polynomial fold: every intermediate stays far inside
    * a signed 64-bit range (≤ 255·97·len, then one bounded multiply), so
    * engines with CHECKED 64-bit arithmetic (DuckDB, ANSI Spark SQL) can
    * reproduce it exactly — which is what lets m02/m03 be oracle-checked
    * instead of rows-only. */
  def decodeStub(payload: Array[Byte]): Decoded = {
    var h = 0L
    var i = 0
    while (i < payload.length) {
      h += (payload(i) & 0xff).toLong * (1 + i % 97)
      i += 1
    }
    val width = 64 + (h % 1024).toInt
    // mix through a Mersenne-prime mod so height isn't a function of
    // width's low bits; (h % 2^20) * knuth ≤ 2.8e15 — no overflow
    val height = 64 + ((h % 1048576L) * 2654435761L % 2147483647L % 1024L).toInt
    // mean + windowed moments WITHOUT intermediate arrays: the map/drop/
    // take form allocated ~10x the payload per asset (an 800 MB
    // Array[Double] for a 100 MB video) — real asset sizes would GC-thrash
    // or OOM. Window arithmetic in Long: `i * length` overflows Int past
    // ~256 MB payloads and a negative start silently collapsed every
    // window to the payload head.
    val mean =
      if (payload.isEmpty) 0.0
      else {
        var sb = 0L; var j = 0
        while (j < payload.length) { sb += (payload(j) & 0xff); j += 1 }
        sb.toDouble / payload.length
      }
    val feats = Array.tabulate(8) { w =>
      val start = (w.toLong * payload.length / 8).toInt
      val len = math.min(math.max(1, payload.length / 8),
        payload.length - start)
      if (len <= 0) 0.0f
      else {
        var sw = 0L; var j = start
        val end = start + len
        while (j < end) { sw += (payload(j) & 0xff); j += 1 }
        (sw.toFloat / len / 255f)
      }
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
        it.map { case (id, payloadRaw) =>
          // null payload decodes as empty: the m02 oracle LEFT-JOINs and
          // COALESCEs (emits a row); an NPE here would diverge by crash
          val payload =
            if (payloadRaw == null) Array.emptyByteArray else payloadRaw
          val d = decodeStub(payload)
          AssetFeatures(id, payload.length.toLong, d.width, d.height,
            d.format, d.meanByte, d.features)
        }
      }
  }

  case class Resized(assetId: Long, nBytes: Long, pixels: Array[Int])

  /** STUB resize: average-pool the payload bytes down to a fixed
    * `target` resolution — byte j lands in pool floor(j·target/len),
    * pool value = floor(mean byte). Deterministic integer arithmetic
    * only, so the m02 oracle trick (replaying byte math over the ASCII
    * text in DuckDB) applies and resize is hash-checkable. A real
    * implementation would do bilinear/area resampling on the decoded
    * image here. */
  def resizeStub(payload: Array[Byte], target: Int): Array[Int] = {
    if (payload.isEmpty) Array.fill(target)(0)
    else {
      val sums = new Array[Long](target)
      val counts = new Array[Int](target)
      var j = 0
      while (j < payload.length) {
        val p = (j.toLong * target / payload.length).toInt
        sums(p) += (payload(j) & 0xff)
        counts(p) += 1
        j += 1
      }
      Array.tabulate(target)(p =>
        if (counts(p) == 0) 0 else (sums(p) / counts(p)).toInt)
    }
  }

  /** Resize every asset to a fixed `target` resolution, batched per
    * partition like [[extractFeatures]]. */
  def resize(
      assets: DataFrame,
      idCol: String,
      payloadCol: String,
      target: Int = 16): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    assets.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payloadRaw) =>
          val payload =
            if (payloadRaw == null) Array.emptyByteArray else payloadRaw
          Resized(id, payload.length.toLong, resizeStub(payload, target))
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
        if (payload == null || payload.isEmpty) Iterator.empty
        else {
          val frameSize = math.max(1, payload.length / nFrames)
          // ceil in Long: the Int form wraps negative past ~2^31-frameSize
          // bytes and would silently emit zero frames for the largest assets
          val nChunks = ((payload.length.toLong + frameSize - 1) / frameSize).toInt
          (0 until math.min(nFrames, nChunks)).iterator
            .map(i => Frame(id, i,
              payload.slice(i * frameSize,
                math.min((i + 1) * frameSize, payload.length))))
        }
      }
  }
}
