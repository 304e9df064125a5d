package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Distributed-path state-machine mirror for the MinHash signature
  * aggregate: random streams split into random partitions, per-partition
  * buffers, serialize/deserialize round-trips, merges in random order —
  * the result must equal the signature computed directly over the whole
  * stream, for every trial. (Partition-split + merge-order invariance is
  * exactly what map-side partial aggregation relies on.)
  */
class MinHashSignatureSpec extends AnyFunSuite {

  private val M31 = 2147483647L

  test("property: partition/merge/serde invariant equals direct signature") {
    val rng = new scala.util.Random(314159)
    for (_ <- 1 to 50) {
      val perms = 1 + rng.nextInt(32)
      val coefs = Seq.fill(perms)(
        (rng.nextLong().abs % (M31 - 1) + 1, rng.nextLong().abs % M31))
      val agg = MinHashSignature(BoundReference(0, LongType, nullable = true),
        coefs)
      val n = 1 + rng.nextInt(500)
      // values may be any longs (update reduces mod M31, incl. negatives)
      val stream = Seq.fill(n)(rng.nextLong())

      val direct = {
        val buf = agg.createAggregationBuffer()
        stream.foreach(v => agg.update(buf, InternalRow(v)))
        buf.clone()
      }

      val parts = stream.grouped(1 + rng.nextInt(100)).toSeq
      val bufs = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(v => agg.update(b, InternalRow(v)))
        // partial buffers cross the wire: round-trip every one
        agg.deserialize(agg.serialize(b))
      }
      val merged = rng.shuffle(bufs)
        .reduce((a, b) => agg.merge(a, b))
      assert(merged.toSeq == direct.toSeq,
        s"perms=$perms n=$n parts=${parts.size}")

      // reference semantics: each slot is the min of (a·h31+b) mod M31
      val expected = coefs.map { case (a, b) =>
        stream.map { v =>
          val m = v % M31
          val h31 = if (m < 0) m + M31 else m
          (a * h31 + b) % M31
        }.min
      }
      assert(direct.toSeq == expected, s"perms=$perms n=$n")
    }
  }

  test("null inputs are ignored; empty buffer evals to null") {
    val agg = MinHashSignature(BoundReference(0, LongType, nullable = true),
      Seq((3L, 5L), (7L, 11L)))
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(null))
    assert(agg.eval(buf) == null)
    agg.update(buf, InternalRow(10L))
    assert(agg.eval(buf) != null)
  }
}
