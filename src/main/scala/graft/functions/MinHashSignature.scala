package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE custom aggregate (SURVEY.md §7.2 M5:
  * `TypedImperativeAggregate` for sketch buffers).
  *
  * Equivalent in measured speed to aggregating `perms` separate `min(...)`
  * columns, but structurally better: one primitive `Array[Long]` buffer
  * updated by a tight loop instead of a 64-column generated aggregate —
  * the buffer serializes compactly for map-side partial aggregation, the
  * permutation family is a plain constructor argument (easy to extend to
  * weighted/banded variants), and the generated code stays small as perms
  * grows.
  *
  * Family: h_i(x) = (a_i·x + b_i) mod M31 over inputs already reduced
  * below 2^31 (coefficients below 2^31 keep products under 2^62 — no
  * overflow even under ANSI semantics; this is plain JVM arithmetic
  * anyway).
  */
case class MinHashSignature(
    child: Expression,
    coefs: Seq[(Long, Long)],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  // coefs is a Seq (structural equals/hashCode) so Catalyst canonicalization
  // and semanticEquals can deduplicate repeated aggregates; an Array field
  // here would compare by reference and silently defeat plan equality.
  // The hot update loop reads these flat primitive copies instead.
  @transient private lazy val coefA: Array[Long] = coefs.map(_._1).toArray
  @transient private lazy val coefB: Array[Long] = coefs.map(_._2).toArray

  private val M31 = 2147483647L

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(coefs.length)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h31 = {
        val m = v.asInstanceOf[Long] % M31
        if (m < 0) m + M31 else m
      }
      var i = 0
      while (i < coefA.length) {
        val hv = (coefA(i) * h31 + coefB(i)) % M31
        if (hv < buffer(i)) buffer(i) = hv
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.forall(_ == Long.MaxValue)) null
    else new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSignature =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

object MinHashSignature {
  /** Aggregate Column: minhash signature of a BIGINT hash column. */
  def minhash_signature(hashCol: Column, coefs: Seq[(Long, Long)]): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(MinHashSignature(b.expr(hashCol), coefs.toVector)
      .toAggregateExpression())
  }
}
