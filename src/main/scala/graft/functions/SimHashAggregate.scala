package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash of a group's hash column as ONE custom aggregate — the
  * [[MinHashSignature]] pattern applied to the bit-sum family.
  *
  * Replaces the 64-generated-`sum(when((h >> b) & 1 = 1, 1, -1))`-columns
  * aggregate + 64-term assembly projection in the d05/d15 pipelines: the
  * buffer is one primitive `Array[Long]` of per-bit sums updated by a
  * tight loop (compact serialization for map-side partial aggregation),
  * and the generated plan stays small instead of carrying 64 aggregate
  * expressions' worth of Janino input per build.
  *
  * Result is BIT-IDENTICAL to the composed form: integer sums are
  * order-independent, and assembly sets bit b iff its sum is strictly
  * positive — a group whose inputs are all NULL assembles to 0L exactly
  * like `when(NULL > 0, …)` does columnwise.
  */
case class SimHashAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buffer(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (buffer(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAggregate =
    copy(child = newChildren.head)
}

object SimHashAggregate {
  /** Aggregate Column: 64-bit simhash of a BIGINT hash column. */
  def simhash_agg(hashCol: Column): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(SimHashAggregate(b.expr(hashCol)).toAggregateExpression())
  }
}
