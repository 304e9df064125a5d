package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al.) heavy-hitters state: at most `m`
  * (item, count, error) counters. `count` upper-bounds the item's true
  * frequency; `count - error` lower-bounds it — the standard guarantee,
  * preserved through merges (Agarwal et al., "Mergeable Summaries").
  * Eviction scans for the min counter — O(m) per unseen item once full,
  * fine at sketch sizes (production stream-summary linked lists trade
  * memory for O(1); the BOUND is what matters at 100 TB, not the
  * constant).
  */
final class SpaceSavingState(val m: Int) {
  val items = new java.util.HashMap[String, Array[Long]]() // [count, error]

  private def minEntry(): java.util.Map.Entry[String, Array[Long]] = {
    var best: java.util.Map.Entry[String, Array[Long]] = null
    val it = items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (best == null || e.getValue()(0) < best.getValue()(0)) best = e
    }
    best
  }

  /** Smallest counter value, 0 while not full (absent items may truly
    * have count 0). */
  def minCount: Long =
    if (items.size() < m) 0L else minEntry().getValue()(0)

  def add(item: String, count: Long, error: Long): Unit = {
    val cur = items.get(item)
    if (cur != null) {
      cur(0) += count; cur(1) += error
    } else if (items.size() < m) {
      items.put(item, Array(count, error))
    } else {
      // evict the min counter; the newcomer inherits its count as error
      val ev = minEntry()
      val evCount = ev.getValue()(0)
      items.remove(ev.getKey)
      items.put(item, Array(evCount + count, evCount + error))
    }
  }

  def addOne(item: String): Unit = add(item, 1L, 0L)

  /** Entries sorted (count desc, item asc) — deterministic output. */
  def sorted: Array[(String, Long, Long)] = {
    val out = new Array[(String, Long, Long)](items.size())
    val it = items.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue()(0), e.getValue()(1)); i += 1
    }
    out.sortBy { case (item, c, _) => (-c, item) }
  }
}

/** Approximate heavy hitters per group: `space_saving(item, m)` returns
  * `array<struct<item: string, count: long, error: long>>` sorted by
  * estimated count — the frequent-items sketch next to HLL (distincts)
  * and KLL (quantiles) in the approximate toolbox. True frequency f of
  * any item satisfies `count - error <= f <= count`, and every item with
  * f > n/m is guaranteed present.
  *
  * Scale: state is m counters per group regardless of input; partial
  * aggregation runs map-side, and merges add counters (absent side
  * contributes its minCount as both count and error — the mergeable-
  * summaries rule, keeping both bounds sound). The exact alternative
  * (groupBy token, global sort) shuffles every distinct token; this
  * ships m counters per partition.
  */
case class SpaceSavingSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] with UnaryLike[Expression] {

  require(m > 0, s"space_saving requires m > 0, got $m")

  override def prettyName: String = "space_saving"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item column, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("error", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(m)

  override def update(buf: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    if (v != null) buf.addOne(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    // Agarwal et al. merge, implemented literally: build the COMBINED
    // summary (both sides: counts/errors add; one side only: the absent
    // side's min counter joins both count and error), then keep the top m
    // by count. Folding `other` in via add() instead would route new
    // items through the EVICTION path, double-charging them with the
    // evicted counter on top of the min — inflated, merge-order-dependent
    // estimates.
    val bufMin = buf.minCount
    val otherMin = other.minCount
    val combined = new java.util.HashMap[String, Array[Long]]()
    val bi = buf.items.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val o = other.items.get(e.getKey)
      combined.put(e.getKey,
        if (o != null) Array(e.getValue()(0) + o(0), e.getValue()(1) + o(1))
        else Array(e.getValue()(0) + otherMin, e.getValue()(1) + otherMin))
    }
    val oi = other.items.entrySet().iterator()
    while (oi.hasNext) {
      val e = oi.next()
      if (!combined.containsKey(e.getKey))
        combined.put(e.getKey,
          Array(e.getValue()(0) + bufMin, e.getValue()(1) + bufMin))
    }
    // keep the m largest counts (ties by item for determinism)
    val entries = new Array[(String, Array[Long])](combined.size())
    val ci = combined.entrySet().iterator()
    var i = 0
    while (ci.hasNext) {
      val e = ci.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val top = entries.sortBy { case (item, v) => (-v(0), item) }.take(buf.m)
    buf.items.clear()
    top.foreach { case (item, v) => buf.items.put(item, v) }
    buf
  }

  override def eval(buf: SpaceSavingState): Any =
    new GenericArrayData(buf.sorted.map { case (item, c, err) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c, err))
    })

  override def serialize(buf: SpaceSavingState): Array[Byte] = {
    val entries = buf.sorted
    val payloads = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(
      4 + payloads.map(_.length + 4 + 16).sum)
    bb.putInt(entries.length)
    entries.zip(payloads).foreach { case ((_, c, err), p) =>
      bb.putInt(p.length); bb.put(p); bb.putLong(c); bb.putLong(err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new SpaceSavingState(m)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val p = new Array[Byte](len); bb.get(p)
      st.add(new String(p, StandardCharsets.UTF_8), bb.getLong, bb.getLong)
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingSketch =
    copy(child = newChild)
}

object SpaceSavingSketch {
  /** Aggregate Column API: `space_saving(item, m)`. */
  def space_saving(item: Column, m: Int): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(SpaceSavingSketch(b.expr(item), m).toAggregateExpression())
  }
}
