package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) key over 2-4 integer columns — the multi-dimensional
  * clustering key for [[graft.table.GraftTable.compact]]'s sorted
  * rewrites. A lexicographic sort clusters only its FIRST column (files
  * get tight min/max on it, full-range on the rest); interleaving the
  * columns' bits gives every dimension locality, so min/max file pruning
  * stays selective for predicates on ANY of the participating columns —
  * the standard layout trick for multi-dimension scan-heavy tables
  * (Delta/Iceberg `zorder by`).
  *
  * Key construction: each value maps order-preservingly to unsigned
  * (sign-bit flip), keeps its TOP `63/n` bits, and the bit-planes are
  * interleaved MSB-first. Nulls sort first (key 0 — below any real key's
  * leading bit pattern is not guaranteed, but null grouping is: all-null
  * rows share one key). Codegen'd via a static helper (one small loop per
  * row, no boxing).
  */
case class ZOrderKey(
    children: Seq[Expression],
    ranges: Seq[(Long, Long)] = Nil) extends Expression {

  require(ranges.isEmpty || ranges.size == children.size,
    s"ranges (${ranges.size}) must match columns (${children.size})")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2-4 integer columns, got ${children.size}")
    else children.find(c =>
        c.dataType != IntegerType && c.dataType != LongType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires INT or BIGINT columns, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "zorder_key"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      vals(i) = v match {
        case null => Long.MinValue // flips to unsigned 0: nulls group first
        case l: Long => l
        case x: Int => x.toLong
      }
      i += 1
    }
    if (ranges.isEmpty) ZOrderKey.interleave(vals)
    else ZOrderKey.interleaveRanged(vals, minsArr, maxsArr)
  }

  @transient private lazy val minsArr: Array[Long] = ranges.map(_._1).toArray
  @transient private lazy val maxsArr: Array[Long] = ranges.map(_._2).toArray

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val n = children.size
    val arr = ctx.freshName("zvals")
    val childCodes = children.map(_.genCode(ctx))
    val assigns = childCodes.zipWithIndex
      .foldLeft(code"long[] $arr = new long[$n];") { case (acc, (c, i)) =>
        code"""$acc
           ${c.code}
           $arr[$i] = ${c.isNull} ? Long.MIN_VALUE : (long) ${c.value};"""
      }
    val call =
      if (ranges.isEmpty) code"graft.functions.ZOrderKey.interleave($arr)"
      else {
        val mins = ctx.addReferenceObj("zmins", minsArr, "long[]")
        val maxs = ctx.addReferenceObj("zmaxs", maxsArr, "long[]")
        code"graft.functions.ZOrderKey.interleaveRanged($arr, $mins, $maxs)"
      }
    ev.copy(
      code = code"""$assigns
         long ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {

  /** Interleave the top `63/n` bits of each (sign-flipped) value,
    * MSB-first: bit j of dimension i lands at position j*n + i from the
    * top. Static so generated code calls it directly. */
  def interleave(vals: Array[Long]): Long = {
    val n = vals.length
    val bitsPer = 63 / n
    var out = 0L
    var j = 0
    while (j < bitsPer) {
      var i = 0
      while (i < n) {
        val u = vals(i) ^ Long.MinValue // order-preserving unsigned map
        val bit = (u >>> (63 - j)) & 1L
        out = (out << 1) | bit
        i += 1
      }
      j += 1
    }
    out
  }

  /** RANGE-NORMALIZED interleave: each value is first scaled from its
    * observed [min, max] onto the full `63/n`-bit grid, then the planes
    * interleave. Without this, realistic value ranges (any INT column,
    * LONG ids below ~2^33) have identical TOP bits everywhere and the
    * raw interleave degenerates to a constant — clustering silently does
    * nothing. Rounding in the double scale can tie adjacent values
    * (harmless: the key orders LAYOUT, it never decides correctness —
    * min/max pruning reads real file stats). */
  def interleaveRanged(
      vals: Array[Long], mins: Array[Long], maxs: Array[Long]): Long = {
    val n = vals.length
    val bitsPer = 63 / n
    val gridMax = (1L << bitsPer) - 1
    val norm = new Array[Long](n)
    var i = 0
    while (i < n) {
      val mn = mins(i); val mx = maxs(i)
      norm(i) =
        if (mx <= mn) 0L
        else {
          val v = Math.max(mn, Math.min(mx, vals(i)))
          // signed `mx - mn` overflows when the observed span exceeds
          // Long.MaxValue (a large negative AND a large positive bound in
          // one input) — the negative divisor would yield garbage
          // coordinates and silently degrade the clustering to exactly
          // the degenerate case range-normalization exists to fix.
          // Offsets in the order-preserving unsigned domain (x ^ MinValue)
          // always fit unsigned 64-bit; identical results when no overflow.
          // 53-bit double mantissa >= bitsPer (<= 31): fine for layout.
          val umn = mn ^ Long.MinValue
          val span = unsignedToDouble((mx ^ Long.MinValue) - umn)
          val off = unsignedToDouble((v ^ Long.MinValue) - umn)
          (off / span * gridMax).toLong
        }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bitsPer) {
      i = 0
      while (i < n) {
        out = (out << 1) | ((norm(i) >>> (bitsPer - 1 - j)) & 1L)
        i += 1
      }
      j += 1
    }
    out
  }

  /** Bits-as-unsigned-64 → Double (layout precision only). */
  def unsignedToDouble(x: Long): Double =
    if (x >= 0) x.toDouble else (x >>> 1).toDouble * 2.0 + (x & 1L)

  def zorder_key(cols: Column*): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(ZOrderKey(cols.map(b.expr).toSeq))
  }

  /** [[zorder_key]] with per-column observed (min, max) bounds — the form
    * [[graft.table.GraftTable.compact]] uses after its bounds pass. */
  def zorder_key_ranged(rangesIn: Seq[(Long, Long)], cols: Column*): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(ZOrderKey(cols.map(b.expr).toSeq, rangesIn))
  }
}
