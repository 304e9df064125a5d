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
case class ZOrderKey(children: Seq[Expression]) extends Expression {

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
    ZOrderKey.interleave(vals)
  }

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
    ev.copy(
      code = code"""$assigns
         long ${ev.value} = graft.functions.ZOrderKey.interleave($arr);""",
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

  def zorder_key(cols: Column*): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(ZOrderKey(cols.map(b.expr).toSeq))
  }
}
