package graft.table

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-file lineage constant lookup (row-id band base / committing
  * snapshot id): basename → long, shipped to tasks as ONE reference
  * object instead of a plan-sized literal map. NULL for files absent
  * from the map — pre-lineage files read NULL row ids (the Iceberg
  * pre-upgrade stance), never a wrong id. Rows arrive file-clustered,
  * so a per-thread last-seen memo collapses the per-row map lookup to
  * one bytes compare (the [[DvIndex]] discipline). */
final class LineageIndex(val byBasename: Map[String, Long])
    extends Serializable {
  @transient private lazy val lastSeen =
    new ThreadLocal[Array[AnyRef]] {
      override def initialValue(): Array[AnyRef] = new Array[AnyRef](2)
    }

  def lookup(bn: UTF8String): java.lang.Long = {
    val memo = lastSeen.get()
    val last = memo(0).asInstanceOf[UTF8String]
    if (last != null && bn.equals(last))
      return memo(1).asInstanceOf[java.lang.Long]
    val v: java.lang.Long =
      byBasename.get(bn.toString).map(Long.box).orNull
    memo(0) = bn.clone()
    memo(1) = v
    v
  }
}

/** `lineage_base(fileBasename)` — the file's per-row lineage constant
  * (band base or snapshot id), codegen'd, NULL when unknown. */
@ExpressionDescription(usage = "internal: per-file lineage constant")
case class LineageLookup(child: Expression, index: LineageIndex)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lineage_base"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val f = child.eval(input)
    if (f == null) null
    else {
      val v = index.lookup(f.asInstanceOf[UTF8String])
      if (v == null) null else v.longValue()
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val idx = ctx.addReferenceObj("lineageIndex", index,
      classOf[LineageIndex].getName)
    val fEv = child.genCode(ctx)
    val boxed = ctx.freshName("lineageVal")
    ev.copy(code = code"""
      ${fEv.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!(${fEv.isNull})) {
        java.lang.Long $boxed = $idx.lookup(${fEv.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }
    """)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LineageLookup = copy(child = newChild)
}
