package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH bucket keys against a literal plane family — the
  * sign-hash blocking of lshTopK (s02) and embeddingNearDups (d06).
  *
  * Replaces the composed formulation (`when(cosine_sim(v, plane_i) >= 0,
  * 1L << i)` folded over nTables × nPlanes literal 64-dim planes) for the
  * same reason as [[CellAssign]]: the literal expression tree scales with
  * the model and is re-paid at every plan build, while this ships the
  * family once as a reference object and runs one fused loop.
  *
  * Sign semantics are IDENTICAL to the composed form (property-tested in
  * LshBucketsSpec): the plane norms are positive, so `cosine >= 0` iff
  * `dot >= 0` — and on a zero-norm input the cosine is NaN, which Spark's
  * `>=` treats as greater than any number (sign bit SET), exactly like
  * `dot = +0.0 >= 0` here. Each table's 64-bit sign bucket is offset by
  * `table_index << nPlanes`, keeping buckets from different tables
  * disjoint in one flat key space.
  */
case class HyperplaneFamily(tables: Array[Array[Array[Double]]])
    extends Serializable {
  val nTables: Int = tables.length
  val nPlanes: Int = tables(0).length

  def buckets(v: ArrayData): ArrayData = {
    val out = new Array[Long](nTables)
    var ti = 0
    while (ti < nTables) {
      val planes = tables(ti)
      var bucket = 0L
      var pi = 0
      while (pi < nPlanes) {
        val p = planes(pi)
        val n = math.min(v.numElements(), p.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v.getDouble(i) * p(i); i += 1 }
        if (dot >= 0) bucket |= (1L << pi)
        pi += 1
      }
      out(ti) = bucket + ti.toLong * (1L << nPlanes)
      ti += 1
    }
    new GenericArrayData(out)
  }
}

/** `hyperplane_buckets(vec)` → one bucket key per table (`array<long>`). */
case class HyperplaneBuckets(child: Expression, fam: HyperplaneFamily)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    fam.buckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("hyperplaneFamily", fam,
      classOf[HyperplaneFamily].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $f.buckets($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

object LshBuckets {
  private val b = org.apache.spark.sql.classic.GraftBridge

  def family(tables: Seq[Seq[Array[Double]]]): HyperplaneFamily =
    HyperplaneFamily(tables.map(_.toArray).toArray)

  def hyperplane_buckets(v: Column, fam: HyperplaneFamily): Column =
    b.column(HyperplaneBuckets(b.expr(v), fam))
}
