package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Cosine cell assignment against a literal centroid codebook — the
  * IVF/SemDeDup coarse-quantizer family (Similarity.ivfTopK /
  * ivfProbeIndexed / ivfTopKSeeded / semanticDedup).
  *
  * The composed-`Column` formulation (`array_max(array(struct(cos(v, c0),
  * 0), …))` over nCentroids literal 64-dim vectors) is the PqEncode
  * anti-pattern from CLAUDE.md: a literal expression tree whose size
  * scales with the model, costing seconds of Janino compile per plan
  * build, re-paid on every DataFrame rebuild. These two expressions ship
  * the codebook once per plan as a reference object and run one fused
  * loop, independent of nCentroids.
  *
  * Semantics are BIT-IDENTICAL to the composed formulation (parity is
  * property-tested in CellAssignSpec):
  *  - per-centroid similarity is [[CosineSimilarity]]'s arithmetic
  *    (ascending-index accumulation, `dot / (sqrt(nx) * sqrt(ny))`),
  *    optionally rounded like Spark's `round(sim, roundTo)` — the
  *    seeded-oracle variant pins near-ties on BOTH engines that way;
  *  - comparisons use `java.lang.Double.compare`, Spark's SQL double
  *    ordering (NaN greater than everything, equal to itself), so a
  *    zero-norm vector (all-NaN sims) resolves ties exactly like
  *    `array_max`/`array_sort` on the (sim, cid) structs: to the LARGER
  *    centroid id.
  */
case class CellCodebook(centers: Array[Array[Double]], roundTo: Int = -1)
    extends Serializable {
  val k: Int = centers.length

  /** CosineSimilarity's exact arithmetic against centroid `ci`, with the
    * optional Spark-`round` applied. */
  def sim(v: ArrayData, ci: Int): Double = {
    val c = centers(ci)
    val n = math.min(v.numElements(), c.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = v.getDouble(i); val yv = c(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val s = dot / (math.sqrt(nx) * math.sqrt(ny))
    if (roundTo < 0 || java.lang.Double.isNaN(s) ||
      java.lang.Double.isInfinite(s)) s
    else java.math.BigDecimal.valueOf(s)
      .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** argmax cid by (sim, cid) — `>=` via Double.compare keeps the larger
    * cid on ties, matching struct-ordered array_max. */
  def argmax(v: ArrayData): Int = {
    var best = 0
    var bestS = sim(v, 0)
    var ci = 1
    while (ci < k) {
      val s = sim(v, ci)
      if (java.lang.Double.compare(s, bestS) >= 0) { best = ci; bestS = s }
      ci += 1
    }
    best
  }

  /** Top `n` cids by (sim desc, cid desc) — the order
    * `reverse(array_sort(array(struct(sim, cid)…)))` produces. */
  def topN(v: ArrayData, n: Int): ArrayData = {
    val sims = new Array[Double](k)
    var i = 0
    while (i < k) { sims(i) = sim(v, i); i += 1 }
    val take = math.min(n, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var o = 0
    while (o < take) {
      var best = -1
      var bestS = 0.0
      var ci = 0
      while (ci < k) {
        if (!used(ci) && (best < 0 ||
            java.lang.Double.compare(sims(ci), bestS) >= 0)) {
          best = ci; bestS = sims(ci)
        }
        ci += 1
      }
      used(best) = true
      out(o) = best
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** `cell_argmax(vec)` → the best centroid id (int). */
case class CellArgmax(child: Expression, cb: CellCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cell_argmax"

  override protected def nullSafeEval(input: Any): Any =
    cb.argmax(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val book = ctx.addReferenceObj("cellCodebook", cb, classOf[CellCodebook].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $book.argmax($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmax =
    copy(child = newChild)
}

/** `cell_topn(vec)` → the `n` best centroid ids, best first
  * (`array<int>`). */
case class CellTopN(child: Expression, cb: CellCodebook, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cell_topn"

  override protected def nullSafeEval(input: Any): Any =
    cb.topN(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val book = ctx.addReferenceObj("cellCodebook", cb, classOf[CellCodebook].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $book.topN($v, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): CellTopN =
    copy(child = newChild)
}

object CellAssign {
  private val b = org.apache.spark.sql.classic.GraftBridge

  def codebook(centers: Seq[Seq[Double]], roundTo: Int = -1): CellCodebook =
    CellCodebook(centers.map(_.toArray).toArray, roundTo)

  def cell_argmax(v: Column, cb: CellCodebook): Column =
    b.column(CellArgmax(b.expr(v), cb))

  def cell_topn(v: Column, cb: CellCodebook, n: Int): Column =
    b.column(CellTopN(b.expr(v), cb, n))
}
