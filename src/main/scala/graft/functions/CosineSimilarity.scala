package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * columns, with whole-stage codegen (`doGenCode` emits one fused loop).
  *
  * This is the hot scalar of the similarity/dedup surface (s01/s02/d06 run
  * it over every candidate pair). The `functions.aggregate`/`zip_with`
  * formulation is evaluated interpreted (higher-order lambdas don't
  * codegen) and allocates an intermediate product array per row; this
  * expression is a single pass, no allocation, inside the codegen'd stage.
  * Accumulation order is ascending-index for every term, matching both the
  * interpreted fold it replaces and DuckDB's evaluation — bit-identical
  * doubles, so oracle hash comparisons hold.
  *
  * Evaluates over min(len(a), len(b)) elements; null inputs → null
  * (BinaryExpression default); zero-norm inputs → NaN (caller filters).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $a.getDouble($i);
          double $yv = $b.getDouble($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        ${ev.value} = $dot /
          (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column API: `cosine_sim(x, y)` over `array<double>` columns. */
  def cosine_sim(x: Column, y: Column): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(CosineSimilarity(b.expr(x), b.expr(y)))
  }

  /** Aggregate Column API: exact per-group top-k as
    * `array<struct<id, score>>` sorted (score desc, id asc) — O(k) state,
    * map-side partial aggregation (see [[TopKByScore]]). */
  def top_k_by_score(score: Column, id: Column, k: Int): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(TopKByScore(b.expr(score), b.expr(id), k).toAggregateExpression())
  }

  /** Aggregate Column API: the group's distinct BIGINT ids, sorted, while
    * ≤ cap of them exist; NULL beyond — O(cap) state, map-side partials
    * (see [[DistinctIdsCapped]]). */
  def distinct_ids_capped(id: Column, cap: Int): Column = {
    val b = org.apache.spark.sql.classic.GraftBridge
    b.column(DistinctIdsCapped(b.expr(id), cap).toAggregateExpression())
  }

  /** Register the SQL surface (`SELECT cosine_sim(a.v, b.v) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
}
