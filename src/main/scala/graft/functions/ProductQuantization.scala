package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codebook, shared by the two PQ expressions.
  *
  * `books(m)(j)` is codeword j of subspace m; all subspaces have the same
  * width (`sub` = dim / m). Codebooks are bounded driver state (m × k ×
  * sub doubles) and ship to executors once per plan as a reference object
  * — NOT as literal expression trees, which is the whole point: the
  * composed-`Column` formulation (m × k slice/dot/struct/array_max
  * expressions) generates hundreds of kilobytes of Java per projection
  * and costs seconds of Janino compile time per plan, while these two
  * expressions generate one tight loop each regardless of m and k.
  */
case class PqCodebook(books: Array[Array[Array[Double]]], roundTo: Int = -1)
    extends Serializable {
  val m: Int = books.length
  val k: Int = books(0).length
  val sub: Int = books(0)(0).length
  /** ‖codeword‖² per (subspace, code) — the ADC norm table. */
  lazy val normSq: Array[Array[Double]] = books.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  })
  /** Flattened [m][k*sub] layout for branch-free codegen loops. */
  lazy val flat: Array[Array[Double]] = books.map(_.flatten)
}

/** Encode an `array<double>` vector as its `m` nearest-codeword indices
  * (exact L2 argmin per subspace, first-match-wins ties) →
  * `array<int>` of length m. One fused loop in both interpreted and
  * codegen paths.
  *
  * With `cb.roundTo >= 0` the argmin compares `round(sqrt(dist), roundTo)`
  * (Spark `round` = BigDecimal HALF_UP) instead of the raw squared
  * distance — the seeded-oracle twin pins near-tie argmins on BOTH
  * engines that way (the CellCodebook rounding discipline; DuckDB mirrors
  * with `round(list_distance(..), roundTo)` and code-asc tie order).
  */
case class PqEncode(child: Expression, cb: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  /** Shared by eval and the generated code (via reference object): one
    * argmin pass per subspace over the flattened codebook. */
  def encode(v: ArrayData): ArrayData = {
    val out = new Array[Int](cb.m)
    var mi = 0
    while (mi < cb.m) {
      val base = mi * cb.sub
      val flat = cb.flat(mi)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb.k) {
        var dist = 0.0
        var i = 0
        while (i < cb.sub) {
          val t = v.getDouble(base + i) - flat(j * cb.sub + i)
          dist += t * t
          i += 1
        }
        val d =
          if (cb.roundTo < 0) dist
          else java.math.BigDecimal.valueOf(math.sqrt(dist))
            .setScale(cb.roundTo, java.math.RoundingMode.HALF_UP).doubleValue()
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-subspace dot-product tables for a query vector:
  * `out[m][j] = dot(q_m, codeword(m, j))` → `array<array<double>>`
  * (m × k). The ADC scan then scores a coded corpus row with m table
  * lookups instead of any vector math.
  */
case class PqDotTables(child: Expression, cb: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def prettyName: String = "pq_dot_tables"

  def tables(v: ArrayData): ArrayData = {
    val out = new Array[ArrayData](cb.m)
    var mi = 0
    while (mi < cb.m) {
      val base = mi * cb.sub
      val flat = cb.flat(mi)
      val row = new Array[Double](cb.k)
      var j = 0
      while (j < cb.k) {
        var dot = 0.0
        var i = 0
        while (i < cb.sub) {
          dot += v.getDouble(base + i) * flat(j * cb.sub + i)
          i += 1
        }
        row(j) = dot
        j += 1
      }
      out(mi) = new GenericArrayData(row)
      mi += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(input: Any): Any =
    tables(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqDotTables", this, classOf[PqDotTables].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.tables($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDotTables =
    copy(child = newChild)
}

object ProductQuantization {
  private val b = org.apache.spark.sql.classic.GraftBridge

  def pq_encode(v: Column, cb: PqCodebook): Column =
    b.column(PqEncode(b.expr(v), cb))

  def pq_dot_tables(v: Column, cb: PqCodebook): Column =
    b.column(PqDotTables(b.expr(v), cb))
}
