package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token-array kernels for the corpus passes of the text
  * pipeline (reference scope: the Hive-delegated scalar surface,
  * `SURVEY.md` §2.4 — these are the engine-side equivalents of per-doc
  * reshaping a user would otherwise push through a window or a
  * re-aggregation).
  *
  * Both exist to delete SHUFFLES, not to micro-optimize arithmetic:
  *
  *  - [[Bigrams]] pairs adjacent tokens per row. The composable spelling
  *    (`posexplode` → window `lead` over `(doc, pos)`) sorts and shuffles
  *    the ENTIRE token stream by doc just to look one element ahead
  *    inside an array each row already holds; this emits the pairs in one
  *    narrow projection.
  *  - [[RemoveTokens]] filters a token array against a small stop set.
  *    The composable spelling (explode → anti-join → `collect_list(struct)`
  *    → `array_sort`) shuffles every surviving token with its position to
  *    rebuild an order the input array never lost; this keeps the row
  *    intact and the pass narrow.
  *
  * Array higher-order functions (`transform`/`filter`/`zip_with`) could
  * express both but run INTERPRETED per element (CLAUDE.md sharp edge);
  * these are codegen'd via the PqEncode pattern — one reference object,
  * one fused JVM loop.
  */
case class Bigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bigrams"

  private val space = UTF8String.fromString(" ")

  /** out(i) = toks(i) + " " + toks(i+1); fewer than two tokens → empty
    * (explode of the result then emits nothing, matching the window
    * formulation where a lone token has no successor row). */
  def pairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    var cur = toks.getUTF8String(0)
    while (i < n - 1) {
      val nxt = toks.getUTF8String(i + 1)
      out(i) = UTF8String.concat(cur, space, nxt)
      cur = nxt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bigrams", this, classOf[Bigrams].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.pairs($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

/** Whitespace tokenization — `filter(split([lower(]trim(text)[)],
  * "\\s+"), t => length(t) > 0)` fused into one call. The composed
  * spelling's `filter` is an interpreted higher-order lambda evaluated
  * per token on EVERY corpus pass (the CLAUDE.md transform trap); this
  * kernel calls the very same engine primitives (`UTF8String.trim`,
  * `UTF8String.toLowerCase`, the Java regex Spark's `split` delegates
  * to) and drops empties in the same loop — values identical by
  * construction and spec-pinned in TextOpsSpec.
  */
case class Tokens(child: Expression, lowercase: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def toks(s: UTF8String): ArrayData = {
    val t0 = s.trim()
    val t1 = if (lowercase) t0.toLowerCase else t0
    val parts = ws.split(t1.toString, -1)
    val out = new Array[Any](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) {
        out(n) = UTF8String.fromString(parts(i))
        n += 1
      }
      i += 1
    }
    new GenericArrayData(if (n == out.length) out else out.take(n))
  }

  override protected def nullSafeEval(input: Any): Any =
    toks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokens", this, classOf[Tokens].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.toks($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

/** Word k-grams of a token array, joined by single spaces — the shingle
  * constructor of the whole MinHash/decontamination family, replacing the
  * posexplode + window-`lead` spelling that sort-shuffled the ENTIRE
  * corpus token stream by doc id just to look k-1 slots ahead inside an
  * array each row already holds.
  *
  * Semantics mirror `Dedup.shingleRows` exactly (spec-pinned in
  * TextOpsSpec, oracle-pinned by every d/st query):
  *  - `n >= k`: the n-k+1 complete windows, `concat_ws(" ", …)`-joined;
  *  - `0 <= n < k` with `k > 1`: ONE shingle of all tokens (the
  *    short-doc collapse; an empty array yields `[""]` like
  *    `concat_ws` on no tokens);
  *  - `k == 1`: every token verbatim (an empty array yields no grams —
  *    the unigram path never had a short-collapse row).
  */
case class KGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kgrams"

  def grams(toks: ArrayData): ArrayData = KGrams.compute(toks, k)

  override protected def nullSafeEval(input: Any): Any =
    grams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("kgrams", this, classOf[KGrams].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.grams($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): KGrams =
    copy(child = newChild)
}

object KGrams {
  private val space = UTF8String.fromString(" ")

  /** The k-gram construction, callable from sibling kernels
    * ([[PortableText.PortableShingles]] fuses it with hashing). */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    if (k == 1) {
      new GenericArrayData(arr.asInstanceOf[Array[Any]])
    } else if (n >= k) {
      val out = new Array[Any](n - k + 1)
      i = 0
      while (i <= n - k) {
        out(i) = UTF8String.concatWs(space,
          java.util.Arrays.copyOfRange(arr, i, i + k): _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, arr: _*)))
    }
  }
}

/** Order-preserving `left` minus membership-in-`right` over string arrays.
  * `right` is expected SMALL (a stop set — tens of entries); membership is
  * a linear scan, which beats building a per-row hash set at that size.
  * Null elements in `left` are dropped (they are not tokens); a null
  * `right` makes the whole result null (standard binary null semantics).
  */
case class RemoveTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "remove_tokens"

  def strip(toks: ArrayData, stop: ArrayData): ArrayData = {
    val nStop = stop.numElements()
    val stopArr = new Array[UTF8String](nStop)
    var j = 0
    while (j < nStop) {
      stopArr(j) = if (stop.isNullAt(j)) null else stop.getUTF8String(j)
      j += 1
    }
    val n = toks.numElements()
    val out = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var hit = false
        var s = 0
        while (!hit && s < nStop) {
          if (stopArr(s) != null && stopArr(s).equals(t)) hit = true
          s += 1
        }
        if (!hit) { out(k) = t; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(if (k == n) out else out.take(k))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    strip(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("removeTokens", this, classOf[RemoveTokens].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $self.strip($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokens =
    copy(left = newLeft, right = newRight)
}

object TextOps {
  private val b = org.apache.spark.sql.classic.GraftBridge

  /** Adjacent-token bigrams ("tok nxt") of a string-array column. */
  def bigrams(toks: Column): Column = b.column(Bigrams(b.expr(toks)))

  /** Space-joined word k-grams with the shingleRows short-doc collapse. */
  def kgrams(toks: Column, k: Int): Column = b.column(KGrams(b.expr(toks), k))

  /** Non-empty whitespace tokens of `trim(text)` (optionally lowered). */
  def tokens(text: Column, lowercase: Boolean = true): Column =
    b.column(Tokens(b.expr(text), lowercase))

  /** `toks` with every element of the (small) `stop` array removed,
    * order preserved. */
  def remove_tokens(toks: Column, stop: Column): Column =
    b.column(RemoveTokens(b.expr(toks), b.expr(stop)))
}
