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

/** `regexp_replace(s, "\\s+", " ")` as ONE byte scan — the whitespace
  * normalizer under every exact-dedup fingerprint (d01/d02/p01/p02/st01's
  * admission digest), which paid a full Java-regex pass AND a rebuilt
  * string per row. Byte-scan equivalence: Java's `\s` (no
  * UNICODE_CHARACTER_CLASS) is exactly `[ \t\n\x0B\f\r]` — six ASCII
  * code units that are single bytes in UTF-8 and can never occur inside
  * a multi-byte sequence, so collapsing byte runs of them to one 0x20
  * produces the identical string the regex does (each maximal run →
  * one space, including leading/trailing runs — NOT a trim).
  * Property-pinned against regexp_replace in TextOpsSpec. */
case class CollapseWs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "collapse_ws"

  def collapse(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    // fast path: scan for the first byte the regex would touch (any
    // whitespace that is part of a run, or any non-space whitespace);
    // rows already normalized return the input with zero allocation
    var firstHit = -1
    var prevWs = false
    while (firstHit < 0 && i < n) {
      val b = s.getByte(i)
      val ws = b == 32 || (b >= 9 && b <= 13)
      if (ws && (b != 32 || prevWs)) firstHit = i
      prevWs = ws
      i += 1
    }
    if (firstHit < 0) return s
    val out = new Array[Byte](n)
    var k = 0
    var inRun = false
    i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == 32 || (b >= 9 && b <= 13)) {
        if (!inRun) { out(k) = 32; k += 1; inRun = true }
      } else {
        out(k) = b; k += 1; inRun = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, k)
  }

  override protected def nullSafeEval(input: Any): Any =
    collapse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("collapseWs", this, classOf[CollapseWs].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.collapse($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): CollapseWs =
    copy(child = newChild)
}

/** Counts of codepoints belonging to each given ASCII char class, in ONE
  * byte scan — the fused replacement for the
  * `length(regexp_replace(text, "[^<class>]", ""))` counting idiom, which
  * pays a full regex pass AND a string rebuild per class per row (t02 ran
  * four of them). Byte-scan equivalence: UTF-8 continuation/lead bytes of
  * non-ASCII codepoints are all >= 0x80, so counting bytes < 0x80 that
  * are in the class counts exactly the matching CODEPOINTS — the same
  * number `length()` reports after the regex strips the complement.
  * Returns array<int>, one count per class, in class order. */
case class AsciiClassCounts(child: Expression, classes: Seq[String])
    extends UnaryExpression {
  require(classes.nonEmpty && classes.forall(_.forall(_ < 128)),
    "ascii_class_counts requires non-empty ASCII-only classes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "ascii_class_counts"

  // one 128-slot membership row per class, built once per plan
  @transient private lazy val masks: Array[Array[Boolean]] =
    classes.map { cls =>
      val m = new Array[Boolean](128)
      cls.foreach(c => m(c.toInt) = true)
      m
    }.toArray

  def counts(s: UTF8String): ArrayData = {
    val ms = masks
    val out = new Array[Int](ms.length)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) {
        var c = 0
        while (c < ms.length) {
          if (ms(c)(b)) out(c) += 1
          c += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("asciiCounts", this,
      classOf[AsciiClassCounts].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.counts($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): AsciiClassCounts = copy(child = newChild)
}

/** Number of elements of a token array that belong to a small literal
  * set — the fused replacement for `size(filter(toks, x => x.isin(...)))`,
  * whose higher-order lambda evaluates INTERPRETED per token on every
  * corpus pass (the CLAUDE.md transform trap; t02 paid it on ~200 tokens
  * × every doc). Same linear-scan membership as [[RemoveTokens]] (stop
  * sets are tens of entries), no output allocation. Null elements count 0
  * (they are not tokens and can never equal a set member — `isin` yields
  * NULL for them, which `filter` drops). */
case class CountTokensIn(child: Expression, stop: Seq[String])
    extends UnaryExpression {
  require(stop.nonEmpty, "count_tokens_in requires a non-empty set")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "count_tokens_in"

  @transient private lazy val stopArr: Array[UTF8String] =
    stop.map(UTF8String.fromString).toArray

  def countIn(toks: ArrayData): Int = {
    val ss = stopArr
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var s = 0
        var hit = false
        while (!hit && s < ss.length) {
          if (ss(s).equals(t)) hit = true
          s += 1
        }
        if (hit) hits += 1
      }
      i += 1
    }
    hits
  }

  override protected def nullSafeEval(input: Any): Any =
    countIn(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("countTokensIn", this,
      classOf[CountTokensIn].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.countIn($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CountTokensIn = copy(child = newChild)
}

/** Per-row token statistics — `struct(n_tokens, n_distinct, top_n,
  * sum_len)` of one document's token array in one fused pass. This is
  * the [[Bigrams]]/[[KGrams]] discipline applied to the Gopher-rule
  * aggregate (t15): every output is a PER-DOC integer computable from
  * the array the row already holds, so spelling it as
  * `explode → groupBy(doc, tok) → groupBy(doc)` shuffles the entire
  * corpus token stream TWICE to rebuild per-row facts. Fields match the
  * aggregate formulation exactly: n_tokens = occurrences, n_distinct =
  * distinct tokens, top_n = max per-token count, sum_len = sum over
  * occurrences of `length(tok)` (codepoints). Null elements are skipped
  * (explode emits them but `length(null)*c` nulls out of the sum and a
  * null group adds no distinct token — tokens() never emits nulls
  * anyway). */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_n",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_len",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  def stats(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](math.max(8, n * 2))
    var nTokens = 0L
    var sumLen = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        nTokens += 1
        sumLen += t.numChars()
        counts.put(t, counts.getOrDefault(t, 0) + 1)
      }
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, counts.size.toLong, top, sumLen))
  }

  override protected def nullSafeEval(input: Any): Any =
    stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenStats", this,
      classOf[TokenStats].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.stats($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenStats = copy(child = newChild)
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

  /** Per-class codepoint counts of `text` for ASCII char classes, one
    * byte scan (array<int>, class order). */
  def ascii_class_counts(text: Column, classes: Seq[String]): Column =
    b.column(AsciiClassCounts(b.expr(text), classes))

  /** Count of `toks` elements in the small literal `stop` set. */
  def count_tokens_in(toks: Column, stop: Seq[String]): Column =
    b.column(CountTokensIn(b.expr(toks), stop))

  /** struct(n_tokens, n_distinct, top_n, sum_len) of one token array. */
  def token_stats(toks: Column): Column =
    b.column(TokenStats(b.expr(toks)))

  /** Count of `[a-zA-Z ]` codepoints — the clean_ratio numerator shared
    * by the quality gates (t02/p01/p02/d10), one byte scan instead of
    * `length(regexp_replace(text, "[^a-zA-Z ]", ""))`. */
  def clean_chars(text: Column): Column =
    ascii_class_counts(text,
      Seq(('a' to 'z').mkString + ('A' to 'Z').mkString + " "))(0)

  /** `regexp_replace(text, "\\s+", " ")` — the exact-dedup fingerprint
    * normalizer — as one byte scan (see [[CollapseWs]]). */
  def collapse_ws(text: Column): Column = b.column(CollapseWs(b.expr(text)))
}
