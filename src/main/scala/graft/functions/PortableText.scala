package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused per-row kernels for the PORTABLE (md5-based) shingle path — the
  * stateless streaming admission probe's per-row signature
  * ([[graft.streaming.DocStream.dupProbe]], replayed as st01). The batch
  * index side aggregates exploded rows; the probe side is per-row array
  * work, where the composed spelling (`array_distinct(transform(grams,
  * md5 → conv))` + one `array_min(transform(sh, (h*a+b) % M))` per
  * permutation) runs INTERPRETED per element × perms. These two kernels
  * are the codegen'd replacements; values are bit-identical (the st01
  * oracle hash and DocStreamSpec's stream/batch parity both pin them).
  */
object PortableText {
  private val b = org.apache.spark.sql.classic.GraftBridge
  private val M31 = 2147483647L

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** `conv(substring(md5(s), 1, 15), 16, 10)` — the top 60 bits of the
    * digest, big-endian (the engine-portable Dedup.portableHash value). */
  private[functions] def portableHashFull(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex digits = bytes 0..6 plus the HIGH nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  /** [[portableHashFull]] reduced mod 2^31-1 (the universal-hash-family
    * domain — products stay under 2^62 in ANSI mode). */
  private[functions] def portableHashRed(bytes: Array[Byte]): Long =
    portableHashFull(bytes) % M31

  /** Distinct portable shingle hashes of a token array, first-occurrence
    * order — `array_distinct(transform(kgrams(toks, k), g =>
    * portableHash[Red](g)))` fused into one pass (`reduce` picks the
    * mod-M31 family domain vs the full 60-bit value — the latter lets a
    * (doc, h)-distinct consumer drop its corpus-wide distinct EXCHANGE:
    * per-row distinct equals global distinct when the doc id is unique,
    * and hashing inside the dedup keeps hash-collision semantics
    * identical to distinct-after-hash). Short-doc collapse and the k=1
    * path follow [[KGrams]]. */
  case class PortableShingles(child: Expression, k: Int,
      reduce: Boolean = true)
      extends UnaryExpression {
    require(k >= 1, s"shingle size must be >= 1, got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "portable_shingles"

    def hashes(toks: ArrayData): ArrayData = {
      val grams = KGrams.compute(toks, k)
      val n = grams.numElements()
      val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
      var i = 0
      while (i < n) {
        val b = grams.getUTF8String(i).getBytes
        seen.add(if (reduce) portableHashRed(b) else portableHashFull(b))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      hashes(input.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("portableShingles", this,
        classOf[PortableShingles].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.hashes($v);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): PortableShingles = copy(child = newChild)
  }

  /** Distinct xxhash64 shingle hashes of a token array — the bulk-path
    * twin of [[PortableShingles]] (d03-family corpora keep xxhash64
    * semantics; see Dedup.portableHash's doc). Hash values are EXACTLY
    * Spark's `xxhash64(stringCol)`: XXH64 over the UTF-8 bytes with the
    * expression's default seed 42. Short-doc collapse / k=1 follow
    * [[KGrams]]. */
  case class XxShingles(child: Expression, k: Int)
      extends UnaryExpression {
    require(k >= 1, s"shingle size must be >= 1, got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.sql}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "xx_shingles"

    def hashes(toks: ArrayData): ArrayData = {
      val grams = KGrams.compute(toks, k)
      val n = grams.numElements()
      val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
      var i = 0
      while (i < n) {
        val g = grams.getUTF8String(i)
        seen.add(org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, 42L))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      hashes(input.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("xxShingles", this,
        classOf[XxShingles].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.hashes($v);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): XxShingles = copy(child = newChild)
  }

  /** Per-permutation minima of the universal-hash family over a hash-set
    * column — `array_min(transform(sh, h => (h*a_i + b_i) % M31))` for
    * every i, fused into one pass → `array<long>` of length perms.
    * An EMPTY input yields nulls per slot, matching `array_min` on an
    * empty array (cannot arise from [[PortableShingles]], which emits at
    * least one hash per non-null row). */
  case class MinHashOverSet(child: Expression, coefs: Seq[(Long, Long)],
      normalize: Boolean = false)
      extends UnaryExpression {

    @transient private lazy val coefA: Array[Long] = coefs.map(_._1).toArray
    @transient private lazy val coefB: Array[Long] = coefs.map(_._2).toArray

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "minhash_over_set"

    def minima(sh: ArrayData): ArrayData = {
      val n = sh.numElements()
      if (n == 0) return new GenericArrayData(
        Array.fill[Any](coefA.length)(null))
      val out = new Array[Long](coefA.length)
      java.util.Arrays.fill(out, Long.MaxValue)
      var j = 0
      while (j < n) {
        // normalize: inputs outside [0, M31) (raw xxhash64 values, which
        // can be negative) are reduced exactly like
        // MinHashSignature.update's h31 — same family values bit for bit
        val h = if (normalize) {
          val m = sh.getLong(j) % M31
          if (m < 0) m + M31 else m
        } else sh.getLong(j)
        var i = 0
        while (i < out.length) {
          val hv = (coefA(i) * h + coefB(i)) % M31
          if (hv < out(i)) out(i) = hv
          i += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def nullSafeEval(input: Any): Any =
      minima(input.asInstanceOf[ArrayData])

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("minhashOverSet", this,
        classOf[MinHashOverSet].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.minima($v);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): MinHashOverSet = copy(child = newChild)
  }

  def portable_shingles(toks: Column, k: Int): Column =
    b.column(PortableShingles(b.expr(toks), k))

  /** Distinct FULL 60-bit portable shingle hashes (no mod-M31 reduction)
    * — `explode` of this equals `shingleRows(…, portableHash).distinct()`
    * per unique doc id, without the corpus-wide distinct exchange. */
  def portable_shingles_full(toks: Column, k: Int): Column =
    b.column(PortableShingles(b.expr(toks), k, reduce = false))

  def minhash_over_set(sh: Column, coefs: Seq[(Long, Long)],
      normalize: Boolean = false): Column =
    b.column(MinHashOverSet(b.expr(sh), coefs.toVector, normalize))

  /** Distinct `xxhash64(shingle)` values of a token array, one fused
    * pass — the bulk-path (d03) twin of [[portable_shingles_full]]:
    * hashes equal Spark's `xxhash64(col)` on the shingle strings bit for
    * bit (XXH64 over the UTF-8 bytes, seed 42), so exploding this equals
    * the shingleRows(xxhash64) stream with per-row dedup. */
  def xx_shingles(toks: Column, k: Int): Column =
    b.column(XxShingles(b.expr(toks), k))
}
