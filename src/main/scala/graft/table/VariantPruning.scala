package graft.table

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MANIFEST-LEVEL file pruning for VARIANT paths.
  *
  * Spark 4 shreds variant writes by default: each inferred path lands as
  * its own parquet `typed_value` subcolumn with ordinary footer min/max.
  * [[ParquetStats]] harvests those bounds into the manifest under
  * guarded pseudo-column keys (`__v$<col>:<path>:<fam>`), but ONLY for
  * files where every fallback `value` column on the path is entirely
  * null — i.e. every row's value at that path took the typed subcolumn,
  * so the bounds describe ALL non-null extractions (a single
  * type-mixed row routes to the fallback and discards the key:
  * conservative keep, sound).
  *
  * This object is the predicate side: `variant_get(col, '$.path', T)`
  * leaves rewrite into synthetic attribute probes against those keys,
  * typed by the STORAGE family (so both stored bounds always parse —
  * a half-parsed bound pair must never decide a skip), and the whole
  * existing [[Pruning]] comparison walk applies unchanged. Families:
  *
  *  - `long` keys (plain int32/int64 physical) serve long requests
  *    exactly; `int` requests compare through a WIDENED long literal
  *    and every rewritten shape is OR'd with a range guard that keeps
  *    any file whose bounds leave int range — such a file holds a
  *    value that makes a `failOnError` extraction THROW, and a skip
  *    must never suppress the query's own error;
  *  - `string` keys serve string requests only (no cast, byte-order
  *    bounds apply; capped like every manifest string bound);
  *  - `date` / `ts` (timestamp, UTC-adjusted micros) / `tsntz`
  *    (timestamp_ntz micros) / `bool` keys serve exactly their own
  *    request type — value-preserving extractions with no throw path,
  *    so plain probes are sound;
  *  - `dec` keys (decimal-annotated physical) carry exact BigDecimal
  *    bounds. A requested `decimal(p,s)` may ROUND the stored value
  *    (scale narrowing), so every comparison gets ±1 ulp-of-s slack,
  *    and the out-of-`(p,s)`-range guard keeps overflow-throwing
  *    files; only enumerated comparison shapes rewrite (p ≤ 37, so
  *    the slack/guard literals stay representable) — anything else
  *    keeps the `variant_get` leaf, which the walk treats as
  *    unknown → keep;
  *  - doubles are NOT harvested: the engine's bound compare refuses
  *    floating point wholesale (NaN-unordered stats — the standing
  *    NaN-safety stance), so double keys could never prune.
  *
  * Everything else — arrays, non-literal paths, exotic field names —
  * is never harvested and never rewritten: unknown shapes keep files,
  * the standing pruning contract. Scope note: the throw guards make
  * each rewritten probe's OWN comparison keep files that could throw
  * under it; a file pruned by an unrelated conjunct may still hold
  * rows on which another conjunct would throw — the same semantics as
  * partition pruning under ANSI (conjunct evaluation order over
  * skipped rows is unspecified). The PROOF side
  * ([[Pruning.mustMatchAll]]) deliberately ignores these keys:
  * whole-file DML drops stay on first-class column stats only. */
private[graft] object VariantPruning {

  /** Reserved stat-key prefix (also refused as a user column name). */
  val KeyPrefix = "__v$"

  /** Storage family a request type probes, if prunable. */
  def family(dt: DataType): Option[String] = dt match {
    case IntegerType | LongType => Some("long")
    case StringType => Some("string")
    case DateType => Some("date")
    case TimestampType => Some("ts")
    case TimestampNTZType => Some("tsntz")
    case BooleanType => Some("bool")
    case _: DecimalType => Some("dec")
    case _ => None
  }

  /** Manifest-stored type of a family's bounds — probes are typed by
    * THIS (not the requested type), so stored bounds always parse. */
  private def probeType(requested: DataType): DataType = requested match {
    case IntegerType => LongType
    case _: DecimalType => DecimalType.SYSTEM_DEFAULT
    case other => other
  }

  /** Requests whose extraction can THROW under failOnError (narrowing
    * overflow) — every rewritten shape needs the range guard. */
  private def throwy(dt: DataType): Boolean = dt match {
    case IntegerType => true
    case _: DecimalType => true
    case _ => false
  }

  def statKey(col: String, path: String, fam: String): String =
    s"$KeyPrefix$col:$path:$fam"

  /** Type a pseudo stat key by its fam suffix — what segment-ENVELOPE
    * merging needs (the key is not in any schema; field names on the
    * path are [[ParquetStats]]-guarded simple names, so the last ':'
    * always delimits the family). */
  def keyType(key: String): Option[DataType] =
    if (!key.startsWith(KeyPrefix)) None
    else key.substring(key.lastIndexOf(':') + 1) match {
      case "long" => Some(LongType)
      case "string" => Some(StringType)
      case "date" => Some(DateType)
      case "ts" => Some(TimestampType)
      case "tsntz" => Some(TimestampNTZType)
      case "bool" => Some(BooleanType)
      case "dec" => Some(DecimalType.SYSTEM_DEFAULT)
      case _ => None
    }

  /** Rewrite prunable `variant_get` leaves into synthetic attribute
    * probes; returns the rewritten predicate plus the schema fields
    * typing the probes (by the STORAGE family). No variant leaves →
    * `(pred, Nil)` with the original reference returned untouched. */
  def rewrite(
      pred: Expression,
      schema: StructType): (Expression, Seq[StructField]) = {
    val variantCols: Set[String] = schema.fields
      .collect { case f if f.dataType == VariantType => f.name }.toSet
    if (variantCols.isEmpty) return (pred, Nil)
    val extra = scala.collection.mutable.LinkedHashMap[String, StructField]()

    /** Prunable variant_get leaf → (probe attr, requested type,
      * failOnError). Registers the probe's schema field. */
    object Probe {
      def unapply(e: Expression): Option[(AttributeReference, DataType, Boolean)] =
        e match {
          case VariantGet(a: AttributeReference,
              Literal(p: UTF8String, StringType), t, foe, _)
              if variantCols.contains(a.name) && family(t).isDefined =>
            val key = statKey(a.name, p.toString, family(t).get)
            val pt = probeType(t)
            extra.getOrElseUpdate(key, StructField(key, pt, nullable = true))
            Some((AttributeReference(key, pt, nullable = true)(), t, foe))
          case _ => None
        }
    }

    def intGuard(pr: AttributeReference): Expression = Or(
      LessThan(pr, Literal(Int.MinValue.toLong, LongType)),
      GreaterThan(pr, Literal(Int.MaxValue.toLong, LongType)))

    def decLit(bd: BigDecimal): Literal = {
      // precision must cover the scale: BigDecimal("0.05") has precision 1
      // but scale 2, and DecimalType(1, 2) throws at construction.
      val p = math.min(38, math.max(math.max(bd.precision, bd.scale), 1))
      Literal(Decimal(bd), DecimalType(p, bd.scale))
    }

    def decGuard(pr: AttributeReference, d: DecimalType): Expression = {
      val maxRep = BigDecimal(BigInt(10).pow(d.precision) - 1, d.scale)
      Or(LessThan(pr, decLit(-maxRep)), GreaterThan(pr, decLit(maxRep)))
    }

    /** Guard-wrap `e` for failOnError narrowing requests: the file may
      * hold an out-of-range value whose extraction throws — keep it. */
    def guarded(e: Expression, pr: AttributeReference, t: DataType,
        foe: Boolean): Expression =
      if (!foe) e
      else t match {
        case IntegerType => Or(e, intGuard(pr))
        case d: DecimalType => Or(e, decGuard(pr, d))
        case _ => e
      }

    sealed trait Op
    case object EQ extends Op
    case object LT extends Op
    case object LE extends Op
    case object GT extends Op
    case object GE extends Op

    /** Normalized `probe op value` for narrowing requests; `orig` on
      * any shape the family cannot serve soundly. */
    def cmp(op: Op, pr: AttributeReference, t: DataType, foe: Boolean,
        v: Any, orig: Expression): Expression = t match {
      case IntegerType => v match {
        case i: Int =>
          val wl = Literal(i.toLong, LongType)
          val base = op match {
            case EQ => EqualTo(pr, wl)
            case LT => LessThan(pr, wl)
            case LE => LessThanOrEqual(pr, wl)
            case GT => GreaterThan(pr, wl)
            case GE => GreaterThanOrEqual(pr, wl)
          }
          guarded(base, pr, t, foe)
        case _ => orig
      }
      case d: DecimalType if d.precision <= 37 => v match {
        case dec: Decimal =>
          // the extraction ROUNDS to scale s: slack every bound by one
          // ulp of the requested scale (sound for any rounding mode)
          val bd = dec.toBigDecimal
          val delta = BigDecimal(1, d.scale)
          val lo = decLit(bd - delta)
          val hi = decLit(bd + delta)
          val base = op match {
            case EQ => And(GreaterThanOrEqual(pr, lo), LessThanOrEqual(pr, hi))
            case LT => LessThan(pr, hi)
            case LE => LessThanOrEqual(pr, hi)
            case GT => GreaterThan(pr, lo)
            case GE => GreaterThanOrEqual(pr, lo)
          }
          guarded(base, pr, t, foe)
        case _ => orig
      }
      case _ => orig
    }

    val out = pred.transformDown {
      // ---- narrowing requests: enumerated shapes, widened + guarded.
      // transformDown: these fire before the leaf rule can swallow the
      // variant_get; rewritten output holds no variant_get, so the
      // walk does not re-enter.
      case e @ EqualTo(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(EQ, pr, t, foe, v, e)
      case e @ EqualTo(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(EQ, pr, t, foe, v, e)
      case e @ EqualNullSafe(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(EQ, pr, t, foe, v, e)
      case e @ EqualNullSafe(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(EQ, pr, t, foe, v, e)
      case e @ LessThan(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(LT, pr, t, foe, v, e)
      case e @ LessThan(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(GT, pr, t, foe, v, e)
      case e @ LessThanOrEqual(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(LE, pr, t, foe, v, e)
      case e @ LessThanOrEqual(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(GE, pr, t, foe, v, e)
      case e @ GreaterThan(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(GT, pr, t, foe, v, e)
      case e @ GreaterThan(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(LT, pr, t, foe, v, e)
      case e @ GreaterThanOrEqual(Probe(pr, t, foe), Literal(v, _)) if throwy(t) && v != null =>
        cmp(GE, pr, t, foe, v, e)
      case e @ GreaterThanOrEqual(Literal(v, _), Probe(pr, t, foe)) if throwy(t) && v != null =>
        cmp(LE, pr, t, foe, v, e)

      case e @ In(Probe(pr, t, foe), list)
          if throwy(t) && list.nonEmpty &&
            list.forall { case Literal(v, _) => v != null; case _ => false } =>
        val rewrit = list.map { case l @ Literal(v, _) => cmp(EQ, pr, t, foe, v, e) }
        if (rewrit.contains(e)) e else rewrit.reduce(Or(_, _))

      case e @ InSet(Probe(pr, t, foe), set)
          if t == IntegerType && set.nonEmpty && set.forall(_.isInstanceOf[Int]) =>
        guarded(InSet(pr, set.map(v => (v.asInstanceOf[Int].toLong): Any)),
          pr, t, foe)

      // all-rows-equal complement proof: prunable only when every row
      // IS the (in-range, throw-free) literal — no guard needed
      case Not(EqualTo(Probe(pr, IntegerType, _), Literal(i: Int, IntegerType))) =>
        Not(EqualTo(pr, Literal(i.toLong, LongType)))
      case Not(EqualTo(Literal(i: Int, IntegerType), Probe(pr, IntegerType, _))) =>
        Not(EqualTo(pr, Literal(i.toLong, LongType)))

      // IS NULL on a narrowing request: an out-of-range value extracts
      // to NULL under try_variant_get and THROWS under failOnError —
      // either way the bounds' null count alone must not skip the file
      case e @ IsNull(Probe(pr, t, _)) if throwy(t) =>
        t match {
          case IntegerType => Or(IsNull(pr), intGuard(pr))
          case d: DecimalType if d.precision <= 37 =>
            Or(IsNull(pr), decGuard(pr, d))
          case _ => e
        }
      // IS NOT NULL prunes only all-null (path-absent-everywhere)
      // files — no value is ever extracted there, so no throw: plain
      case IsNotNull(Probe(pr, t, _)) if throwy(t) => IsNotNull(pr)

      // ---- value-preserving requests: plain leaf probes, any shape
      case g @ VariantGet(a: AttributeReference,
          Literal(p: UTF8String, StringType), t, _, _)
          if variantCols.contains(a.name) && family(t).isDefined &&
            !throwy(t) =>
        val key = statKey(a.name, p.toString, family(t).get)
        val pt = probeType(t)
        extra.getOrElseUpdate(key, StructField(key, pt, nullable = true))
        AttributeReference(key, pt, nullable = true)()
    }
    if (extra.isEmpty) (pred, Nil) else (out, extra.values.toSeq)
  }
}
