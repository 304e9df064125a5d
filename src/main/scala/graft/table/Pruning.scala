package graft.table

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Min/max file pruning: decides, from a file's [[ColumnStats]], whether it
  * MAY contain rows matching a predicate (the reference delegates the same
  * decision to Iceberg's `scan.filter(expr).planTasks()`,
  * IcebergInputFormat.java:102-107; leaf semantics mirror
  * IcebergFilterFactory.java:45-154, P4-P15 in SURVEY.md §2.2).
  *
  * Everything here is deliberately conservative:
  *  - missing stats / unsupported expressions → keep the file;
  *  - `attr op literal` leaves only; null semantics follow SQL (a null row
  *    never satisfies `attr op lit`, so null counts only matter for IS NULL);
  *  - the full predicate is ALWAYS re-applied by Spark post-scan (the
  *    residual net, same double-evaluation stance as
  *    IcebergStorageHandler.decomposePredicate, :106-112).
  */
object Pruning {

  /** File-level entry: min/max bounds AND manifest bloom filters
    * ([[FileBloom]]). The bloom check only strengthens point lookups
    * (`=`/`IN`) — everything else defers to the bounds answer. */
  def mayMatchFile(
      pred: Expression,
      file: DataFileEntry,
      schema: StructType): Boolean =
    mayMatch(pred, file.stats, schema) &&
      (file.blooms.isEmpty || bloomMayMatch(pred, file.blooms, schema))

  /** Conservative bloom walk: only `=` / `<=>` / `IN` leaves on a column
    * that HAS a manifest bloom can answer false; every other shape is
    * true (sound — [[FileBloom]] never denies an inserted value). */
  private def bloomMayMatch(
      pred: Expression,
      blooms: Map[String, String],
      schema: StructType): Boolean = pred match {
    case And(l, r) =>
      bloomMayMatch(l, blooms, schema) && bloomMayMatch(r, blooms, schema)
    case Or(l, r) =>
      bloomMayMatch(l, blooms, schema) || bloomMayMatch(r, blooms, schema)
    case EqualTo(a: Attribute, Literal(v, _)) => bloomContains(a, v, blooms, schema)
    case EqualTo(Literal(v, _), a: Attribute) => bloomContains(a, v, blooms, schema)
    case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null =>
      bloomContains(a, v, blooms, schema)
    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, _) => bloomContains(a, v, blooms, schema) }
    case InSet(a: Attribute, set) =>
      set.exists(v => bloomContains(a, v, blooms, schema))
    case _ => true
  }

  private def bloomContains(a: Attribute, v: Any,
      blooms: Map[String, String], schema: StructType): Boolean =
    (blooms.get(a.name), fieldType(a, schema)) match {
      case (Some(b64), Some(dt)) => FileBloom.mayContain(b64, dt, v)
      case _ => true
    }

  /** True iff the file may contain matching rows. */
  def mayMatch(
      pred: Expression,
      stats: Map[String, ColumnStats],
      schema: StructType): Boolean = pred match {

    case And(l, r) => mayMatch(l, stats, schema) && mayMatch(r, stats, schema)
    case Or(l, r) => mayMatch(l, stats, schema) || mayMatch(r, stats, schema)
    case Literal(true, BooleanType) => true
    case Literal(false, BooleanType) => false

    case EqualTo(a: Attribute, Literal(v, _)) => boundsContain(a, v, stats, schema)
    case EqualTo(Literal(v, _), a: Attribute) => boundsContain(a, v, stats, schema)
    case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null =>
      boundsContain(a, v, stats, schema)

    case LessThan(a: Attribute, Literal(v, _)) => cmpMin(a, v, stats, schema)(_ < 0)
    case LessThanOrEqual(a: Attribute, Literal(v, _)) => cmpMin(a, v, stats, schema)(_ <= 0)
    case GreaterThan(a: Attribute, Literal(v, _)) => cmpMax(a, v, stats, schema)(_ > 0)
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) => cmpMax(a, v, stats, schema)(_ >= 0)
    // flipped literal-first forms
    case LessThan(Literal(v, _), a: Attribute) => cmpMax(a, v, stats, schema)(_ > 0)
    case LessThanOrEqual(Literal(v, _), a: Attribute) => cmpMax(a, v, stats, schema)(_ >= 0)
    case GreaterThan(Literal(v, _), a: Attribute) => cmpMin(a, v, stats, schema)(_ < 0)
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) => cmpMin(a, v, stats, schema)(_ <= 0)

    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, _) => boundsContain(a, v, stats, schema) }
    case InSet(a: Attribute, set) =>
      set.exists(v => boundsContain(a, v, stats, schema))

    case IsNull(a: Attribute) =>
      colStats(a, stats).flatMap(_.nullCount).forall(_ > 0)
    case IsNotNull(a: Attribute) =>
      colStats(a, stats) match {
        case Some(st) =>
          (st.nullCount, st.valueCount) match {
            case (Some(n), Some(v)) => n < v // not ALL null
            case _ => true
          }
        case None => true
      }

    case Not(EqualTo(a: Attribute, Literal(v, _))) =>
      // prunable only when min == max == v (every row equals v)
      !onlyValue(a, v, stats, schema)
    case StartsWith(a: Attribute, Literal(v, StringType)) =>
      prefixMayMatch(a, v.toString, stats, schema)

    case _ => true // unknown shape: never prune
  }

  /** True only when EVERY row of the file PROVABLY satisfies `pred` —
    * the metadata-only DROP proof for copy-on-write DELETE (the
    * partition-drop fast path: deleting a whole day/bucket/tenant slice
    * becomes a manifest edit, no data I/O, at any scale). Strictly
    * sound in the opposite direction from [[mayMatch]]: any missing
    * stat, unknown shape, or doubt answers false and the file takes the
    * ordinary rewrite path. Null discipline: no null row satisfies
    * `attr op lit`, so every value proof also requires null_count == 0.
    */
  def mustMatchAll(
      pred: Expression,
      file: DataFileEntry,
      schema: StructType): Boolean = pred match {
    case Literal(true, BooleanType) => true
    case And(l, r) =>
      mustMatchAll(l, file, schema) && mustMatchAll(r, file, schema)
    case Or(l, r) =>
      mustMatchAll(l, file, schema) || mustMatchAll(r, file, schema)
    // every row satisfies NOT x ⟸ no row may satisfy x AND no referenced
    // column holds nulls — a null row satisfies NEITHER x nor NOT x
    // under SQL three-valued logic, so nulls break the complement proof
    // (caught by the mustMatchAll soundness property sweep)
    case Not(x) =>
      x.references.forall(a =>
        colStats(a, file.stats).flatMap(_.nullCount).contains(0L)) &&
        !mayMatchFile(x, file, schema)

    case EqualTo(a: Attribute, Literal(v, _)) => onlyValue(a, v, file.stats, schema)
    case EqualTo(Literal(v, _), a: Attribute) => onlyValue(a, v, file.stats, schema)
    case EqualNullSafe(a: Attribute, Literal(v, _)) if v != null =>
      onlyValue(a, v, file.stats, schema)
    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, _) => onlyValue(a, v, file.stats, schema) }

    case GreaterThan(a: Attribute, Literal(v, _)) =>
      allCmpMin(a, v, file.stats, schema)(_ > 0)
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
      allCmpMin(a, v, file.stats, schema)(_ >= 0)
    case LessThan(a: Attribute, Literal(v, _)) =>
      allCmpMax(a, v, file.stats, schema)(_ < 0)
    case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
      allCmpMax(a, v, file.stats, schema)(_ <= 0)
    // flipped literal-first forms (lit < a ⟺ a > lit)
    case LessThan(Literal(v, _), a: Attribute) =>
      allCmpMin(a, v, file.stats, schema)(_ > 0)
    case LessThanOrEqual(Literal(v, _), a: Attribute) =>
      allCmpMin(a, v, file.stats, schema)(_ >= 0)
    case GreaterThan(Literal(v, _), a: Attribute) =>
      allCmpMax(a, v, file.stats, schema)(_ < 0)
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
      allCmpMax(a, v, file.stats, schema)(_ <= 0)

    case IsNull(a: Attribute) =>
      colStats(a, file.stats).flatMap(_.nullCount)
        .contains(file.recordCount)
    case IsNotNull(a: Attribute) =>
      colStats(a, file.stats).flatMap(_.nullCount).contains(0L)

    case _ => false // unknown shape: never prove, never drop
  }

  /** Every (non-null) row value compares `ok` against the literal via
    * the MIN bound — with null_count == 0 required, the proof covers
    * every row. */
  private def allCmpMin(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType)(ok: Int => Boolean): Boolean =
    (colStats(a, stats), fieldType(a, schema)) match {
      case (Some(st), Some(dt)) =>
        (litValue(v, dt), st.typedMin(dt), st.nullCount) match {
          case (Some(lit), Some(mn), Some(0L)) =>
            ColumnStats.compare(mn, lit).exists(ok)
          case _ => false
        }
      case _ => false
    }

  private def allCmpMax(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType)(ok: Int => Boolean): Boolean =
    (colStats(a, stats), fieldType(a, schema)) match {
      case (Some(st), Some(dt)) =>
        (litValue(v, dt), st.typedMax(dt), st.nullCount) match {
          case (Some(lit), Some(mx), Some(0L)) =>
            ColumnStats.compare(mx, lit).exists(ok)
          case _ => false
        }
      case _ => false
    }

  private def colStats(a: Attribute, stats: Map[String, ColumnStats]): Option[ColumnStats] =
    stats.get(a.name)

  private def fieldType(a: Attribute, schema: StructType): Option[DataType] =
    schema.fields.find(_.name == a.name).map(_.dataType)

  /** Normalize a catalyst literal value to the manifest's comparable form. */
  private[table] def litValue(v: Any, dt: DataType): Option[Any] = v match {
    case null => None
    case s: UTF8String => Some(s.toString)
    case d: Decimal => Some(d.toBigDecimal)
    case i: Integer => Some(i.intValue())
    case other => Some(other)
  }

  private def withBounds(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType)(f: (Any, Option[Any], Option[Any]) => Boolean): Boolean = {
    (colStats(a, stats), fieldType(a, schema)) match {
      case (Some(st), Some(dt)) =>
        litValue(v, dt) match {
          case Some(lit) =>
            val mn = st.typedMin(dt)
            val mx = st.typedMax(dt)
            if (mn.isEmpty && mx.isEmpty) true else f(lit, mn, mx)
          case None => true
        }
      case _ => true
    }
  }

  private def boundsContain(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType): Boolean =
    withBounds(a, v, stats, schema) { (lit, mn, mx) =>
      val geMin = mn.forall(m => ColumnStats.compare(lit, m).forall(_ >= 0))
      val leMax = mx.forall(m => ColumnStats.compare(lit, m).forall(_ <= 0))
      geMin && leMax
    }

  /** keep file iff ∃ row value with cmp(value, lit) — checked via min. */
  private def cmpMin(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType)(ok: Int => Boolean): Boolean =
    withBounds(a, v, stats, schema) { (lit, mn, _) =>
      mn.forall(m => ColumnStats.compare(m, lit).forall(ok))
    }

  private def cmpMax(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType)(ok: Int => Boolean): Boolean =
    withBounds(a, v, stats, schema) { (lit, _, mx) =>
      mx.forall(m => ColumnStats.compare(m, lit).forall(ok))
    }

  private def onlyValue(a: Attribute, v: Any, stats: Map[String, ColumnStats],
      schema: StructType): Boolean =
    (colStats(a, stats), fieldType(a, schema)) match {
      case (Some(st), Some(dt)) =>
        (litValue(v, dt), st.typedMin(dt), st.typedMax(dt), st.nullCount) match {
          case (Some(lit), Some(mn), Some(mx), Some(0L)) =>
            ColumnStats.compare(mn, lit).contains(0) &&
              ColumnStats.compare(mx, lit).contains(0)
          case _ => false
        }
      case _ => false
    }

  /** Prefix bounds check in unsigned UTF-8 byte order (parquet's stat
    * order): the file may hold a `prefix`-prefixed value iff
    * truncate(min) <= prefix <= truncate(max) where truncation happens at
    * BYTE length — char-level truncation could split surrogate pairs and
    * byte order is the only order the bounds are valid in. */
  private def prefixMayMatch(a: Attribute, prefix: String,
      stats: Map[String, ColumnStats], schema: StructType): Boolean =
    withBounds(a, prefix, stats, schema) { (_, mn, mx) =>
      val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      def cmpTruncated(s: String): Int = {
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(b.length, p.length)
        var i = 0
        while (i < n) {
          val d = (b(i) & 0xff) - (p(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        0 // equal up to prefix byte length (or s shorter: treat as equal-low)
      }
      val lower = mn.forall {
        case m: String => cmpTruncated(m) <= 0
        case _ => true
      }
      val upper = mx.forall {
        case m: String => cmpTruncated(m) >= 0
        case _ => true
      }
      lower && upper
    }
}
