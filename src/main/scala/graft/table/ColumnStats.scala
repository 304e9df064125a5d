package graft.table

import org.apache.spark.sql.types._

/** Per-file, per-column min/max/null statistics used for file pruning.
  *
  * Mirrors the metrics Iceberg attaches to data files
  * (reference: TestHelpers.java:94-98 `DataFiles…withMetrics`;
  * pruning consumer: IcebergInputFormat.java:102-107 `scan.filter(expr)`).
  *
  * Values are stored JSON-friendly (string form) and parsed back through the
  * table schema, so the manifest stays engine-portable. Missing stats are
  * legal and must be treated as "cannot prune" by every consumer.
  */
final case class ColumnStats(
    min: Option[String],
    max: Option[String],
    nullCount: Option[Long],
    valueCount: Option[Long]) {

  /** Typed min/max in the column's Scala-comparable form, or None. */
  def typedMin(dt: DataType): Option[Any] = min.flatMap(ColumnStats.parse(_, dt))
  def typedMax(dt: DataType): Option[Any] = max.flatMap(ColumnStats.parse(_, dt))
}

object ColumnStats {
  val empty: ColumnStats = ColumnStats(None, None, None, None)

  /** Parse the stored string form back to a comparable value. Unsupported
    * types return None (consumers then skip pruning on that column). */
  def parse(s: String, dt: DataType): Option[Any] = dt match {
    case BooleanType => Some(s.toBoolean)
    case IntegerType => Some(s.toInt)
    case LongType => Some(s.toLong)
    case FloatType => Some(s.toFloat)
    case DoubleType => Some(s.toDouble)
    case StringType => Some(s)
    case DateType => Some(s.toInt) // days since epoch
    case TimestampType | TimestampNTZType => Some(s.toLong) // micros
    case _: DecimalType => Some(BigDecimal(s))
    case _ => None
  }

  /** Render a stat value to its stored string form. */
  def render(v: Any): String = v.toString

  /** Merge per-file stats into a SEGMENT-LEVEL envelope (the manifest
    * list's analog of Iceberg's manifest-list partition summaries):
    * per column, min of mins / max of maxes under the column's own
    * order, null/value counts summed. Strictly conservative — any file
    * missing stats for a column drops the column from the envelope
    * (consumers then cannot skip on it), a bound that fails to parse or
    * compare (floats) is dropped, and a file with provably no values
    * (null_count == value_count) contributes nothing to the bounds.
    * Soundness invariant (property-swept): for every predicate `p` and
    * file `f` in the segment, ¬mayMatch(p, envelope) ⟹ ¬mayMatch(p, f). */
  def mergeEnvelope(
      files: Seq[DataFileEntry],
      schema: StructType): Map[String, ColumnStats] = {
    if (files.isEmpty) return Map.empty
    val cols = files.head.stats.keySet.filter(c =>
      files.forall(_.stats.contains(c)))
    cols.iterator.flatMap { c =>
      schema.fields.find(_.name == c).map(_.dataType).map { dt =>
        val sts = files.map(_.stats(c))
        def mergeBound(
            get: ColumnStats => Option[String],
            pickMax: Boolean): Option[String] = {
          // files with provably no values are skipped; any OTHER file
          // with an absent/unparsable bound poisons the merge to None
          val contributing = sts.filter(st =>
            !(st.nullCount.isDefined && st.nullCount == st.valueCount))
          if (contributing.isEmpty) None
          else {
            val typed = contributing.map(st =>
              get(st).flatMap(parse(_, dt)))
            if (typed.exists(_.isEmpty)) None
            else typed.flatten.foldLeft(Option.empty[Any]) {
              case (None, v) => Some(v)
              case (Some(acc), v) => compare(acc, v) match {
                case Some(cmp) =>
                  Some(if ((cmp >= 0) == pickMax) acc else v)
                case None => return None // incomparable type: no bound
              }
            }.map(render)
          }
        }
        val nc = if (sts.forall(_.nullCount.isDefined))
          Some(sts.flatMap(_.nullCount).sum) else None
        val vc = if (sts.forall(_.valueCount.isDefined))
          Some(sts.flatMap(_.valueCount).sum) else None
        c -> ColumnStats(
          mergeBound(_.min, pickMax = false),
          mergeBound(_.max, pickMax = true), nc, vc)
      }
    }.toMap
  }

  /** Ordering used to compare a literal against stored min/max. Returns None
    * when the type is not totally ordered here (then: no pruning).
    *
    * Strings compare in UNSIGNED UTF-8 BYTE order — that is the order
    * parquet uses for its min/max bounds, and it differs from Java's
    * UTF-16 `String.compareTo` for supplementary characters (emoji sort
    * below U+FFFD in UTF-16 but above it in UTF-8 bytes); comparing in the
    * wrong order prunes files that contain matching rows.
    *
    * Float/double are NOT compared at all (None → keep the file): Spark's
    * runtime order treats NaN as largest and NaN = NaN as true, while
    * parquet writers commonly omit NaN from min/max, so a file whose rows
    * include NaN can carry finite bounds that exclude a matching row; ±0.0
    * compare unequal in IEEE total order but equal in SQL. Iceberg
    * sidesteps the same hazard with nan_value_counts — we take the
    * conservative route and never prune on floating-point stats. */
  def compare(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case (x: Int, y: Int) => Some(x.compareTo(y))
    case (x: Long, y: Long) => Some(x.compareTo(y))
    case (_: Float, _: Float) => None
    case (_: Double, _: Double) => None
    case (x: String, y: String) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)))
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case _ => None
  }
}
