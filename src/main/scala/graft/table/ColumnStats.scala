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
    * types — and stored values that do not FIT the requested type (a
    * variant probe narrowing a long-harvested bound to int) — return
    * None: consumers then skip pruning on that column, never throw. */
  def parse(s: String, dt: DataType): Option[Any] =
    scala.util.Try[Any](dt match {
      case BooleanType => s.toBoolean
      case IntegerType => s.toInt
      case LongType => s.toLong
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case StringType => s
      case DateType => s.toInt // days since epoch
      case TimestampType | TimestampNTZType => s.toLong // micros
      case d: DecimalType => BigDecimal(s)
      case _ => null
    }).toOption.filter(_ != null)

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
      // shredded-variant pseudo keys type by their fam suffix — the
      // same sound bounds, lifted to the segment level (a key absent
      // from ANY file already dropped above, so a type-mixed or
      // missing-path file keeps its whole segment)
      schema.fields.find(_.name == c).map(_.dataType)
        .orElse(VariantPruning.keyType(c)).map { dt =>
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

  /** Byte budget for STRING bounds carried in manifests. parquet chunk
    * stats arrive verbatim; on a long-text corpus that is multi-KB per
    * file per column in every segment — at 100 TB the manifest bloat
    * dominates. Bounds are capped at write time (Iceberg's
    * `write.metadata.metrics truncate(16)` discipline, wider here):
    * min truncates DOWN, max rounds UP ([[truncateMaxString]]), so
    * pruning stays strictly conservative. */
  val StringBoundCapBytes: Int = 64

  /** Longest prefix of `s` whose UTF-8 encoding fits `capBytes`, cut at
    * a code-point boundary. A prefix sorts ≤ the full string in UTF-8
    * byte order, so this is the sound MIN-side truncation. */
  def truncateMinString(s: String, capBytes: Int): String = {
    if (utf8Length(s) <= capBytes) return s
    val out = new java.lang.StringBuilder
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = cpUtf8Width(cp)
      if (bytes + w > capBytes) return out.toString
      out.appendCodePoint(cp)
      bytes += w
      i += Character.charCount(cp)
    }
    out.toString
  }

  /** MAX-side truncation: the capped prefix with its last incrementable
    * code point bumped by one (skipping the surrogate gap) and the rest
    * dropped — strictly GREATER in UTF-8 byte order than every string
    * sharing the original prefix, hence a sound upper bound. None when
    * every prefix code point is already U+10FFFF (no finite bound —
    * consumers then cannot prune above, the conservative fallback). */
  def truncateMaxString(s: String, capBytes: Int): Option[String] = {
    if (utf8Length(s) <= capBytes) return Some(s)
    val prefix = truncateMinString(s, capBytes)
    val cps = prefix.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < Character.MAX_CODE_POINT) {
        val next =
          if (cps(i) == Character.MIN_SURROGATE - 1)
            Character.MAX_SURROGATE + 1 // D7FF -> E000: skip surrogates
          else cps(i) + 1
        val out = new java.lang.StringBuilder
        (0 until i).foreach(j => out.appendCodePoint(cps(j)))
        out.appendCodePoint(next)
        return Some(out.toString)
      }
      i -= 1
    }
    None
  }

  private def utf8Length(s: String): Int = {
    var bytes = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      bytes += cpUtf8Width(cp)
      i += Character.charCount(cp)
    }
    bytes
  }

  private def cpUtf8Width(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4

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
