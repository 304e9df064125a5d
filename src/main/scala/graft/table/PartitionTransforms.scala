package graft.table

import java.time.ZoneOffset

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Or, XxHash64}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.functions.{col, lit, pmod, substring, unix_date, xxhash64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HIDDEN partitioning (Iceberg partition transforms): the table layout is
  * keyed by a value DERIVED from a data column — `bucket(N, c)` (xxhash64
  * mod N), `days(c)` (UTC epoch day), `truncate(W, c)` (W-codepoint
  * prefix) — while queries keep filtering the SOURCE column and still
  * prune files: scan-time conjuncts on the source are mapped to conjuncts
  * on the derived directory value ([[PartitionField.augment]]), which the
  * ordinary min/max machinery answers from the synthesized per-file
  * partition stats.
  *
  * Why this matters at 100 TB: `bucket` gives pruning power footer stats
  * CANNOT — a hash-distributed id spans every file's min/max, so a point
  * lookup scans the world unless the layout itself is hash-keyed (then it
  * reads 1/N of it); `days` keeps time-range scans to their slice without
  * materializing a date column; `truncate` does the same for string
  * prefixes. The source column stays in the data files — the layout is
  * invisible to readers (hence "hidden").
  *
  * Soundness stance mirrors [[Pruning]]: a mapping is emitted only when
  * the implication "row matches conjunct ⇒ file's derived value satisfies
  * mapped conjunct" holds; everything else contributes nothing (the file
  * is kept). Bucket maps equality/IN only (hashing is not
  * order-preserving); days/truncate are monotone, so range endpoints map
  * with the inequality RELAXED to its inclusive form (rows later the same
  * day / sharing the truncated prefix may still match).
  */
sealed trait PartitionField {
  /** The data column the layout derives from. */
  def source: String
  /** The directory key (`<fieldName>=<value>/`); equals `source` for
    * identity. */
  def fieldName: String
  /** The key the derived SYNTHESIZED STATS live under — parameter-
    * qualified for parameterized transforms (`id_bucket_8`,
    * `s_trunc_4`), so a spec evolution that RE-PARAMETERIZES a
    * transform (bucket(4)→bucket(8)) can never compare one era's
    * derived probe against another era's derived stats: the other
    * era's files simply lack the qualified key and are kept
    * (conservative — the unsound cross-modulus skip is structurally
    * impossible). Directory layout keys ([[fieldName]]) are
    * unqualified and unchanged. */
  def statName: String = fieldName
  /** Type of the derived directory value. */
  def derivedType: DataType
  /** The derived value as a write-time column over the data. */
  def writeExpr: Column
  /** The derived value of a source-column LITERAL (internal Catalyst
    * representation in, internal representation out) — must agree exactly
    * with [[writeExpr]]; both sides evaluate Spark's own expressions. */
  def derive(v: Any, dt: DataType): Any
  def isIdentity: Boolean = false
  /** Whether source-range conjuncts map to derived-range conjuncts. */
  def orderPreserving: Boolean = false
  /** Whether a NULL source derives a NULL directory value (then `c IS
    * NULL` maps to the null partition). False for bucket: the hash
    * expression skips null inputs and returns the seed, so null rows
    * land in a REGULAR bucket directory. */
  def nullPropagating: Boolean = false
  /** Spec string persisted in metadata. */
  def spec: String
}

final case class IdentityField(source: String, derivedType: DataType)
    extends PartitionField {
  val fieldName: String = source
  def writeExpr: Column = col(source)
  def derive(v: Any, dt: DataType): Any = v
  override def isIdentity: Boolean = true
  override def orderPreserving: Boolean = true
  def spec: String = source
}

final case class BucketField(n: Int, source: String) extends PartitionField {
  val fieldName: String = s"${source}_bucket"
  override val statName: String = s"${source}_bucket_$n"
  val derivedType: DataType = IntegerType
  def writeExpr: Column =
    pmod(xxhash64(col(source)), lit(n.toLong)).cast("int")
  def derive(v: Any, dt: DataType): Any = {
    // the exact hash the writer used: Spark's XxHash64 (seed 42) over the
    // internal value
    // seed 42 = the default functions.xxhash64 uses on the write side
    val h = XxHash64(Seq(Literal(v, dt)), 42L).eval(null).asInstanceOf[Long]
    (((h % n) + n) % n).toInt
  }
  def spec: String = s"bucket($n,$source)"
}

final case class DaysField(source: String) extends PartitionField {
  val fieldName: String = s"${source}_day"
  val derivedType: DataType = IntegerType
  // cast-to-date under the (pinned UTC) session timezone, then epoch day —
  // NULL source rows stay NULL and land in the null partition
  def writeExpr: Column = unix_date(col(source).cast("date"))
  def derive(v: Any, dt: DataType): Any = dt match {
    case DateType => v // already epoch days
    case TimestampType | TimestampNTZType =>
      DateTimeUtils.microsToDays(v.asInstanceOf[Long], ZoneOffset.UTC)
    case _ => throw new IllegalArgumentException(
      s"days($source) literal of unsupported type ${dt.sql}")
  }
  override def orderPreserving: Boolean = true
  override def nullPropagating: Boolean = true
  def spec: String = s"days($source)"
}

/** Shared shape of the coarser time transforms — `years(c)` /
  * `months(c)` / `hours(c)` complete Iceberg's time family around
  * [[DaysField]]: same monotone epoch-unit derivation, same UTC
  * anchoring, only the unit differs. */
sealed trait TimeUnitField extends PartitionField {
  val derivedType: DataType = IntegerType
  override def orderPreserving: Boolean = true
  override def nullPropagating: Boolean = true
  protected def epochDaysToUnit(days: Int): Int
  protected def microsToUnit(micros: Long): Int
  def derive(v: Any, dt: DataType): Any = dt match {
    case DateType => epochDaysToUnit(v.asInstanceOf[Int])
    case TimestampType | TimestampNTZType =>
      microsToUnit(v.asInstanceOf[Long])
    case _ => throw new IllegalArgumentException(
      s"$spec literal of unsupported type ${dt.sql}")
  }
}

final case class YearsField(source: String) extends TimeUnitField {
  val fieldName: String = s"${source}_year"
  // calendar year minus 1970 (Iceberg's year ordinal), via the same
  // cast-to-date the writer uses
  def writeExpr: Column =
    (org.apache.spark.sql.functions.year(col(source).cast("date")) - 1970)
      .cast("int")
  protected def epochDaysToUnit(days: Int): Int =
    java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970
  protected def microsToUnit(micros: Long): Int =
    epochDaysToUnit(DateTimeUtils.microsToDays(micros, ZoneOffset.UTC))
  def spec: String = s"years($source)"
}

final case class MonthsField(source: String) extends TimeUnitField {
  val fieldName: String = s"${source}_month"
  // months since 1970-01 (Iceberg's month ordinal)
  def writeExpr: Column = {
    val d = col(source).cast("date")
    ((org.apache.spark.sql.functions.year(d) - 1970) * 12 +
      org.apache.spark.sql.functions.month(d) - 1).cast("int")
  }
  protected def epochDaysToUnit(days: Int): Int = {
    val ld = java.time.LocalDate.ofEpochDay(days.toLong)
    (ld.getYear - 1970) * 12 + ld.getMonthValue - 1
  }
  protected def microsToUnit(micros: Long): Int =
    epochDaysToUnit(DateTimeUtils.microsToDays(micros, ZoneOffset.UTC))
  def spec: String = s"months($source)"
}

final case class HoursField(source: String) extends TimeUnitField {
  val fieldName: String = s"${source}_hour"
  // hours since the epoch; floorDiv matches the writer's integer floor
  // for pre-1970 instants
  def writeExpr: Column =
    org.apache.spark.sql.functions.floor(
      org.apache.spark.sql.functions.unix_micros(
        col(source).cast("timestamp")) / lit(3600000000L)).cast("int")
  protected def epochDaysToUnit(days: Int): Int = days * 24
  protected def microsToUnit(micros: Long): Int =
    Math.floorDiv(micros, 3600000000L).toInt
  def spec: String = s"hours($source)"
}

final case class TruncateField(w: Int, source: String) extends PartitionField {
  val fieldName: String = s"${source}_trunc"
  override val statName: String = s"${source}_trunc_$w"
  val derivedType: DataType = StringType
  def writeExpr: Column = substring(col(source), 1, w)
  def derive(v: Any, dt: DataType): Any =
    v.asInstanceOf[UTF8String].substringSQL(1, w)
  override def orderPreserving: Boolean = true
  override def nullPropagating: Boolean = true
  def spec: String = s"truncate($w,$source)"
}

object PartitionField {

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val DaysRe = """days\(\s*([^)\s]+)\s*\)""".r
  private val YearsRe = """years\(\s*([^)\s]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([^)\s]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r

  /** Parse + validate one spec entry against the table schema. */
  def parse(entry: String, schema: StructType): PartitionField = {
    def field(c: String): StructField =
      schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '$c' not in schema ${schema.fieldNames.mkString(",")}"))
    def requireFresh(name: String): Unit =
      require(!schema.fieldNames.contains(name),
        s"derived partition field '$name' collides with a data column")
    entry.trim match {
      case BucketRe(n, c) =>
        val f = field(c)
        require(n.toInt > 0, s"bucket count must be positive in '$entry'")
        require(Set[DataType](IntegerType, LongType, StringType)(f.dataType),
          s"bucket() supports INT, BIGINT, STRING sources; '$c' is ${f.dataType.sql}")
        val pf = BucketField(n.toInt, c); requireFresh(pf.fieldName); pf
      case DaysRe(c) =>
        val f = field(c)
        require(f.dataType == DateType || f.dataType == TimestampType ||
          f.dataType == TimestampNTZType,
          s"days() supports DATE/TIMESTAMP sources; '$c' is ${f.dataType.sql}")
        val pf = DaysField(c); requireFresh(pf.fieldName); pf
      case YearsRe(c) =>
        val f = field(c)
        require(f.dataType == DateType || f.dataType == TimestampType ||
          f.dataType == TimestampNTZType,
          s"years() supports DATE/TIMESTAMP sources; '$c' is ${f.dataType.sql}")
        val pf = YearsField(c); requireFresh(pf.fieldName); pf
      case MonthsRe(c) =>
        val f = field(c)
        require(f.dataType == DateType || f.dataType == TimestampType ||
          f.dataType == TimestampNTZType,
          s"months() supports DATE/TIMESTAMP sources; '$c' is ${f.dataType.sql}")
        val pf = MonthsField(c); requireFresh(pf.fieldName); pf
      case HoursRe(c) =>
        val f = field(c)
        require(f.dataType == TimestampType || f.dataType == TimestampNTZType,
          s"hours() supports TIMESTAMP sources; '$c' is ${f.dataType.sql}")
        val pf = HoursField(c); requireFresh(pf.fieldName); pf
      case TruncRe(w, c) =>
        val f = field(c)
        require(w.toInt > 0, s"truncate width must be positive in '$entry'")
        require(f.dataType == StringType,
          s"truncate() supports STRING sources; '$c' is ${f.dataType.sql}")
        val pf = TruncateField(w.toInt, c); requireFresh(pf.fieldName); pf
      case c =>
        val f = field(c)
        require(PartitionValues.supported(f.dataType),
          s"unsupported partition column type ${f.dataType.sql} for '$c' " +
            "(supported: BOOLEAN, INT, BIGINT, STRING, DATE)")
        IdentityField(c, f.dataType)
    }
  }

  def parseSpec(spec: Seq[String], schema: StructType): Seq[PartitionField] = {
    val fields = spec.map(parse(_, schema))
    val names = fields.map(_.fieldName)
    require(names.distinct.size == names.size,
      s"duplicate partition field names in spec ${spec.mkString(",")}")
    fields
  }

  /** Table schema plus the derived partition fields — what the pruning
    * walk needs to type the synthesized directory-value stats. */
  def augmentedSchema(schema: StructType, fields: Seq[PartitionField]): StructType =
    StructType(schema.fields ++ fields.filterNot(_.isIdentity)
      .map(f => StructField(f.statName, f.derivedType, nullable = true)))

  /** Conjoin the resolved predicate with every sound derived-column
    * implication of its top-level conjuncts. Identity fields need no
    * mapping (their synthesized stats already carry the source name);
    * conjuncts that reference anything else contribute nothing. */
  def augment(pred: Expression, fields: Seq[PartitionField]): Expression = {
    val transforms = fields.filterNot(_.isIdentity)
    if (transforms.isEmpty) return pred
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val derived = conjuncts(pred).flatMap { c => transforms.flatMap { f => mapConjunct(c, f) } }
    derived.foldLeft(pred)(And(_, _))
  }

  /** PROOF-side augmentation (the mirror of [[augment]]): each top-level
    * conjunct `c` becomes `c OR s` where `s` is a derived-key condition
    * that row-wise IMPLIES `c` — so the rewrite is EQUIVALENT to the
    * original predicate, and `Pruning.mustMatchAll` can prove the
    * all-rows-match obligation through the derived key's exact per-file
    * stats where source-column footer stats are absent or too loose.
    * Floor-transform soundness: `key(row) < key(lit)` puts the row's
    * whole period strictly before the literal's period, hence
    * `row < lit`; `key(row) > key(lit)` puts it strictly after, hence
    * `row > lit` — STRICT derived bounds, unlike [[mapConjunct]]'s
    * relaxed inclusive ones (which go the other direction: conjunct ⇒
    * derived). Only order-preserving transforms participate. */
  def proofAugment(pred: Expression, fields: Seq[PartitionField]): Expression = {
    val transforms = fields.filter(f => f.orderPreserving && !f.isIdentity)
    if (transforms.isEmpty) return pred
    def rebuild(e: Expression): Expression = e match {
      case And(l, r) => And(rebuild(l), rebuild(r))
      case c => transforms.flatMap(f => proofConjunct(c, f))
        .foldLeft(c)((acc, s) => Or(acc, s))
    }
    rebuild(pred)
  }

  private def proofConjunct(c: Expression, f: PartitionField): Option[Expression] = {
    def attr = AttributeReference(f.statName, f.derivedType)()
    def dlit(v: Any, dt: DataType): Literal = Literal(f.derive(v, dt), f.derivedType)
    c match {
      // a < lit / a <= lit ⟸ key(a) < key(lit)
      case LessThan(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(LessThan(attr, dlit(v, dt)))
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(LessThan(attr, dlit(v, dt)))
      // a > lit / a >= lit ⟸ key(a) > key(lit)
      case GreaterThan(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(GreaterThan(attr, dlit(v, dt)))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(GreaterThan(attr, dlit(v, dt)))
      // flipped literal-first spellings
      case LessThan(Literal(v, dt), a: AttributeReference)
          if a.name == f.source && v != null => // a > lit
        Some(GreaterThan(attr, dlit(v, dt)))
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference)
          if a.name == f.source && v != null => // a >= lit
        Some(GreaterThan(attr, dlit(v, dt)))
      case GreaterThan(Literal(v, dt), a: AttributeReference)
          if a.name == f.source && v != null => // a < lit
        Some(LessThan(attr, dlit(v, dt)))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference)
          if a.name == f.source && v != null => // a <= lit
        Some(LessThan(attr, dlit(v, dt)))
      case _ => None
    }
  }

  /** Whether a time literal sits EXACTLY on the transform's period start
    * (derive of the previous instant differs). Only time-typed sources
    * participate — strings/others answer false and keep the relaxed
    * inclusive mapping. */
  private def isPeriodStart(v: Any, dt: DataType, f: PartitionField): Boolean =
    try dt match {
      case TimestampType | TimestampNTZType =>
        f.derive(v, dt) != f.derive(v.asInstanceOf[Long] - 1L, dt)
      case DateType =>
        f.derive(v, dt) != f.derive(v.asInstanceOf[Int] - 1, dt)
      case _ => false
    } catch { case _: Exception => false }

  private def mapConjunct(c: Expression, f: PartitionField): Option[Expression] = {
    def attr = AttributeReference(f.statName, f.derivedType)()
    def dlit(v: Any, dt: DataType): Literal = Literal(f.derive(v, dt), f.derivedType)
    c match {
      case EqualTo(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(EqualTo(attr, dlit(v, dt)))
      case EqualTo(Literal(v, dt), a: AttributeReference)
          if a.name == f.source && v != null =>
        Some(EqualTo(attr, dlit(v, dt)))
      case EqualNullSafe(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null =>
        Some(EqualTo(attr, dlit(v, dt)))
      case In(a: AttributeReference, list)
          if a.name == f.source && list.nonEmpty &&
            list.forall { case Literal(v, _) => v != null; case _ => false } =>
        Some(In(attr, list.map { case Literal(v, dt) => dlit(v, dt) }))
      // monotone transforms: endpoints map with inclusive inequalities
      // (rows later the same day / sharing the prefix may still match)
      case GreaterThan(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null && f.orderPreserving =>
        Some(GreaterThanOrEqual(attr, dlit(v, dt)))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null && f.orderPreserving =>
        Some(GreaterThanOrEqual(attr, dlit(v, dt)))
      case LessThan(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null && f.orderPreserving =>
        // boundary-exact: `ts < <period start>` (the retention shape)
        // admits NO row of the literal's own period — the derived bound
        // is strict and the whole boundary slice prunes
        if (isPeriodStart(v, dt, f)) Some(LessThan(attr, dlit(v, dt)))
        else Some(LessThanOrEqual(attr, dlit(v, dt)))
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt))
          if a.name == f.source && v != null && f.orderPreserving =>
        Some(LessThanOrEqual(attr, dlit(v, dt)))
      case org.apache.spark.sql.catalyst.expressions.IsNull(a: AttributeReference)
          if a.name == f.source && f.nullPropagating =>
        Some(org.apache.spark.sql.catalyst.expressions.IsNull(attr))
      case _ => None
    }
  }
}
