package graft.table

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for min/max file pruning — one per filter leaf (P4-P15,
  * reference semantics: IcebergFilterFactory.java:45-154) plus the
  * conservative fallbacks that the reference gets via residual re-evaluation.
  */
class PruningSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  private val idAttr = AttributeReference("id", LongType)()
  private val nameAttr = AttributeReference("name", StringType)()

  /** id ∈ [10, 20], no nulls, 5 values; name ∈ ["banana","cherry"] */
  private val stats = Map(
    "id" -> ColumnStats(Some("10"), Some("20"), Some(0L), Some(5L)),
    "name" -> ColumnStats(Some("banana"), Some("cherry"), Some(0L), Some(5L)))

  private def longLit(v: Long) = Literal(v, LongType)
  private def strLit(s: String) = Literal(UTF8String.fromString(s), StringType)

  private def may(e: Expression, st: Map[String, ColumnStats] = stats): Boolean =
    Pruning.mayMatch(e, st, schema)

  test("P4 equals: inside vs outside bounds") {
    assert(may(EqualTo(idAttr, longLit(15L))))
    assert(may(EqualTo(idAttr, longLit(10L)))) // boundary
    assert(!may(EqualTo(idAttr, longLit(9L))))
    assert(!may(EqualTo(idAttr, longLit(21L))))
    assert(may(EqualTo(longLit(15L), idAttr))) // flipped
  }

  test("P5 null-safe equals prunes like equals for non-null literal") {
    assert(may(EqualNullSafe(idAttr, longLit(15L))))
    assert(!may(EqualNullSafe(idAttr, longLit(5L))))
  }

  test("P6/P7 less-than(-or-equal) against min") {
    assert(!may(LessThan(idAttr, longLit(10L))))
    assert(may(LessThanOrEqual(idAttr, longLit(10L))))
    assert(may(LessThan(idAttr, longLit(11L))))
  }

  test("P8 greater-than(-or-equal) against max") {
    assert(!may(GreaterThan(idAttr, longLit(20L))))
    assert(may(GreaterThanOrEqual(idAttr, longLit(20L))))
    assert(may(GreaterThan(idAttr, longLit(19L))))
  }

  test("P9 IN keeps file iff any member is inside bounds") {
    assert(may(In(idAttr, Seq(longLit(1L), longLit(15L)))))
    assert(!may(In(idAttr, Seq(longLit(1L), longLit(2L)))))
  }

  test("P10 BETWEEN as conjunction") {
    val between = And(GreaterThanOrEqual(idAttr, longLit(12L)),
      LessThanOrEqual(idAttr, longLit(14L)))
    assert(may(between))
    val outside = And(GreaterThanOrEqual(idAttr, longLit(30L)),
      LessThanOrEqual(idAttr, longLit(40L)))
    assert(!may(outside))
  }

  test("P11 IS NULL prunes when null count is zero") {
    assert(!may(IsNull(idAttr)))
    val withNulls = stats.updated("id",
      ColumnStats(Some("10"), Some("20"), Some(2L), Some(5L)))
    assert(may(IsNull(idAttr), withNulls))
    // unknown null count → keep
    val unknown = stats.updated("id", ColumnStats(Some("10"), Some("20"), None, None))
    assert(may(IsNull(idAttr), unknown))
  }

  test("IS NOT NULL prunes only the all-null file") {
    assert(may(IsNotNull(idAttr)))
    val allNull = stats.updated("id", ColumnStats(None, None, Some(5L), Some(5L)))
    assert(!may(IsNotNull(idAttr), allNull))
  }

  test("P12 NOT equals prunes only single-valued files") {
    assert(may(Not(EqualTo(idAttr, longLit(15L)))))
    val single = stats.updated("id",
      ColumnStats(Some("15"), Some("15"), Some(0L), Some(5L)))
    assert(!may(Not(EqualTo(idAttr, longLit(15L))), single))
    assert(may(Not(EqualTo(idAttr, longLit(16L))), single))
  }

  test("P13/P14 AND requires both sides; OR requires either") {
    val in = EqualTo(idAttr, longLit(15L))
    val out = EqualTo(idAttr, longLit(5L))
    assert(may(And(in, in)))
    assert(!may(And(in, out)))
    assert(may(Or(out, in)))
    assert(!may(Or(out, out)))
  }

  test("P15 constant literals") {
    assert(may(Literal(true, BooleanType)))
    assert(!may(Literal(false, BooleanType)))
  }

  test("string bounds comparison") {
    assert(may(EqualTo(nameAttr, strLit("candy"))))
    assert(!may(EqualTo(nameAttr, strLit("apple"))))
    assert(!may(EqualTo(nameAttr, strLit("zebra"))))
  }

  test("StartsWith prunes on prefix range") {
    assert(may(StartsWith(nameAttr, strLit("ba"))))
    assert(may(StartsWith(nameAttr, strLit("c"))))
    assert(!may(StartsWith(nameAttr, strLit("a"))))
    assert(!may(StartsWith(nameAttr, strLit("d"))))
  }

  test("conservative: missing stats, unknown columns, unsupported shapes keep the file") {
    assert(may(EqualTo(idAttr, longLit(15L)), Map.empty))
    val other = AttributeReference("nope", LongType)()
    assert(may(EqualTo(other, longLit(1L))))
    // non-literal comparison — not a prunable shape
    assert(may(EqualTo(idAttr, idAttr)))
    // stats present but min/max missing → keep
    val noMinMax = Map("id" -> ColumnStats(None, None, Some(0L), Some(5L)))
    assert(may(EqualTo(idAttr, longLit(999L)), noMinMax))
  }

  test("floating-point stats never prune (NaN/±0.0 unsound)") {
    val priceAttr = AttributeReference("price", DoubleType)()
    // a file whose rows include NaN can carry finite parquet bounds: the
    // stats say [1.0, 2.0] but price > 100.0 still matches the NaN row
    val st = stats.updated("price",
      ColumnStats(Some("1.0"), Some("2.0"), Some(0L), Some(5L)))
    assert(may(GreaterThan(priceAttr, Literal(100.0, DoubleType)), st))
    assert(may(EqualTo(priceAttr, Literal(99.0, DoubleType)), st))
    assert(may(LessThan(priceAttr, Literal(0.5, DoubleType)), st))
  }

  test("time travel: snapshot__id under OR or NOT does not pin the scan") {
    val snap = AttributeReference("snapshot__id", LongType)()
    // under OR: must not pin, must stay in the predicate
    val underOr = Or(EqualTo(snap, longLit(1L)), GreaterThan(idAttr, longLit(5L)))
    assert(TimeTravel.extractSnapshotId(underOr, "snapshot__id").isEmpty)
    assert(TimeTravel.neutralize(underOr, "snapshot__id") == underOr)
    // under NOT: same
    val underNot = Not(EqualTo(snap, longLit(1L)))
    assert(TimeTravel.extractSnapshotId(underNot, "snapshot__id").isEmpty)
    assert(TimeTravel.neutralize(underNot, "snapshot__id") == underNot)
    // mixed: the top-level conjunct pins; the OR branch is untouched
    val mixed = And(EqualTo(snap, longLit(2L)),
      Or(EqualTo(snap, longLit(9L)), GreaterThan(idAttr, longLit(5L))))
    assert(TimeTravel.extractSnapshotId(mixed, "snapshot__id").contains(2L))
    val n = TimeTravel.neutralize(mixed, "snapshot__id")
    assert(n == And(Literal(true, BooleanType),
      Or(EqualTo(snap, longLit(9L)), GreaterThan(idAttr, longLit(5L)))))
  }

  test("time travel: extract + neutralize (P16)") {
    val pred = And(EqualTo(idAttr, longLit(15L)),
      EqualTo(AttributeReference("snapshot__id", LongType)(), longLit(3L)))
    assert(TimeTravel.extractSnapshotId(pred, "snapshot__id").contains(3L))
    assert(TimeTravel.extractSnapshotId(pred, "other__col").isEmpty)
    val neutral = TimeTravel.neutralize(pred, "snapshot__id")
    // the snapshot leaf became TRUE → pruning sees only the id leaf
    assert(Pruning.mayMatch(neutral, stats, schema))
    val outOfRange = TimeTravel.neutralize(
      And(EqualTo(idAttr, longLit(5L)),
        EqualTo(AttributeReference("snapshot__id", LongType)(), longLit(3L))),
      "snapshot__id")
    assert(!Pruning.mayMatch(outOfRange, stats, schema))
  }
}
