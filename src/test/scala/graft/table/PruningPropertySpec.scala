package graft.table

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** THE pruning safety property: if any row in a file satisfies the
  * predicate, `mayMatch` must keep that file (false positives cost I/O,
  * false negatives cost correctness — the reference gets the same
  * guarantee from Iceberg's inclusive metrics evaluator).
  *
  * Files are generated as value sets, stats are derived from them the same
  * way commit-time stats collection does (min/max/nullCount/valueCount),
  * and predicates are random trees over the leaves P4-P15.
  */
class PruningPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  private val schema = StructType(Seq(StructField("x", LongType)))
  private val attr = AttributeReference("x", LongType)()

  /** Stats derived from the file's values; `degrade` simulates absent
    * parquet statistics (unknown min/max and/or null count) — soundness
    * must hold for those too (unknown must read as "cannot prune"). */
  private def statsOf(values: Seq[Option[Long]],
      degrade: Int = 0): Map[String, ColumnStats] = {
    val present = values.flatten
    val minMax = (degrade & 1) == 0
    val nulls = (degrade & 2) == 0
    Map("x" -> ColumnStats(
      if (minMax) present.minOption.map(_.toString) else None,
      if (minMax) present.maxOption.map(_.toString) else None,
      if (nulls) Some(values.count(_.isEmpty).toLong) else None,
      Some(values.size.toLong)))
  }

  private def lit(v: Long) = Literal(v, LongType)

  // predicate generator over leaves P4-P15 and AND/OR/NOT combinators
  private def leafGen: Gen[Expression] = for {
    v <- Gen.chooseNum(-20L, 20L)
    leaf <- Gen.oneOf[Expression](
      EqualTo(attr, lit(v)),
      EqualNullSafe(attr, lit(v)),
      LessThan(attr, lit(v)),
      LessThanOrEqual(attr, lit(v)),
      GreaterThan(attr, lit(v)),
      GreaterThanOrEqual(attr, lit(v)),
      In(attr, Seq(lit(v), lit(v + 3), lit(v - 7))),
      IsNull(attr),
      IsNotNull(attr))
  } yield leaf

  private def predGen(depth: Int): Gen[Expression] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for { a <- predGen(depth - 1); b <- predGen(depth - 1) } yield And(a, b)),
      2 -> (for { a <- predGen(depth - 1); b <- predGen(depth - 1) } yield Or(a, b)),
      1 -> predGen(depth - 1).map(Not(_)))

  /** Reference row-level evaluation of the predicate on one value. */
  private def evalRow(e: Expression, v: Option[Long]): Option[Boolean] = e match {
    case And(a, b) =>
      (evalRow(a, v), evalRow(b, v)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
    case Or(a, b) =>
      (evalRow(a, v), evalRow(b, v)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
    case Not(a) => evalRow(a, v).map(!_)
    case IsNull(_) => Some(v.isEmpty)
    case IsNotNull(_) => Some(v.isDefined)
    case EqualNullSafe(_, Literal(l: Long, _)) => Some(v.contains(l))
    case EqualTo(_, Literal(l: Long, _)) => v.map(_ == l)
    case LessThan(_, Literal(l: Long, _)) => v.map(_ < l)
    case LessThanOrEqual(_, Literal(l: Long, _)) => v.map(_ <= l)
    case GreaterThan(_, Literal(l: Long, _)) => v.map(_ > l)
    case GreaterThanOrEqual(_, Literal(l: Long, _)) => v.map(_ >= l)
    case In(_, lits) => v.map(x => lits.exists {
      case Literal(l: Long, _) => l == x
      case _ => false
    })
    case _ => None
  }

  test("property: a file containing any matching row is never pruned") {
    val fileGen: Gen[Seq[Option[Long]]] =
      Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
        1 -> Gen.const(None)))

    check(Prop.forAll(fileGen, predGen(3), Gen.choose(0, 3)) {
      (values, pred, degrade) =>
        val anyMatch = values.exists(v => evalRow(pred, v).contains(true))
        val kept = Pruning.mayMatch(pred, statsOf(values, degrade), schema)
        // soundness: matching row => kept, including under degraded stats
        // (absent min/max and/or null counts, as foreign parquet writers
        // produce). The converse — aggressiveness — is best-effort.
        !anyMatch || kept
    }, minSuccessful = 4000)
  }

  test("property: a drop-proved file holds ONLY matching rows (mustMatchAll soundness)") {
    // the DELETE fast path's proof obligation is the mirror image of
    // pruning's: mustMatchAll=true ⇒ EVERY row (nulls included)
    // strictly satisfies the predicate — a false proof silently deletes
    // surviving rows, so this is a correctness property, not a perf one
    val fileGen: Gen[Seq[Option[Long]]] =
      Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
        1 -> Gen.const(None)))
    check(Prop.forAll(fileGen, predGen(3), Gen.choose(0, 3)) {
      (values, pred, degrade) =>
        val file = DataFileEntry("data/f.parquet", values.size.toLong, 1L,
          statsOf(values, degrade))
        val proved = Pruning.mustMatchAll(pred, file, schema)
        !proved || values.forall(v => evalRow(pred, v).contains(true))
    }, minSuccessful = 4000)
  }

  test("property: claimed filters make kept-file totals the exact count") {
    // the DSv2 claim (GraftPruningScanBuilder/provenAll): when every
    // file KEPT by the pruning walk proves all-match, the filter is
    // fully served by file selection — so the manifest record-count sum
    // over kept files must equal the true matching-row count across the
    // WHOLE table (dropped files contribute nothing by mayMatch
    // soundness). A violation would corrupt filtered metadata-only
    // aggregates, not just waste I/O.
    val fileGen: Gen[Seq[Option[Long]]] =
      Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
        1 -> Gen.const(None)))
    val tableGen: Gen[List[Seq[Option[Long]]]] =
      Gen.nonEmptyListOf(fileGen)
    check(Prop.forAll(tableGen, predGen(3), Gen.choose(0, 3)) {
      (files, pred, degrade) =>
        val entries = files.map(values =>
          (values, DataFileEntry("data/f.parquet", values.size.toLong, 1L,
            statsOf(values, degrade))))
        val kept = entries.filter { case (_, f) =>
          Pruning.mayMatchFile(pred, f, schema) }
        val claimed = kept.forall { case (_, f) =>
          Pruning.mustMatchAll(pred, f, schema) }
        val exact = files.flatten.count(v => evalRow(pred, v).contains(true))
        !claimed || kept.map(_._2.recordCount).sum == exact.toLong
    }, minSuccessful = 4000)
  }

  test("property: truncated string bounds stay sound for keep AND proof") {
    // manifests cap string bounds (ColumnStats.StringBoundCapBytes —
    // min truncates down, max rounds UP in UTF-8 byte order). Soundness
    // both ways: a file holding a matching row is never pruned, and a
    // drop/claim proof over capped bounds still implies every row
    // matches. Mixed-width code points (1..4 UTF-8 bytes) are the
    // interesting cases — the cap cuts at code-point boundaries.
    val strSchema = StructType(Seq(StructField("s", StringType)))
    val sAttr = AttributeReference("s", StringType)()
    val tokens = Seq("a", "b", "z", "é", "中",
      new String(Character.toChars(0x1F600)))
    val strGen: Gen[String] = for {
      n <- Gen.choose(0, 10)
      parts <- Gen.listOfN(n, Gen.oneOf(tokens))
    } yield parts.mkString
    val fileGen: Gen[Seq[Option[String]]] =
      Gen.nonEmptyListOf(Gen.frequency(
        8 -> strGen.map(Some(_)), 1 -> Gen.const(None)))
    def utf8Cmp(a: String, b: String): Int =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    def slit(v: String) =
      Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
        StringType)
    val predGenS: Gen[Expression] = for {
      v <- strGen
      leaf <- Gen.oneOf[Expression](
        EqualTo(sAttr, slit(v)),
        LessThan(sAttr, slit(v)),
        LessThanOrEqual(sAttr, slit(v)),
        GreaterThan(sAttr, slit(v)),
        GreaterThanOrEqual(sAttr, slit(v)),
        In(sAttr, Seq(slit(v), slit(v + "a"))),
        StartsWith(sAttr, slit(v.take(3))),
        IsNull(sAttr), IsNotNull(sAttr))
    } yield leaf
    def evalStr(e: Expression, v: Option[String]): Option[Boolean] = e match {
      case EqualTo(_, Literal(l, _)) => v.map(s => utf8Cmp(s, l.toString) == 0)
      case LessThan(_, Literal(l, _)) => v.map(s => utf8Cmp(s, l.toString) < 0)
      case LessThanOrEqual(_, Literal(l, _)) =>
        v.map(s => utf8Cmp(s, l.toString) <= 0)
      case GreaterThan(_, Literal(l, _)) =>
        v.map(s => utf8Cmp(s, l.toString) > 0)
      case GreaterThanOrEqual(_, Literal(l, _)) =>
        v.map(s => utf8Cmp(s, l.toString) >= 0)
      case In(_, ls) => v.map(s => ls.exists {
        case Literal(l, _) => utf8Cmp(s, l.toString) == 0 })
      case StartsWith(_, Literal(l, _)) => v.map(_.startsWith(l.toString))
      case IsNull(_) => Some(v.isEmpty)
      case IsNotNull(_) => Some(v.isDefined)
      case _ => None
    }
    check(Prop.forAll(fileGen, predGenS, Gen.choose(4, 12)) {
      (values, pred, cap) =>
        val present = values.flatten
        val mn = present.reduceOption((a, b) => if (utf8Cmp(a, b) <= 0) a else b)
        val mx = present.reduceOption((a, b) => if (utf8Cmp(a, b) >= 0) a else b)
        val stats = Map("s" -> ColumnStats(
          mn.map(ColumnStats.truncateMinString(_, cap)),
          mx.flatMap(ColumnStats.truncateMaxString(_, cap)),
          Some(values.count(_.isEmpty).toLong),
          Some(values.size.toLong)))
        val file = DataFileEntry("data/f.parquet", values.size.toLong, 1L,
          stats)
        val anyMatch = values.exists(v => evalStr(pred, v).contains(true))
        val kept = Pruning.mayMatchFile(pred, file, strSchema)
        val proved = Pruning.mustMatchAll(pred, file, strSchema)
        val keepSound = !anyMatch || kept
        val proofSound = !proved ||
          values.forall(v => evalStr(pred, v).contains(true))
        keepSound && proofSound
    }, minSuccessful = 4000)
  }

  test("property: partition-derived stats never prune a matching partition") {
    // a partitioned file's rows ALL carry the partition value; its stats
    // are synthesized by PartitionValues.stats (min = max = value, or
    // all-null). Soundness: if the partition value satisfies the
    // predicate, the file must be kept.
    val valueGen: Gen[Option[Long]] = Gen.frequency(
      8 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
      1 -> Gen.const(None))
    check(Prop.forAll(valueGen, predGen(3), Gen.chooseNum(1L, 100L)) {
      (value, pred, rows) =>
        val stats = Map("x" ->
          PartitionValues.stats(value.map(_.toString), LongType, rows))
        val matches = evalRow(pred, value).contains(true)
        !matches || Pruning.mayMatch(pred, stats, schema)
    }, minSuccessful = 4000)
  }

  test("property: string equality pruning is sound") {
    val sattr = AttributeReference("s", StringType)()
    val sschema = StructType(Seq(StructField("s", StringType)))
    val words = Gen.oneOf("apple", "banana", "cherry", "date", "elder", "fig")
    check(Prop.forAll(Gen.nonEmptyListOf(words), words) { (values, probe) =>
      val stats = Map("s" -> ColumnStats(
        Some(values.min), Some(values.max), Some(0L), Some(values.size.toLong)))
      val pred = EqualTo(sattr,
        Literal(UTF8String.fromString(probe), StringType))
      !values.contains(probe) ||
        Pruning.mayMatch(pred, stats, sschema)
    }, minSuccessful = 500)
  }

  test("property: the segment envelope never skips a segment holding a match") {
    // the manifest-list envelope (ColumnStats.mergeEnvelope over a
    // segment's per-file stats) gates whether a segment is PARSED at
    // all — an unsound merge silently drops matching files from every
    // predicate-scoped scan and DML. Property: for random file sets
    // (with degraded stats) and random predicates,
    //   ¬mayMatch(pred, envelope) ⟹ no file in the segment may match
    //   (and in particular no row anywhere in the segment matches).
    val fileGen: Gen[(Seq[Option[Long]], Int)] = for {
      values <- Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.chooseNum(-20L, 20L).map(Some(_)),
        1 -> Gen.const(None)))
      degrade <- Gen.choose(0, 3)
    } yield (values, degrade)
    check(Prop.forAll(Gen.nonEmptyListOf(fileGen), predGen(3)) {
      (files, pred) =>
        val entries = files.zipWithIndex.map { case ((values, degrade), i) =>
          DataFileEntry(s"data/f$i.parquet", values.size.toLong, 1L,
            statsOf(values, degrade))
        }
        val env = ColumnStats.mergeEnvelope(entries, schema)
        val segKept = Pruning.mayMatch(pred, env, schema)
        val anyFileKept = entries.exists(e =>
          Pruning.mayMatch(pred, e.stats, schema))
        val anyRowMatch = files.exists(_._1.exists(v =>
          evalRow(pred, v).contains(true)))
        // skip ⟹ every file would have been pruned anyway ⟹ no match
        segKept || (!anyFileKept && !anyRowMatch)
    }, minSuccessful = 4000)
  }
}
