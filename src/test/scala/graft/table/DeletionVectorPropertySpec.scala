package graft.table

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Deletion-vector encoding invariants: a write/read round trip is the
  * identity on sorted-distinct position sets (any gap pattern — dense
  * runs, huge jumps, Long-scale positions), duplicates collapse, the
  * header count is the distinct count, and membership via the
  * binary-search path agrees with the source set exactly. The positional
  * read path's correctness rests on these.
  */
class DeletionVectorPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(1207L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  private val tmp = java.nio.file.Files
    .createTempDirectory("graft-dvprop").toString
  private val counter = new java.util.concurrent.atomic.AtomicInteger

  // position sets mixing dense runs (delta 1 — the mass-delete shape),
  // small gaps, and huge jumps (varint multi-byte paths)
  private val genPositions: Gen[Seq[Long]] = Gen.frequency(
    1 -> Gen.const(Seq.empty[Long]), // the count-0 header/patch path
    9 -> (for {
      n <- Gen.choose(0, 400)
      start <- Gen.choose(0L, 1L << 40)
      deltas <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.const(1L),
        3 -> Gen.choose(1L, 64L),
        1 -> Gen.choose(1L, 1L << 33)))
    } yield deltas.scanLeft(start)(_ + _)))

  test("write → read is identity on sorted-distinct sets; count exact") {
    check(Prop.forAll(genPositions, Gen.choose(1, 5)) { (pos, dupEvery) =>
      val path = s"$tmp/dv-${counter.incrementAndGet()}.bin"
      // inject duplicates (the writer's contract: skip, keep sorted)
      val withDupes = pos.flatMap(p =>
        if (p % dupEvery == 0) Seq(p, p) else Seq(p))
      val n = DeletionVector.write(path, withDupes.iterator)
      val back = DeletionVector.read(path)
      val want = pos.distinct
      Prop(n == want.size) :| s"count $n != ${want.size}" &&
        Prop(back.toSeq == want) :| "round-trip mismatch"
    }, minSuccessful = 200)
  }

  test("DvIndex membership agrees with the source set across files") {
    check(Prop.forAll(genPositions, genPositions) { (a, b) =>
      val pa = s"$tmp/ix-${counter.incrementAndGet()}.bin"
      val pb = s"$tmp/ix-${counter.incrementAndGet()}.bin"
      DeletionVector.write(pa, a.iterator)
      DeletionVector.write(pb, b.iterator)
      val idx = DvIndex(Map("fa.parquet" -> pa, "fb.parquet" -> pb))
      val setA = a.toSet
      val setB = b.toSet
      val probes = (a.take(50) ++ b.take(50) ++
        a.take(20).map(_ + 1) ++ Seq(0L, 7L, Long.MaxValue / 2)).distinct
      val fa = UTF8String.fromString("fa.parquet")
      val fb = UTF8String.fromString("fb.parquet")
      val fc = UTF8String.fromString("absent.parquet")
      Prop.all(probes.map(p =>
        Prop(idx.contains(fa, p) == setA(p) &&
          idx.contains(fb, p) == setB(p) &&
          !idx.contains(fc, p)) :| s"probe $p"): _*)
    }, minSuccessful = 100)
  }

  test("writer refuses unsorted input; reader refuses foreign bytes") {
    val path = s"$tmp/bad-${counter.incrementAndGet()}.bin"
    intercept[IllegalArgumentException] {
      DeletionVector.write(path, Iterator(5L, 3L))
    }
    val junk = s"$tmp/junk-${counter.incrementAndGet()}.bin"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
    intercept[IllegalArgumentException] { DeletionVector.read(junk) }
  }
}
