package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.CellAssign.{cell_argmax, cell_topn, codebook}

/** The fused cell-assignment kernels must be BIT-IDENTICAL to the
  * composed-Column formulation they replace (`array_max` / reversed
  * `array_sort` over (sim, cid) structs built from literal centroids) —
  * the IVF/SemDeDup queries' results and the s09 oracle hash both hang on
  * that equivalence, including tie and NaN resolution.
  */
class CellAssignSpec extends SparkSpecBase {

  // the composed formulation the kernels replace, verbatim
  private def composedSims(v: org.apache.spark.sql.Column,
      centers: Seq[Seq[Double]], roundTo: Int) =
    array(centers.zipWithIndex.map { case (cv, i) =>
      val s = graft.queries.Dedup.cosineSim(v, typedLit(cv))
      struct((if (roundTo >= 0) round(s, roundTo) else s).as("sim"),
        lit(i).as("cid"))
    }: _*)

  private def randCenters(rng: scala.util.Random, k: Int, dim: Int) =
    Seq.fill(k)(Seq.fill(dim)(rng.nextGaussian()))

  test("argmax and topN match the composed struct formulation on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    for (roundTo <- Seq(-1, 6)) {
      val centers = randCenters(rng, 8, 16)
      val vecs = (0 until 300).map(i =>
        (i.toLong, Seq.fill(16)(rng.nextGaussian()))) ++
        // duplicated centroids upstream would tie exactly; near-ties at
        // the rounding edge are what roundTo = 6 pins
        (300 until 310).map(i => (i.toLong, centers(i % 8).map(_ * 2.0)))
      val df = vecs.toDF("id", "v")
      val cb = codebook(centers, roundTo)
      val got = df.select(col("id"),
        cell_argmax(col("v"), cb).as("cid"),
        cell_topn(col("v"), cb, 3).as("top"))
      val want = df.select(col("id"),
        array_max(composedSims(col("v"), centers, roundTo))
          .getField("cid").as("cid"),
        slice(reverse(array_sort(composedSims(col("v"), centers, roundTo))),
          1, 3).getField("cid").as("top"))
      val g = got.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
      val w = want.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
      assert(g.sameElements(w), s"roundTo=$roundTo diverged")
    }
  }

  test("exact ties and zero-norm (all-NaN sims) resolve like the struct ordering") {
    import spark.implicits._
    // two identical centroids → every vector ties exactly between cids 0/1;
    // the zero vector makes every sim NaN
    val centers = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Seq(2.0, 0.1)), (2L, Seq(0.0, 0.0)), (3L, Seq(-1.0, 5.0))
    ).toDF("id", "v")
    val cb = codebook(centers)
    val got = df.select(col("id"), cell_argmax(col("v"), cb).as("cid"),
      cell_topn(col("v"), cb, 3).as("top"))
    val want = df.select(col("id"),
      array_max(composedSims(col("v"), centers, -1)).getField("cid").as("cid"),
      slice(reverse(array_sort(composedSims(col("v"), centers, -1))), 1, 3)
        .getField("cid").as("top"))
    val g = got.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    val w = want.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(g.sameElements(w), s"got=${g.mkString(";")} want=${w.mkString(";")}")
    // the tie really goes to the LARGER cid (guards the comparator)
    assert(g.find(_._1 == 1L).get._2 == 1)
    // all-NaN: ordering degenerates to cid desc
    assert(g.find(_._1 == 2L).get._3 == Seq(2, 1, 0))
  }

  test("null vector is null; topN caps at k") {
    import spark.implicits._
    val cb = codebook(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val df = Seq((1L, Option(Seq(1.0, 2.0))), (2L, None))
      .toDF("id", "v")
    val rows = df.select(cell_argmax(col("v"), cb).as("cid"),
      cell_topn(col("v"), cb, 5).as("top")).collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getSeq[Int](1).size == 2))
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }
}
