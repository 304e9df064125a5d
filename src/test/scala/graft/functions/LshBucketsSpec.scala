package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.LshBuckets.{family, hyperplane_buckets}

/** The fused hyperplane-bucket kernel must reproduce the composed
  * `when(cosine_sim(v, plane) >= 0, 1L << i)` fold bit for bit — the s02
  * and d06 oracle hashes hang on the sign blocking being identical,
  * including the zero-norm edge (cosine NaN, which Spark's `>=` treats as
  * greater than any number → sign bit set, like dot = +0.0 here).
  */
class LshBucketsSpec extends SparkSpecBase {

  private def composed(v: org.apache.spark.sql.Column,
      tables: Seq[Seq[Array[Double]]], nPlanes: Int) =
    array(tables.zipWithIndex.map { case (planes, ti) =>
      planes.zipWithIndex.map { case (p, i) =>
        when(graft.queries.Dedup.cosineSim(v, typedLit(p.toSeq)) >= 0,
          lit(1L << i)).otherwise(0L)
      }.reduce(_ bitwiseOR _) + lit(ti.toLong * (1L << nPlanes))
    }: _*)

  test("bucket keys match the composed sign fold, including the zero vector") {
    import spark.implicits._
    val rng = new scala.util.Random(13L)
    val nPlanes = 6
    val tables = Seq.fill(4)(Seq.fill(nPlanes)(Array.fill(8)(rng.nextGaussian())))
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextGaussian()))) :+
      (200L, Seq.fill(8)(0.0)) // zero-norm: NaN cosine vs +0.0 dot
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
      hyperplane_buckets(col("v"), family(tables)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    val want = df.select(col("id"), composed(col("v"), tables, nPlanes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(got.sameElements(want))
    // the zero vector's bits are all SET (Spark NaN semantics), not clear
    assert(got.last._2 == (0 until 4).map(ti =>
      (1L << nPlanes) - 1 + ti.toLong * (1L << nPlanes)))
    // buckets from different tables never collide
    val flat = got.flatMap { case (_, bs) =>
      bs.zipWithIndex.map { case (b, ti) => b -> ti } }
    assert(flat.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1))
  }

  test("null vector stays null") {
    import spark.implicits._
    val tables = Seq(Seq(Array(1.0, 0.0)))
    val df = Seq((1L, Option(Seq(1.0, 2.0))), (2L, None)).toDF("id", "v")
    val rows = df.select(hyperplane_buckets(col("v"), family(tables)).as("b"))
      .collect()
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
