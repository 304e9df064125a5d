package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The native dot-product expression (PQ scoring hot scalar): correct
  * values vs a plain Scala reference, consistent with cosine_sim, and
  * null behavior.
  */
class DotProductSpec extends SparkSpecBase {

  private def refDot(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0
    for (i <- a.indices.take(math.min(a.size, b.size))) dot += a(i) * b(i)
    dot
  }

  private lazy val df = {
    import spark.implicits._
    val rng = new scala.util.Random(9)
    (1 to 50).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian()))
    }.toDF("id", "x", "y")
  }

  test("matches a scalar reference implementation bit-for-bit") {
    val got = df.select(col("id"),
        DotProduct.dot_product(col("x"), col("y")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = df.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1), r.getSeq[Double](2)))
    for ((id, x, y) <- rows) {
      assert(got(id) == refDot(x, y), s"row $id")
    }
  }

  test("dot(x, x) equals the squared norm and cos = dot / (|x||y|) holds") {
    val out = df.select(
        DotProduct.dot_product(col("x"), col("y")).as("dxy"),
        DotProduct.dot_product(col("x"), col("x")).as("dxx"),
        DotProduct.dot_product(col("y"), col("y")).as("dyy"),
        GraftFunctions.cosine_sim(col("x"), col("y")).as("cos"))
      .collect()
    for (r <- out) {
      assert(r.getDouble(1) > 0 && r.getDouble(2) > 0)
      // same fused accumulation order in both expressions → exact equality
      assert(r.getDouble(3) ==
        r.getDouble(0) / (math.sqrt(r.getDouble(1)) * math.sqrt(r.getDouble(2))))
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val d = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("x", "y")
    val out = d.select(DotProduct.dot_product(col("x"), col("y"))).collect()
    assert(out(0).isNullAt(0))
  }
}
