package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The native cosine expression: correct values (vs a plain Scala
  * reference), bit-identical between codegen and interpreted paths, usable
  * from SQL, and null/edge behavior.
  */
class CosineSimilaritySpec extends SparkSpecBase {

  private def refCos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    for (i <- a.indices.take(math.min(a.size, b.size))) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i)
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private lazy val df = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    (1 to 50).map { i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian()))
    }.toDF("id", "x", "y")
  }

  test("matches a scalar reference implementation bit-for-bit") {
    val got = df.select(col("id"),
        GraftFunctions.cosine_sim(col("x"), col("y")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = df.collect().map(r => (r.getLong(0),
      r.getSeq[Double](1), r.getSeq[Double](2)))
    for ((id, x, y) <- rows) {
      assert(got(id) == refCos(x, y), s"row $id")
    }
  }

  test("identical vectors give 1.0; orthogonal give 0.0") {
    import spark.implicits._
    val d = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("x", "y")
    val out = d.select(GraftFunctions.cosine_sim(col("x"), col("y")))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-15)
    assert(out(1) == 0.0)
  }

  test("null input yields null") {
    import spark.implicits._
    val d = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("x", "y")
    val out = d.select(GraftFunctions.cosine_sim(col("x"), col("y")))
      .collect()
    assert(out(0).isNullAt(0))
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT id, cosine_sim(x, y) AS c FROM vecs ORDER BY id LIMIT 1")
      .collect()
    val first = df.orderBy("id").collect()(0)
    assert(out(0).getDouble(1) ==
      refCos(first.getSeq[Double](1), first.getSeq[Double](2)))
  }

  test("type checking rejects non-double arrays") {
    import spark.implicits._
    val d = Seq((Seq(1, 2), Seq(1.0, 2.0))).toDF("x", "y")
    val e = intercept[Exception] {
      // int array is implicitly castable? if analysis succeeds, execution
      // must still produce a correct double result after cast; otherwise
      // a clear analysis error is fine — both are acceptable, crash is not
      val r = d.select(GraftFunctions.cosine_sim(col("x"), col("y"))).collect()
      assert(r(0).getDouble(0) == refCos(Seq(1.0, 2.0), Seq(1.0, 2.0)))
      throw new RuntimeException("implicit-cast-ok")
    }
    assert(e.getMessage.contains("implicit-cast-ok") ||
      e.getMessage.toLowerCase.contains("array<double>") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
