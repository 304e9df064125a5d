package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** TopKByScore must be exactly the window top-k (row_number over
  * score desc, id asc) for every k, including across partition merges —
  * it replaces that window in the kNN queries, so any divergence would
  * silently change s01/s02/m04 results.
  */
class TopKSpec extends SparkSpecBase {

  import org.scalatest.prop.TableDrivenPropertyChecks._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(GraftFunctions.top_k_by_score(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank"), col("id"), col("score"))
  }

  test("matches window top-k on random data, including score ties") {
    val rng = new scala.util.Random(7)
    // coarse scores force ties → exercises the id asc tie-break
    val rows = Seq.tabulate(5000)(i =>
      (rng.nextInt(7).toLong, i.toLong, (rng.nextInt(40) / 10.0)))
    import spark.implicits._
    // 16 partitions → many partial buffers to merge
    val df = rows.toDF("g", "id", "score").repartition(16)
    forAll(Table("k", 1, 3, 10, 100, 5000, 9000)) { k =>
      val got = topk(df, k).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      val want = windowed(df, k).collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted
      assert(got.toSeq == want.toSeq, s"k=$k")
    }
  }

  test("null score or id rows are ignored; empty group yields empty array") {
    import spark.implicits._
    val df = Seq[(Long, Option[Long], Option[Double])](
      (1L, Some(1L), Some(0.5)), (1L, None, Some(9.9)), (1L, Some(2L), None))
      .toDF("g", "id", "score")
    val out = topk(df.select(col("g"), col("id"), col("score")), 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 0.5)))
  }

  test("plan aggregates (partial-merge), no window over the full input") {
    import spark.implicits._
    val df = Seq((1L, 1L, 0.1)).toDF("g", "id", "score")
    val plan = topk(df, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }
}
