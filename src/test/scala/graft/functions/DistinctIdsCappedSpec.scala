package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** DistinctIdsCapped must equal the `distinct → countDistinct + full set`
  * reference for every group, including across partial-buffer merges — it
  * replaces that two-shuffle spelling in d12, so any divergence (a
  * boundary off-by-one at the cap, a merge that loses the overflow bit)
  * would silently change which grams expand into pairs. */
class DistinctIdsCappedSpec extends SparkSpecBase {

  import org.scalatest.prop.TableDrivenPropertyChecks._

  test("matches the distinct+countDistinct reference across caps and merges") {
    val rng = new scala.util.Random(11)
    // few groups + heavy duplication → groups straddle the cap both ways,
    // and ids repeat WITHIN and ACROSS input partitions
    val rows = Seq.tabulate(4000)(_ =>
      (rng.nextInt(12).toLong, rng.nextInt(30).toLong))
    import spark.implicits._
    val df = rows.toDF("g", "id").repartition(16)
    val ref = df.distinct().groupBy("g")
      .agg(countDistinct(col("id")).as("df"),
        sort_array(collect_set(col("id"))).as("ids"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2)))
      .toMap
    forAll(Table("cap", 1, 5, 14, 15, 16, 29, 30, 100)) { cap =>
      val got = df.groupBy("g")
        .agg(GraftFunctions.distinct_ids_capped(col("id"), cap).as("ids"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
        .toMap
      assert(got.keySet == ref.keySet, s"cap=$cap")
      got.foreach { case (g, ids) =>
        val (n, want) = ref(g)
        if (n > cap) assert(ids == null, s"cap=$cap g=$g: expected overflow")
        else assert(ids == want, s"cap=$cap g=$g")
      }
    }
  }

  test("null ids are ignored; all-null group yields an empty array") {
    import spark.implicits._
    val df = Seq[(Long, Option[Long])](
      (1L, Some(3L)), (1L, None), (1L, Some(3L)), (2L, None))
      .toDF("g", "id")
    val out = df.groupBy("g")
      .agg(GraftFunctions.distinct_ids_capped(col("id"), 5).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(3L))
    assert(out(2L) == Seq())
  }

  test("plan aggregates (partial-merge) with no pre-distinct exchange") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("g", "id")
    val agg = df.groupBy("g")
      .agg(GraftFunctions.distinct_ids_capped(col("id"), 3).as("ids"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"))
    // exactly one exchange: the aggregate's own (no distinct upstream)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1)
  }
}
