package graft.queries

import graft.{SparkEntry, SparkSpecBase}

/** Plan gate for the n-gram queries: the fused Bigrams/KGrams kernels must
  * keep gram construction per-row. The alternative spelling — posexplode +
  * `lead().over(Window.partitionBy(doc_id))` — sort-shuffles the ENTIRE
  * corpus token stream just to look 1-2 array slots ahead (measured ~2x on
  * every minhash query when KGrams replaced it in round 4). This spec fails
  * the build if a Window sneaks back into t06/t13, and pins t13 to its
  * zero-shuffle shape.
  */
class NGramPlanSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def physicalPlan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("t06_bigrams: no window sort over the token stream") {
    val plan = physicalPlan("t06_bigrams")
    assert(!plan.contains("Window"), s"window node in t06 plan:\n$plan")
    // exactly the agg shuffle + the output orderBy range exchange
    val exchanges = "Exchange (hash|range|Single)".r.findAllIn(plan).length
    assert(exchanges <= 2, s"t06 grew extra shuffles ($exchanges):\n$plan")
  }

  test("t13_repetition: per-row grams, zero shuffles, no window") {
    val plan = physicalPlan("t13_repetition")
    assert(!plan.contains("Window"), s"window node in t13 plan:\n$plan")
    assert(!plan.contains("Exchange"), s"t13 should be shuffle-free:\n$plan")
    assert(!plan.contains("Sort"), s"t13 should not sort:\n$plan")
  }
}
