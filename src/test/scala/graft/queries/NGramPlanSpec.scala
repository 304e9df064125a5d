package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.window.WindowExecBase

import graft.{SparkEntry, SparkSpecBase}

/** Plan gate for the n-gram queries: the fused Bigrams/KGrams kernels must
  * keep gram construction per-row. The alternative spelling — posexplode +
  * `lead().over(Window.partitionBy(doc_id))` — sort-shuffles the ENTIRE
  * corpus token stream just to look 1-2 array slots ahead (measured ~2x on
  * every minhash query when KGrams replaced it in round 4). This spec fails
  * the build if a Window sneaks back into t06/t13, and pins t13 to its
  * zero-shuffle shape.
  *
  * The gate collects PHYSICAL OPERATOR CLASSES (not plan-string
  * substrings): a plan-format change can silently defuse a string match,
  * but a `WindowExecBase`/`Exchange` node is a node whatever it prints as.
  * Each assertion set includes a POSITIVE expectation (the agg exchange /
  * the agg itself), so the gate cannot pass vacuously on an unparsed or
  * empty plan.
  */
class NGramPlanSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Every physical node in the plan, descending into AQE wrappers
    * (executedPlan wraps the tree in AdaptiveSparkPlanExec whose
    * CURRENT physical plan is not a `children` member). */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val self = plan match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case other => other.children.flatMap(allNodes)
    }
    plan +: self
  }

  private def nodesOf(name: String): Seq[SparkPlan] =
    allNodes(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan)

  test("t06_bigrams: no window sort over the token stream") {
    val nodes = nodesOf("t06_bigrams")
    assert(!nodes.exists(_.isInstanceOf[WindowExecBase]),
      s"window node in t06 plan:\n${nodes.map(_.nodeName).mkString("\n")}")
    // positive expectation: the bigram count IS a hash aggregate with its
    // exchange — an empty/unresolved walk cannot satisfy this
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]),
      "t06 lost its hash aggregate — the plan walk saw a different shape")
    val exchanges = nodes.count(_.isInstanceOf[Exchange])
    assert(exchanges >= 1 && exchanges <= 2,
      s"t06 grew extra shuffles ($exchanges):\n" +
        nodes.map(_.nodeName).mkString("\n"))
  }

  test("t13_repetition: per-row grams, zero shuffles, no window") {
    val nodes = nodesOf("t13_repetition")
    assert(!nodes.exists(_.isInstanceOf[WindowExecBase]),
      s"window node in t13 plan:\n${nodes.map(_.nodeName).mkString("\n")}")
    assert(!nodes.exists(_.isInstanceOf[Exchange]),
      s"t13 should be shuffle-free:\n${nodes.map(_.nodeName).mkString("\n")}")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      s"t13 should not sort:\n${nodes.map(_.nodeName).mkString("\n")}")
    // positive expectation: it still reads the documents parquet
    assert(nodes.exists(n => n.nodeName.toLowerCase.contains("scan")),
      "t13 plan walk found no scan — vacuous gate")
  }
}
