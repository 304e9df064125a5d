package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpecBase}
import graft.tools.ExplainAudit

/** Broadcast policy gate: explicit `broadcast()` hints are allowed only on
  * relations bounded independent of SF (nation, region, 1-row scalar
  * aggregates, LIMITed sets). A hint on customer/supplier/part/lineitem/…
  * overrides Spark's size check and becomes a driver-OOM at cluster scale,
  * so EVERY SparkEntry query is audited here — reintroducing the pattern
  * anywhere fails the build.
  */
class BroadcastPolicySpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("no SparkEntry query broadcast-hints an SF-proportional relation") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        // building the DataFrame analyzes the plan; no execution needed
        val viol =
          try ExplainAudit.broadcastViolations(q(spark, sfDir))
          catch { case e: Exception => Seq(s"plan build failed: $e") }
        viol.map(v => s"$name: $v")
    }
    assert(offenders.isEmpty, s"\n${offenders.mkString("\n")}")
  }

  test("the detector itself fires on a hinted SF-proportional table") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val bad = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
    assert(ExplainAudit.broadcastViolations(bad).nonEmpty)
    // bounded shapes stay allowed: 1-row global aggregate and LIMIT
    val scalar = o.agg(avg(col("o_totalprice")).as("a"))
    val okScalar = li.join(broadcast(scalar), col("l_extendedprice") > col("a"))
    assert(ExplainAudit.broadcastViolations(okScalar).isEmpty)
    val okLimit = li.join(broadcast(o.limit(10)),
      col("l_orderkey") === col("o_orderkey"))
    assert(ExplainAudit.broadcastViolations(okLimit).isEmpty)
  }
}
