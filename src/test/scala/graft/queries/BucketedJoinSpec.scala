package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketing: pre-partitioning both join sides on the key eliminates the
  * join-time shuffle — the co-located-join strategy for repeated joins of
  * the same big tables at scale (pay one shuffle at write time, none per
  * query). Asserts both the plan property (no shuffle above the scans)
  * and result equality with the plain shuffle join.
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle and match the plain join") {
    // default warehouse dir (spark.sql.warehouse.dir is static); managed
    // tables are dropped below, which deletes their files
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    val orders = spark.read.parquet(sf("orders"))
    val customer = spark.read.parquet(sf("customer"))
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_customer")

    // disable auto-broadcast so the join strategy is driven by bucketing,
    // not by table size (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bo = spark.table("b_orders")
      val bc = spark.table("b_customer")
      val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val expect = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
      assert(joined.count() == expect.count())
      assert(joined.exceptAll(expect).isEmpty && expect.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
