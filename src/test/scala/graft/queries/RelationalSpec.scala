package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Checks the oracle can't express: approximate aggregates bounded against
  * exact answers, and the flagship entry smoke.
  */
class RelationalSpec extends SparkSpecBase {

  private val d = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within 5% of exact per group") {
    val approx = Relational.queries("q36_approx_agg")(spark, d)
      .select("l_returnflag", "approx_orders")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(sf("lineitem"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((flag, n) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n < 0.05,
        s"$flag: approx $a vs exact $n")
    }
  }

  test("approx_count_distinct keeps its bound at the bench SF (sf0.1)") {
    // the sketch's rsd is scale-free, but this is the honest check that
    // the claim holds at 100x the sf0.001 volume rather than only at the
    // calibration scale
    val big = "/root/testdata/sf0.1"
    val approx = Relational.queries("q36_approx_agg")(spark, big)
      .select("l_returnflag", "approx_orders")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$big/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((flag, n) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - n).toDouble / n < 0.05,
        s"$flag: approx $a vs exact $n at sf0.1")
    }
  }

  test("approx median within the true p40-p60 band") {
    val approx = Relational.queries("q36_approx_agg")(spark, d)
      .select("l_returnflag", "approx_median_price")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = spark.read.parquet(sf("lineitem"))
    for ((flag, med) <- approx) {
      val band = li.filter(col("l_returnflag") === flag)
        .stat.approxQuantile("l_extendedprice", Array(0.4, 0.6), 0.001)
      assert(med >= band(0) && med <= band(1),
        s"$flag: median $med outside [${band(0)}, ${band(1)}]")
    }
  }
}
