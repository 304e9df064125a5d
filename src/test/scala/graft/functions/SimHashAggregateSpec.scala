package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.SimHashAggregate.simhash_agg

/** The fused simhash aggregate must match the composed 64-column bit-sum
  * formulation bit for bit — the d05/d15 oracle hashes depend on it. */
class SimHashAggregateSpec extends SparkSpecBase {

  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val bitSums = (0 until 64).map { bit =>
      sum(when(shiftright(col("h"), bit).bitwiseAND(1L) === 1L, 1L)
        .otherwise(-1L)).as(s"b$bit")
    }
    df.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { bit =>
          when(col(s"b$bit") > 0, lit(1L << bit)).otherwise(0L)
        }.reduce(_ bitwiseOR _).as("simhash"))
  }

  test("matches the composed 64-column formulation on random groups") {
    import spark.implicits._
    val rng = new scala.util.Random(29L)
    // negative hashes exercise the arithmetic-vs-logical shift edge at
    // bit 63; singleton and large groups exercise merge paths
    val rows = (0 until 5000).map { i =>
      (i % 97L, rng.nextLong())
    } ++ Seq((1000L, -1L), (1001L, Long.MinValue), (1002L, 0L))
    val df = rows.toDF("doc_id", "h").repartition(8)
    val got = df.groupBy("doc_id").agg(simhash_agg(col("h")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val want = composed(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(got.sameElements(want))
    // sign bit of an all-negative group is actually SET (bit-63 coverage)
    assert((got.find(_._1 == 1001L).get._2 >>> 63) == 1L)
  }

  test("all-null group assembles to 0 like the columnwise when(NULL > 0)") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[Long]), (1L, None), (2L, Some(-1L)))
      .toDF("doc_id", "h")
    val got = df.groupBy("doc_id").agg(simhash_agg(col("h")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = composed(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got(1L) == 0L)
    assert(got(2L) == -1L) // every bit sum positive → all 64 bits set
  }
}
