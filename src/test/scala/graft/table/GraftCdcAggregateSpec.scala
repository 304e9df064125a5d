package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Retraction-aware streaming aggregation ([[GraftCdcAggregate]]): a
  * grouped COUNT/SUM aggregate table maintained from a source table's
  * `__changes` CDC stream must equal a full recompute of the source
  * through mixed UPDATE/DELETE/MERGE upstream DML — across a checkpoint
  * restart — and the per-batch apply must be exactly-once under
  * foreachBatch replay (the cursor rides the SAME commit as the upsert). */
class GraftCdcAggregateSpec extends SparkSpecBase {

  private val srcSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType, nullable = false),
    StructField("amount", LongType, nullable = false)))

  private val aggSchema = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("sum_amount", LongType, nullable = false)))

  private lazy val wh = tmpDir("graft-cdcagg")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gca", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gca.warehouse", wh)
  }

  private def df(rows: (Long, String, Long)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2), srcSchema)

  private def aggState(t: GraftTable): Map[String, (Long, Long)] =
    t.read(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def recompute(src: GraftTable): Map[String, (Long, Long)] =
    src.read(spark).groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("amount").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("stream-maintained aggregate equals full recompute across mixed DML + restart") {
    val src = GraftTable.create(s"$wh/db/agg_src", srcSchema)
    src.append(df((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      , Some(1000L))
    val agg = GraftTable.create(s"$wh/db/agg_dst", aggSchema)
    val ckpt = tmpDir("cdcagg-ckpt")

    def drain(): Unit = {
      val q = GraftCdcAggregate.into(spark, "gca.db.agg_src", agg,
          Seq("grp"), Seq("amount" -> "sum_amount"), "agg-sink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(aggState(GraftTable.load(agg.dir)) == recompute(src),
      "seed diverged")

    // mixed DML: CoW update (retract-old + insert-new), positional
    // delete, MoR upsert moving a row ACROSS groups, plain append
    src.update(spark, col("id") === 1L,
      Map("amount" -> lit(100L)), Some(2000L))
    src.deletePositional(spark, col("id") === 3L, Some(3000L))
    src.mergeEquality(spark, df((2L, "c", 7L)), Seq("id"), Some(4000L))
    src.append(df((4L, "b", 50L)), Some(5000L))
    drain()
    val afterDml = recompute(src)
    assert(aggState(GraftTable.load(agg.dir)) == afterDml,
      s"diverged after mixed DML: ${aggState(GraftTable.load(agg.dir))} " +
        s"vs $afterDml")

    // RESTART from the checkpoint: more DML, a fresh query instance.
    // (positional delete STACKS on the upsert's pending equality entry —
    // the cross-form composition this round added)
    src.deletePositional(spark, col("grp") === "c", Some(6000L))
    src.append(df((5L, "d", 1L)), Some(7000L))
    drain()
    assert(aggState(GraftTable.load(agg.dir)) == recompute(src),
      "diverged after checkpoint restart")
    // a group whose rows all died is GONE from the aggregate, not zero
    assert(!aggState(GraftTable.load(agg.dir)).contains("c"),
      "empty group kept a zero row")
  }

  test("applyBatch is exactly-once under foreachBatch replay") {
    val agg = GraftTable.create(s"$wh/db/agg_rep", aggSchema)
    def cdc(ins: Seq[(Long, String, Long)], dels: Seq[(Long, String, Long)])
        : DataFrame =
      df(ins: _*).withColumn("_change_type", lit("insert"))
        .unionByName(df(dels: _*).withColumn("_change_type", lit("delete")))
        .withColumn("snapshot__id", lit(1L))
    val apply = GraftCdcAggregate
      .applyBatch(agg, Seq("grp"), Seq("amount" -> "sum_amount"), "r-sink") _
    apply(cdc(Seq((1L, "a", 10L), (2L, "a", 5L)), Nil), 0L)
    assert(aggState(GraftTable.load(agg.dir)) == Map("a" -> (2L, 15L)))
    // replay of epoch 0: the whole batch skips (cursor rode the commit)
    apply(cdc(Seq((9L, "a", 999L)), Nil), 0L)
    assert(aggState(GraftTable.load(agg.dir)) == Map("a" -> (2L, 15L)),
      "replayed batch re-applied")
    // next epoch: a delete retracts; group b appears and a shrinks
    apply(cdc(Seq((3L, "b", 1L)), Seq((1L, "a", 10L))), 1L)
    assert(aggState(GraftTable.load(agg.dir)) ==
      Map("a" -> (1L, 5L), "b" -> (1L, 1L)))
    // a batch that nets a group to zero tombstones its row
    apply(cdc(Nil, Seq((3L, "b", 1L))), 2L)
    assert(aggState(GraftTable.load(agg.dir)) == Map("a" -> (1L, 5L)))
  }

  test("null group keys refuse loudly; debt stays bounded under compactEvery") {
    val agg = GraftTable.create(s"$wh/db/agg_nul", aggSchema)
    val nullRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null, 2L)), 1),
      StructType(srcSchema.fields.map(_.copy(nullable = true))))
      .withColumn("_change_type", lit("insert"))
      .withColumn("snapshot__id", lit(1L))
    val e = intercept[IllegalArgumentException] {
      GraftCdcAggregate.applyBatch(agg, Seq("grp"),
        Seq("amount" -> "sum_amount"), "n-sink")(nullRow, 0L)
    }
    assert(e.getMessage.contains("null group key"), e.getMessage)
    // compactEvery = 2 bounds consolidated tombstone depth across epochs
    val apply = GraftCdcAggregate.applyBatch(agg, Seq("grp"),
      Seq("amount" -> "sum_amount"), "n-sink", compactEvery = 2) _
    (0 to 5).foreach { b =>
      val d = df((100L + b, "g", 1L))
        .withColumn("_change_type", lit("insert"))
        .withColumn("snapshot__id", lit(b.toLong))
      apply(d, b.toLong)
    }
    val t = GraftTable.load(agg.dir)
    val depth = t.equalityDeletes.map(_.covs.size).sum
    assert(depth <= 2, s"tombstone debt unbounded: depth $depth")
    assert(aggState(t) == Map("g" -> (6L, 6L)))
  }
}
