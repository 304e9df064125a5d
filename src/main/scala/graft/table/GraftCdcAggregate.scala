package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** RETRACTION-AWARE streaming aggregation over a table's `__changes`
  * CDC stream: maintain a grouped COUNT/SUM aggregate TABLE that stays
  * equal to a full recompute of the source — through UPDATE, DELETE and
  * MERGE upstream, not just appends — without ever rereading the source.
  *
  * Each micro-batch is the source's per-snapshot retraction feed
  * (`_change_type` insert|delete). Inserts add to a group, deletes
  * subtract (COUNT and SUM are subtractable — MIN/MAX are not and are
  * deliberately out of scope; recompute those), so the per-batch work is
  *
  *   delta  = batch grouped by the keys (±1 per row, ±value per sum col)
  *   merged = aggregate-table state for the delta's keys + delta
  *
  * applied as ONE atomic [[GraftTable.mergeEquality]] commit: updated
  * group rows upsert, groups whose count drops to zero tombstone
  * ([[GraftTable.mergeEquality]]'s `deleteKeys`), and the (sinkId,
  * batchId) cursor rides the SAME commit — a foreachBatch replay after a
  * crash skips whole, so the aggregate is exactly-once by construction
  * (the [[GraftCdcMirror]] discipline, single-commit because a
  * re-applied delta would double-count where a re-applied mirror row
  * would not).
  *
  * Scale shape: per batch this reads O(aggregate state) — group counts,
  * not source rows — and writes O(affected groups). The source is never
  * rescanned; a 100 TB corpus with a 10k-group aggregate costs 10k rows
  * per trigger. Merge-on-read debt is bounded like the mirror's
  * (`compactEvery` folds the consolidated tombstone once its depth
  * reaches the threshold; the compaction is a row-preserving replace).
  *
  * The aggregate table's schema must be exactly
  * `keyCols ++ (cnt LONG) ++ sumCols.map(_._2)` (any numeric types for
  * the sums; values cast to the destination column's type). NULL group
  * keys refuse loudly — [[GraftTable.mergeEquality]] cannot address a
  * null-key row for replacement (SQL join semantics), so a null group
  * would silently duplicate instead of update. */
object GraftCdcAggregate {

  /** Fold ONE CDC micro-batch into `aggTable`, exactly-once per
    * (sinkId, batchId). `sumCols` maps source column → aggregate-table
    * sum column. Public so replay safety is testable and custom
    * pipelines can reuse the contract. */
  def applyBatch(
      aggTable: GraftTable,
      keyCols: Seq[String],
      sumCols: Seq[(String, String)],
      sinkId: String,
      compactEvery: Int = 64)(
      batch: DataFrame, batchId: Long): Unit = {
    require(keyCols.nonEmpty, "at least one group key column required")
    require(sinkId.nonEmpty, "sinkId must be non-empty")
    val expected = (keyCols :+ "cnt") ++ sumCols.map(_._2)
    require(aggTable.schema.fieldNames.toSeq == expected,
      s"aggregate table schema [${aggTable.schema.fieldNames.mkString(",")}]" +
        s" must be [${expected.mkString(",")}]")
    if (aggTable.streamCursors.get(sinkId).exists(_ >= batchId)) return
    val spark = batch.sparkSession
    // bootstrap: the CDC seed batch may be the very first thing this
    // table sees — mergeEquality needs an initial snapshot to scope to
    if (aggTable.log.current.isEmpty)
      aggTable.append(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], aggTable.schema)): Unit
    val debtDepth = aggTable.equalityDeletes.map(_.covs.size).sum
    if (compactEvery > 0 && debtDepth >= compactEvery)
      aggTable.compact(spark, smallerThanBytes = Long.MaxValue): Unit

    val signed = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val dAggs = (sum(signed).as("__dcnt") +: sumCols.map { case (src, dst) =>
      val t = aggTable.schema(dst).dataType
      sum(signed.cast(t) * coalesce(col(src).cast(t), lit(0).cast(t)))
        .as(s"__d_$dst")
    }).toSeq
    // persist the O(groups) delta: downstream it feeds the null check,
    // the state join, the upsert write and the tombstone keys — inside
    // foreachBatch each action would otherwise RE-READ the batch source,
    // and the seed batch is the whole table (narrow rows, cheap cache —
    // the repo's cached-row-width rule)
    val delta = batch.groupBy(keyCols.map(col): _*)
      .agg(dAggs.head, dAggs.tail: _*)
      .persist()
    try {
      // a NULL group cannot be replaced by key later — refuse up front
      // (checked on the cached delta; never a second source-scale scan)
      require(delta.filter(keyCols.map(col(_).isNull).reduce(_ || _)).isEmpty,
        s"null group key in the CDC batch — ${aggTable.dir} cannot " +
          "maintain a null group (key-addressed replacement); filter or " +
          "coalesce the key upstream")

      val state = aggTable.read(spark)
        .select(aggTable.schema.fieldNames.map(col): _*)
      val joined = delta.join(state, keyCols, "left_outer")
      val newCnt = coalesce(col("cnt"), lit(0L)) + col("__dcnt")
      val merged = joined.select(
        (keyCols.map(col) :+ newCnt.as("cnt")) ++ sumCols.map { case (_, dst) =>
          val t = aggTable.schema(dst).dataType
          (coalesce(col(dst), lit(0).cast(t)) + col(s"__d_$dst"))
            .cast(t).as(dst)
        }: _*)
      val upserts = merged.filter(col("cnt") > 0L)
      val dead = merged.filter(col("cnt") <= 0L).select(keyCols.map(col): _*)
      aggTable.mergeEquality(spark, upserts, keyCols,
        exactCount = false, deleteKeys = Some(dead),
        cursor = Some(sinkId -> batchId)): Unit
    } finally delta.unpersist()
  }

  /** Streaming writer maintaining `aggTable` as the grouped aggregate of
    * `sourceTable` (a catalog-qualified graft table; `__changes` is
    * appended if absent). Caller sets checkpointLocation (+ trigger) and
    * `start()`s; `readOptions` pass through to the CDC source. */
  def into(
      spark: org.apache.spark.sql.SparkSession,
      sourceTable: String,
      aggTable: GraftTable,
      keyCols: Seq[String],
      sumCols: Seq[(String, String)],
      sinkId: String,
      readOptions: Map[String, String] = Map.empty,
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    val changes =
      if (sourceTable.endsWith("__changes")) sourceTable
      else s"${sourceTable}__changes"
    var reader = spark.readStream
    readOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.table(changes)
      .writeStream
      .foreachBatch(
        applyBatch(aggTable, keyCols, sumCols, sinkId, compactEvery) _)
  }
}
