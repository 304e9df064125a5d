package graft.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** Continuous CDC replication: keep a MIRROR graft table equal to a
  * source table through the `__changes` stream — the one-call form of
  * the replication loop v49 spells out (and [[GraftChangeFeed.pollCdc]]
  * runs in batch):
  *
  * {{{
  *   val q = GraftCdcMirror
  *     .into(spark, "cat.db.src", mirror, Seq("id"), sinkId = "mirror-v1")
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  *
  * `sinkId` names this (checkpoint, mirror) pairing and MUST change
  * whenever the checkpoint does (the [[GraftTable.appendStreamBatch]]
  * contract: batch ids are only unique within one checkpoint — reusing
  * a sinkId against a fresh checkpoint would make the restarted batch 0
  * look already-applied and silently stop replication). Re-seeding after
  * source-history expiration = fresh checkpoint + fresh (or truncated)
  * mirror + fresh sinkId.
  *
  * Each micro-batch applies retract-then-insert: the batch's `delete`
  * rows become ONE equality merge-on-read tombstone commit (O(changed
  * keys), `exactCount = false` — no per-batch count job, the
  * high-frequency-apply spelling) and its `insert` rows ONE append.
  * The append carries the sink's epoch cursor
  * ([[GraftTable.appendStreamBatch]]), and a batch whose cursor is
  * already recorded is skipped WHOLE — so the at-least-once foreachBatch
  * replay after a restart can neither double-insert nor re-retract rows
  * it already superseded: exactly-once mirror state. (A crash between
  * the tombstone and the append replays both; re-deleting keys whose
  * copies are already gone is a no-op, and the append then lands once.)
  *
  * The mirror must be a dedicated replica (no other writers): its
  * snapshot history is this stream's apply log. Scale shape: per batch,
  * O(changed keys) metadata + O(inserted rows) data — never a mirror
  * rewrite, at any table size.
  *
  * ROW-ID KEYED mirrors (Iceberg v3 changelog identity): when the
  * source carries `graft.row-lineage = true`, its `__changes` stream
  * serves `_row_id`/`_last_updated_snapshot_id` on every change row —
  * key the mirror on the SOURCE's stable row identity instead of a
  * natural key by materializing it as a mirror column and applying
  * through [[applyBatch]] with a pre-transform:
  *
  * {{{
  *   // mirror schema = source fields + ("src_row_id" BIGINT)
  *   .foreachBatch { (b: DataFrame, id: Long) =>
  *     GraftCdcMirror.applyBatch(mirror, Seq("src_row_id"), sinkId)(
  *       b.withColumn("src_row_id", col(GraftTable.RowIdCol)), id)
  *   }
  * }}}
  *
  * An upstream CoW UPDATE then nets to (same src_row_id, new values) —
  * one tombstone + one insert on exactly that row — with no assumption
  * that any data column is unique.
  */
object GraftCdcMirror {

  /** Apply ONE CDC micro-batch to `mirror`, exactly-once per
    * (sinkId, batchId). Public so replay safety is testable and so
    * custom pipelines (extra transforms before the apply) can reuse the
    * contract.
    *
    * `compactEvery` bounds the merge-on-read DEBT a long-running mirror
    * accumulates: each batch's tombstone keys CONSOLIDATE into one
    * entry per key-column set (reads pay one anti-join however deep the
    * stacking), but the consolidated key relation itself still grows
    * with every batch — so the threshold counts stacking DEPTH (folded
    * commits per entry) and MATERIALIZES once it's reached (one
    * compact() before the batch applies — amortized
    * O(mirror)/`compactEvery`, and the compaction is a row-preserving
    * replace, so mirror readers and mirror-of-mirror streams are
    * undisturbed). */
  def applyBatch(
      mirror: GraftTable, keyCols: Seq[String], sinkId: String,
      compactEvery: Int = 64)(
      batch: DataFrame, batchId: Long): Unit = {
    // replayed epoch (crash AFTER the full apply): skip the whole batch
    // — re-running the tombstone would kill the already-applied inserts
    if (mirror.streamCursors.get(sinkId).exists(_ >= batchId)) return
    val debtDepth = mirror.equalityDeletes.map(_.covs.size).sum
    if (compactEvery > 0 && debtDepth >= compactEvery)
      mirror.compact(batch.sparkSession,
        smallerThanBytes = Long.MaxValue): Unit
    val cols = mirror.schema.fieldNames.map(col).toSeq
    val dels = batch.filter(col("_change_type") === "delete")
      .select(keyCols.map(col): _*)
    if (!dels.isEmpty)
      mirror.deleteEquality(batch.sparkSession, dels, keyCols,
        exactCount = false): Unit
    // ALWAYS commit the insert half (even empty) — it carries the epoch
    // cursor that makes the apply idempotent across restarts
    mirror.appendStreamBatch(
      batch.filter(col("_change_type") === "insert").select(cols: _*),
      sinkId, batchId): Unit
  }

  /** Streaming writer mirroring `sourceTable` (a catalog-qualified graft
    * table name; the `__changes` suffix is appended if absent) into
    * `mirror`, keyed by `keyCols`. Caller sets checkpointLocation (+
    * trigger) and `start()`s; `readOptions` pass through to the CDC
    * source (`starting-snapshot-id`, per-trigger caps). */
  def into(
      spark: SparkSession,
      sourceTable: String,
      mirror: GraftTable,
      keyCols: Seq[String],
      sinkId: String,
      readOptions: Map[String, String] = Map.empty,
      compactEvery: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(sinkId.nonEmpty, "sinkId must be non-empty")
    keyCols.foreach(c => require(mirror.schema.fieldNames.contains(c),
      s"key column '$c' is not in the mirror schema"))
    val changes =
      if (sourceTable.endsWith("__changes")) sourceTable
      else s"${sourceTable}__changes"
    var reader = spark.readStream
    readOptions.foreach { case (k, v) => reader = reader.option(k, v) }
    reader.table(changes)
      .writeStream
      .foreachBatch(applyBatch(mirror, keyCols, sinkId, compactEvery) _)
  }
}
