package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed incremental consumption of a graft table: each [[poll]]
  * returns the rows appended since the last poll (via
  * [[GraftTable.changes]]) and advances a durable cursor, so a periodic
  * batch job processes every snapshot exactly once across restarts — the
  * snapshot-incrementality analog of a streaming source, built on the
  * append-only manifest diff (O(new files) per poll).
  *
  * The cursor is committed AFTER the caller's batch function succeeds
  * (at-least-once on failure, exactly-once when the batch is idempotent —
  * the same contract as foreachBatch sinks).
  */
final class GraftChangeFeed(table: GraftTable, checkpointDir: String) {

  private val cursorPath = Paths.get(checkpointDir, "graft-feed-cursor")

  /** Last fully-processed snapshot id; 0 = nothing processed. */
  def cursor: Long =
    if (Files.exists(cursorPath)) Files.readString(cursorPath).trim.toLong
    else 0L

  private def commitCursor(id: Long): Unit =
    graft.util.Json.writeFileAtomic(cursorPath.toString, id.toString)

  /** Drop the cursor: the next poll reseeds from the full current state.
    * The recovery path for a cursor orphaned by snapshot expiration. */
  def reset(): Unit = Files.deleteIfExists(cursorPath)

  private def guardCursor(from: Long): Unit =
    if (from != 0L && table.log.byId(from).isEmpty)
      throw new IllegalStateException(
        s"feed cursor $from points at an EXPIRED snapshot of " +
          s"${table.dir} — retention outran this consumer. reset() the " +
          "feed and reprocess the seed poll (idempotent sinks) or " +
          "re-seed the downstream state")

  /** Process everything new since the cursor with `batch`, then advance
    * the cursor. Returns the snapshot range processed, or None when
    * already caught up. */
  def poll(spark: SparkSession)(batch: DataFrame => Unit): Option[(Long, Long)] = {
    val current = table.log.current.map(_.snapshotId).getOrElse(0L)
    val from = cursor
    if (current <= from) return None
    guardCursor(from)
    val df =
      if (from == 0L) table.read(spark, Some(current))
      else table.changes(spark, from, Some(current))
    batch(df)
    commitCursor(current)
    Some((from, current))
  }

  /** CDC variant of [[poll]]: the batch receives [[GraftTable.changesCdc]]
    * rows (`_change_type` insert|delete) instead of the additive feed —
    * the consumption mode for downstream state that must APPLY deletions
    * (mirror tables, search indexes, feature stores). The first poll
    * seeds with the full current state as inserts. A rollback in the
    * window makes changesCdc throw BEFORE the cursor advances, so a
    * consumer can re-seed and resume — no change is silently skipped. */
  def pollCdc(spark: SparkSession)(batch: DataFrame => Unit): Option[(Long, Long)] =
    pollCdc(spark, lineage = false)(batch)

  /** [[pollCdc]] with optional ROW-LINEAGE columns: every batch row
    * additionally carries `_row_id`/`_last_updated_snapshot_id`
    * (changesCdc's lineage form — requires `graft.row-lineage = true`
    * on the source), so batch consumers key updates on stable row
    * identity. Column order: (schema, _change_type, vc, _row_id, _seq). */
  def pollCdc(spark: SparkSession, lineage: Boolean)(
      batch: DataFrame => Unit): Option[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, lit}
    val current = table.log.current.map(_.snapshotId).getOrElse(0L)
    val from = cursor
    if (current <= from) return None
    guardCursor(from)
    val vc = table.virtualColumn
    val df =
      if (from == 0L && !lineage)
        // seed with the full state; column ORDER must match changesCdc's
        // (schema, _change_type, virtual col) — positional consumers
        // (insertInto, union) would otherwise swap columns on poll 2
        table.read(spark, Some(current)).drop(vc)
          .withColumn("_change_type", lit("insert"))
          .withColumn(vc, lit(current))
      else if (from == 0L)
        table.readLineage(spark, Some(current))
          .withColumn("_change_type", lit("insert"))
          .withColumn(vc, lit(current))
          .select((table.schema.fieldNames.toSeq ++
            Seq("_change_type", vc, GraftTable.RowIdCol,
              GraftTable.LastUpdatedCol)).map(col): _*)
      else table.changesCdc(spark, from, Some(current), lineage = lineage)
    batch(df)
    commitCursor(current)
    Some((from, current))
  }
}
