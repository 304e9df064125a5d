package org.apache.spark.sql.classic

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.StructType

import graft.table.{GraftTable, SnapshotDiffs}

/** CDC-mode streaming read of a graft table —
  * `spark.readStream.table("cat.db.t__changes")`.
  *
  * The snapshot-incremental stream ([[GraftMicroBatchStream]]) refuses
  * the moment anyone runs UPDATE/DELETE/MERGE on the table — correct for
  * an additive stream, but it means no continuous pipeline survives the
  * engine's own DML surface. This source emits the RETRACTION-carrying
  * diff instead: each micro-batch is [[graft.table.GraftTable.changesCdc]]
  * over the snapshots in `(start, end]` — the table's rows plus a
  * `_change_type` column (`insert` | `delete`, Delta-CDF style) and the
  * snapshot id that produced each change — so a downstream mirror, search
  * index, or feature store can APPLY deletions instead of dying on them.
  * A first batch from offset 0 seeds with the full state as inserts (the
  * [[graft.table.GraftChangeFeed.pollCdc]] contract); `starting-snapshot-id`
  * skips the seed and tails changes only.
  *
  * Execution model: `planInputPartitions` runs the CDC diff as a normal
  * DISTRIBUTED Spark job and materializes the delta as parquet under the
  * stream's own checkpoint directory (`graft-cdc-spill/cdc-<from>-<to>`),
  * then plans the same delegate parquet scan every graft read uses over
  * the spilled files. O(changed data) written + read per trigger — the
  * changelog-materialization shape CDC systems use — never a driver-side
  * row path, and idempotent across restarts (a replayed epoch finds its
  * `_SUCCESS`-marked spill and re-plans it without recomputing; `commit`
  * reclaims spills the engine will never request again).
  *
  * Pacing shares the snapshot-id offset + admission-control design of the
  * append stream; a snapshot's cost is estimated from its manifest diff
  * (added + removed file sizes — an upper bound of the CDC rows a
  * copy-on-write rewrite nets out to). Rollback snapshots and expired
  * parents refuse loudly at plan time via `changesCdc`'s own guards —
  * a CDC consumer must re-seed, never silently skip. */
final class GraftCdcMicroBatchStream(
    dir: String,
    startAfter: Long,
    checkpointLocation: String,
    declaredSchema: StructType,
    mkDelegate: Seq[String] => Scan,
    maxFilesPerTrigger: Option[Int] = None,
    maxRowsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val spillRoot: java.nio.file.Path = Paths.get(
    new org.apache.hadoop.fs.Path(checkpointLocation).toUri.getPath,
    "graft-cdc-spill")

  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(GraftTable.load(dir).log.current
      .map(_.snapshotId).getOrElse(startAfter))

  override def initialOffset(): Offset = GraftStreamOffset(startAfter)

  override def latestOffset(): Offset =
    GraftStreamOffset(GraftTable.load(dir).log.current
      .map(_.snapshotId).getOrElse(startAfter))

  override def getDefaultReadLimit: ReadLimit =
    GraftReadLimits.defaultLimit(
      maxFilesPerTrigger, maxRowsPerTrigger, maxBytesPerTrigger)

  /** Per-snapshot (files, rows, bytes) cost memo — a trigger prices the
    * chain during pacing and a restart re-prices the replayed range;
    * snapshots are immutable so an entry never goes stale. */
  private val costMemo =
    new java.util.LinkedHashMap[Long, (Long, Long, Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, (Long, Long, Long)]): Boolean =
        size() > 256
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].snapshotId
    val lg = GraftTable.load(dir).log
    val live = lg.snapshots.lastOption.map(_.snapshotId).getOrElse(from)
    val latest = availableNowEnd.fold(live)(math.min(live, _))
    if (latest <= from) return GraftStreamOffset(from)
    val (maxF, maxR, maxB) = GraftReadLimits.caps(limit)
    if (maxF.isEmpty && maxR.isEmpty && maxB.isEmpty)
      return GraftStreamOffset(latest)
    val chain = lg.snapshots
      .filter(s => s.snapshotId > from && s.snapshotId <= latest)
    val memoized = costMemo.synchronized {
      chain.takeWhile(s => costMemo.containsKey(s.snapshotId))
        .map(s => (s.snapshotId, costMemo.get(s.snapshotId)))
    }
    val rest = chain.drop(memoized.size)
    // lenient on expired parents: pricing is an ESTIMATE — a from-0 seed
    // never computes real diffs (it materializes full state), so pacing
    // must not die where planning succeeds; a from>0 range with an
    // expired parent still refuses properly at plan time via changesCdc
    val priced: Iterator[(Long, (Long, Long, Long))] =
      memoized.iterator ++ SnapshotDiffs.alongChain(dir, lg, rest,
        lenientMissingParent = true).map { d =>
        // a replace (compaction) contributes nothing to the CDC feed;
        // everything else is priced by its manifest diff — an upper
        // bound on the emitted rows (copy-on-write nets unchanged rows
        // out), which is the conservative direction for pacing
        val touched =
          if (d.snapshot.operation == "replace") Nil
          else d.added ++ d.removed
        val cost = (touched.size.toLong,
          touched.map(_.recordCount).sum, touched.map(_.fileSizeBytes).sum)
        costMemo.synchronized {
          costMemo.put(d.snapshot.snapshotId, cost): Unit
        }
        (d.snapshot.snapshotId, cost)
      }
    var files = 0L; var rows = 0L; var bytes = 0L
    var end = from
    for ((sid, (f, r, b)) <- priced) {
      val overflow = end > from &&
        (maxF.exists(m => files + f > m) ||
          maxR.exists(m => rows + r > m) ||
          maxB.exists(m => bytes + b > m))
      if (overflow) return GraftStreamOffset(end)
      files += f; rows += r; bytes += b
      end = sid
    }
    GraftStreamOffset(end)
  }

  override def reportLatestOffset(): Offset =
    availableNowEnd.map(GraftStreamOffset(_)).getOrElse(latestOffset())

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftStreamOffset].snapshotId
    val to = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (to <= from) return Array.empty
    val spill = spillRoot.resolve(s"cdc-$from-$to")
    if (!Files.exists(spill.resolve("_SUCCESS"))) {
      val spark = org.apache.spark.sql.SparkSession.active
      val t = GraftTable.load(dir)
      // mid-stream schema evolution: the stream's fixed schema would
      // read renamed/retyped columns wrong — refuse loudly; the
      // restarted query re-resolves the current schema
      require(t.schema == declaredSchema,
        s"$dir's schema evolved while the CDC stream was running — " +
          "restart the streaming query to pick up the new schema")
      val vc = t.virtualColumn
      val df =
        if (from == 0L)
          // seed batch: the full state at the admitted end, as inserts —
          // column ORDER matches changesCdc's (schema, _change_type, vc)
          t.read(spark, Some(to)).drop(vc)
            .withColumn("_change_type", lit("insert"))
            .withColumn(vc, lit(to))
        else t.changesCdc(spark, from, Some(to))
      // pin micros like every graft write path — an INT96 spill would
      // round-trip fine but diverge from the table's own file format
      val tsKey = "spark.sql.parquet.outputTimestampType"
      val prevTs = spark.conf.getOption(tsKey)
      spark.conf.set(tsKey, "TIMESTAMP_MICROS")
      try df.write.mode("overwrite").parquet(spill.toString)
      finally prevTs match {
        case Some(v) => spark.conf.set(tsKey, v)
        case None => spark.conf.unset(tsKey)
      }
    }
    val paths = scala.util.Using.resource(Files.list(spill)) { s =>
      s.iterator().asScala.map(_.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
    }
    if (paths.isEmpty) Array.empty
    else mkDelegate(paths).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    mkDelegate(Nil).toBatch.createReaderFactory()

  /** Committed ranges are never requested again — reclaim their spills
    * (the replayed-after-restart batch is precisely the one whose range
    * was NOT committed, so its spill survives for reuse). */
  override def commit(end: Offset): Unit = {
    val upTo = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (!Files.isDirectory(spillRoot)) return
    val done = scala.util.Using.resource(Files.list(spillRoot)) { s =>
      s.iterator().asScala.filter { p =>
        p.getFileName.toString.split("-") match {
          case Array("cdc", _, b) => b.toLongOption.exists(_ <= upTo)
          case _ => false
        }
      }.toSeq
    }
    done.foreach { p =>
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
    }
  }

  override def stop(): Unit = ()
}
