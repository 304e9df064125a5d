package org.apache.spark.sql.classic

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}

import graft.table.{DataFileEntry, GraftTable, Manifest, Snapshot, SnapshotLog}

/** Snapshot id as a streaming offset — the natural cursor of an
  * append-only table log (monotone, durable, replayable). */
final case class GraftStreamOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

/** Snapshot-incremental streaming read of a graft table —
  * `spark.readStream.table("cat.db.t")`.
  *
  * Each micro-batch is the set of data files APPENDED by the snapshots
  * in `(start, end]`, discovered by manifest path diff: O(new files)
  * metadata per trigger, never a directory listing, never a re-read of
  * old data — the property that makes a 100 TB table streamable (the
  * same diff [[graft.table.GraftTable.changes]] serves to batch
  * consumers; this is its Structured Streaming face, with offsets
  * checkpointed by the engine for exactly-once sinks).
  *
  * Planning and reading ride the SAME delegate parquet machinery as
  * batch scans (`mkDelegate` — bin-packed splits, vectorized reader),
  * so a streaming row is byte-identical to a batch row.
  *
  * Row-preserving `"replace"` snapshots (compaction, manifest
  * rewrites) are SKIPPED — table maintenance never kills a tail.
  * Everything else refuses loudly, never silent re-emission:
  *  - a rewriting/removing snapshot in range (update/delete/merge/
  *    overwrite/rollback — an additive stream cannot represent them;
  *    consume [[graft.table.GraftTable.changesCdc]] instead);
  *  - a chain snapshot whose parent has been EXPIRED (the diff is
  *    uncomputable — re-emitting the whole file set would duplicate);
  *  - a file predating a column rename/widening (the fixed stream
  *    schema would read it wrong);
  *  - non-parquet entries (this surface feeds the parquet reader).
  *
  * `starting-snapshot-id` (read option) starts the stream AFTER that
  * snapshot — skip the backfill and tail only new commits.
  */
final class GraftMicroBatchStream(
    dir: String,
    startAfter: Long,
    mkDelegate: Seq[String] => Scan,
    // rename/widening-era check, fresh-table-aware (the visibility of
    // the era machinery is table-package-scoped; the catalog closes
    // over it here)
    renameAffects: (GraftTable, DataFileEntry) => Boolean,
    maxFilesPerTrigger: Option[Int] = None,
    maxRowsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** End offset frozen at AvailableNow start: the drain processes up to
    * HERE (in read-limit-paced batches) and terminates, even while
    * writers keep committing. Implementing the trait (rather than
    * letting the engine's wrapper handle it) is what keeps
    * max-files/rows-per-trigger honored during the drain — the wrapper
    * deliberately discards delegate read limits. */
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(GraftTable.load(dir).log.current
      .map(_.snapshotId).getOrElse(startAfter))

  override def initialOffset(): Offset = GraftStreamOffset(startAfter)

  override def latestOffset(): Offset =
    // stateless: re-read the log every trigger, same discipline as the
    // per-query re-resolution the batch surfaces follow
    GraftStreamOffset(GraftTable.load(dir).log.current
      .map(_.snapshotId).getOrElse(startAfter))

  /** Admission control — the 100 TB backfill guard. Without a cap the
    * FIRST trigger of a new stream is the entire table in one
    * micro-batch; `max-files-per-trigger` / `max-rows-per-trigger`
    * admit whole snapshots until the next one would exceed the cap
    * (always at least one, so the stream makes progress). The manifest
    * already carries per-file record counts, so the row cap costs no
    * file I/O to enforce. */
  override def getDefaultReadLimit: ReadLimit = {
    val lims: Seq[ReadLimit] =
      maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
        maxRowsPerTrigger.map(ReadLimit.maxRows).toSeq ++
        maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    lims match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  private def capsOf(limit: ReadLimit)
      : (Option[Int], Option[Long], Option[Long]) =
    limit match {
      case _: ReadAllAvailable => (None, None, None)
      case f: ReadMaxFiles => (Some(f.maxFiles()), None, None)
      case r: ReadMaxRows => (None, Some(r.maxRows()), None)
      case b: ReadMaxBytes => (None, None, Some(b.maxBytes()))
      case c: CompositeReadLimit =>
        val parts = c.getReadLimits.toSeq.map(capsOf)
        (parts.flatMap(_._1).minOption, parts.flatMap(_._2).minOption,
          parts.flatMap(_._3).minOption)
      case _ => (None, None, None) // unknown limit kinds admit everything
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].snapshotId
    val lg = GraftTable.load(dir).log
    val live = lg.snapshots.lastOption.map(_.snapshotId).getOrElse(from)
    // under AvailableNow the drain never reads past the frozen end
    val latest = availableNowEnd.fold(live)(math.min(live, _))
    if (latest <= from) return GraftStreamOffset(from)
    val (maxF, maxR, maxB) = capsOf(limit)
    if (maxF.isEmpty && maxR.isEmpty && maxB.isEmpty)
      return GraftStreamOffset(latest)
    var files = 0L
    var rows = 0L
    var bytes = 0L
    var end = from
    for (s <- lg.snapshots
        if s.snapshotId > from && s.snapshotId <= latest) {
      // non-append snapshots count as empty here; replaces skip and the
      // rest still refuse loudly at plan time (never silently dropped)
      val added = if (s.operation == "append") appendedBy(lg, s) else Nil
      val overflow = end > from &&
        (maxF.exists(m => files + added.size > m) ||
          maxR.exists(m => rows + added.map(_.recordCount).sum > m) ||
          maxB.exists(m => bytes + added.map(_.fileSizeBytes).sum > m))
      if (overflow) return GraftStreamOffset(end)
      files += added.size
      rows += added.map(_.recordCount).sum
      bytes += added.map(_.fileSizeBytes).sum
      end = s.snapshotId
    }
    GraftStreamOffset(end)
  }

  override def reportLatestOffset(): Offset =
    availableNowEnd.map(GraftStreamOffset(_)).getOrElse(latestOffset())

  /** Files snapshot `s` appended, by manifest path diff with its parent
    * (throws when the parent has been expired — the diff would silently
    * re-emit the whole file set otherwise). */
  private def appendedBy(lg: SnapshotLog, s: Snapshot): Seq[DataFileEntry] = {
    val parentPaths = s.parentId match {
      case None => Set.empty[String]
      case Some(pid) => lg.byId(pid) match {
        case Some(p) =>
          Manifest.read(s"$dir/${p.manifestList}").files.map(_.path).toSet
        case None => throw new IllegalStateException(
          s"snapshot ${s.snapshotId}'s parent $pid is missing from the " +
            s"log of $dir (expired?) — its incremental diff cannot be " +
            "computed; restart the stream from a live snapshot")
      }
    }
    Manifest.read(s"$dir/${s.manifestList}").files
      .filterNot(f => parentPaths.contains(f.path))
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftStreamOffset].snapshotId
    val to = end.asInstanceOf[GraftStreamOffset].snapshotId
    if (to <= from) return Array.empty
    val t = GraftTable.load(dir)
    val lg = t.log
    val chain = lg.snapshots
      .filter(s => s.snapshotId > from && s.snapshotId <= to)
    // "replace" (compaction / manifest rewrite) is row-preserving by
    // construction and contributes NOTHING to an additive stream — a
    // compaction must not kill a long-running tail. The one replace
    // that is not bit-identical (materializing pending merge-on-read
    // state) is always preceded by the delete/merge commit that CREATED
    // the pending state, and that commit is refused below before the
    // replace is ever reached.
    chain.foreach(s => require(
      s.operation == "append" || s.operation == "replace",
      s"streaming read of $dir hit snapshot ${s.snapshotId} " +
        s"(op=${s.operation}): an additive stream can only represent " +
        "append commits — consume the CDC feed " +
        "(GraftTable.changesCdc / GraftChangeFeed.pollCdc) for a " +
        "history with rewrites or deletes"))
    val appended = chain.filter(_.operation == "append")
      .flatMap(s => appendedBy(lg, s))
    appended.foreach { f =>
      require(!renameAffects(t, f),
        s"$dir file ${f.path} predates a column rename/widening — the " +
          "stream's fixed schema would mis-read it; compact() first")
      require(f.path.endsWith(".parquet"),
        s"$dir holds non-parquet data file ${f.path} — the streaming " +
          "surface feeds the parquet reader; read via GraftTable.scan")
    }
    if (appended.isEmpty) Array.empty
    else {
      val paths = appended.map(f =>
        java.nio.file.Paths.get(dir, f.path).normalize().toString)
      mkDelegate(paths).toBatch.planInputPartitions()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // path-agnostic: the delegate factory reads whatever FilePartition
    // it is handed, so one factory serves every micro-batch
    mkDelegate(Nil).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = () // engine checkpoints offsets
  override def stop(): Unit = ()
}
