package org.apache.spark.sql.classic

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType

/** Table-relative paths of the parquet file one task wrote (empty when
  * the task saw no rows — no file is created for an empty split). */
final case class GraftFileCommitMessage(relPaths: Seq[String])
    extends WriterCommitMessage

/** DSv2 streaming sink for graft tables — `writeStream.toTable`.
  *
  * Executors write each task's rows STRAIGHT to a parquet file under
  * the table's `data/` directory (temporary `.stream-…` name, invisible
  * to readers — scans plan from the manifest, never a listing), using
  * Spark's own `ParquetWriteSupport`/`ParquetOutputWriter` machinery so
  * a streamed file is byte-compatible with a batch-written one
  * (TIMESTAMP_MICROS, same codecs, same bloom-filter options). The
  * driver's per-epoch commit hands the file list to
  * [[graft.table.GraftTable.commitStreamFiles]], which renames them to
  * canonical `part-<snapId>-…` names (era attribution + delete-coverage
  * scoping live in that name) and commits ONE append snapshot carrying
  * the sink's epoch cursor — replayed epochs after a restart delete
  * their duplicate files and commit nothing, so snapshot commits are
  * exactly-once while the transport stays at-least-once.
  *
  * A crashed task/epoch can leave `.stream-…` temporaries behind; they
  * are never referenced by any manifest and `removeOrphanFiles` (with
  * an age threshold above the epoch duration) reclaims them — the same
  * contract as batch staging directories. */
final class GraftStreamingWrite(
    dir: String,
    writeSchema: StructType,
    queryId: String,
    writerConf: Map[String, String],
    commitFiles: (Seq[String], Long) => Option[AnyRef])
    extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(dir, writeSchema, queryId, writerConf)

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val rels = messages.toSeq.collect {
      case m: GraftFileCommitMessage => m.relPaths
    }.flatten
    // empty epochs commit nothing (no empty snapshots); commitFiles
    // handles replayed epochs by deleting the duplicates itself
    if (rels.nonEmpty) commitFiles(rels, epochId): Unit
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.toSeq.collect { case m: GraftFileCommitMessage => m.relPaths }
      .flatten.foreach(r => Files.deleteIfExists(Paths.get(dir, r)))
}

private final class GraftStreamWriterFactory(
    dir: String,
    schema: StructType,
    queryId: String,
    writerConf: Map[String, String])
    extends StreamingDataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftStreamDataWriter(
      dir, schema, queryId, writerConf, partitionId, taskId, epochId)
}

/** One task's writer: rows → one parquet file (created lazily on the
  * first row; task attempts are disambiguated by taskId + a UUID, and
  * the commit coordinator ensures only one attempt's message commits —
  * a losing attempt's abort deletes its file). */
private final class GraftStreamDataWriter(
    dir: String,
    schema: StructType,
    queryId: String,
    writerConf: Map[String, String],
    partitionId: Int,
    taskId: Long,
    epochId: Long)
    extends DataWriter[InternalRow] {

  private var writer: ParquetOutputWriter = null
  private var rel: String = null

  private def ensureOpen(): Unit = if (writer == null) {
    val name = f".stream-$queryId-$epochId%05d-$partitionId%05d-$taskId-" +
      java.util.UUID.randomUUID().toString.take(8) + ".parquet"
    rel = s"data/$name"
    Files.createDirectories(Paths.get(dir, "data"))
    val conf = new Configuration()
    writerConf.foreach { case (k, v) => conf.set(k, v) }
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set("parquet.write.support.class",
      classOf[ParquetWriteSupport].getName)
    val attempt = new TaskAttemptID(
      new TaskID(new JobID(s"graft-stream-$epochId", partitionId),
        TaskType.MAP, partitionId), 0)
    val ctx = new TaskAttemptContextImpl(conf, attempt)
    writer = new ParquetOutputWriter(
      Paths.get(dir, rel).toString, ctx)
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    writer.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    GraftFileCommitMessage(Option(rel).toSeq)
  }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (rel != null) Files.deleteIfExists(Paths.get(dir, rel))
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
