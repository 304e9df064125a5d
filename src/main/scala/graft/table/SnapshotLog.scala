package graft.table

import java.nio.file.{Files, Paths}
import graft.util.Json

/** One committed snapshot. Field set mirrors the reference's snapshots
  * system-table row (SnapshotIterable.createSnapshotRecord,
  * iterables/SnapshotIterable.java:48-57): committed_at, snapshot_id,
  * parent_id, operation, manifest_list, summary.
  */
final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    committedAt: Long,
    operation: String,
    manifestList: String, // relative path of the manifest under the table dir
    summary: Map[String, String])

/** The append-only snapshot log (`snapshots.json` at the table root).
  * Metadata is tiny (one entry per commit), so rewriting the whole file per
  * commit is fine at any data scale — data volume lives in parquet, not here.
  */
final case class SnapshotLog(snapshots: Seq[Snapshot]) {

  def current: Option[Snapshot] = snapshots.lastOption

  def byId(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)

  def nextId: Long = snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1

  def write(absPath: String): Unit = {
    val arr = snapshots.map { s =>
      Map(
        "snapshot_id" -> s.snapshotId,
        "parent_id" -> s.parentId.map(Long.box).orNull,
        "committed_at" -> s.committedAt,
        "operation" -> s.operation,
        "manifest_list" -> s.manifestList,
        "summary" -> s.summary)
    }
    Json.writeFileAtomic(absPath, Json.write(arr))
  }
}

object SnapshotLog {
  val empty: SnapshotLog = SnapshotLog(Seq.empty)

  def read(absPath: String): SnapshotLog = {
    val p = Paths.get(absPath)
    if (!Files.exists(p)) return empty
    val arr = Json.parse(Files.readString(p)).asInstanceOf[Seq[Any]]
    SnapshotLog(arr.map { e =>
      val m = e.asInstanceOf[Map[String, Any]]
      Snapshot(
        m("snapshot_id").asInstanceOf[Long],
        Option(m.getOrElse("parent_id", null)).map(_.asInstanceOf[Long]),
        m("committed_at").asInstanceOf[Long],
        m("operation").asInstanceOf[String],
        m("manifest_list").asInstanceOf[String],
        m.getOrElse("summary", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString })
    })
  }
}
