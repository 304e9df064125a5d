package graft.table

/** File-set diffs along a snapshot chain, parsing each manifest list
  * ONCE.
  *
  * The naive spelling — `Manifest.read(parent)` + `Manifest.read(s)` per
  * chain snapshot — costs 2N list parses for a stream resuming after N
  * commits. Along a contiguous chain the parent of snapshot i IS
  * snapshot i-1, whose file list the walker just materialized, so the
  * whole catch-up costs N+1 parses (the first snapshot's parent plus one
  * per chain member). Streaming sources re-walk per trigger; callers
  * that walk twice per trigger (offset pacing, then planning) memoize
  * the per-snapshot diffs on top — snapshots are immutable, so a diff
  * keyed by snapshot id never goes stale.
  */
object SnapshotDiffs {

  /** One chain member's delta: the files it added and removed relative
    * to its parent. */
  final case class Diff(
      snapshot: Snapshot,
      added: Seq[DataFileEntry],
      removed: Seq[DataFileEntry])

  /** Diffs for every snapshot in `chain` (ascending log order), lazily —
    * callers that stop early (admission-control pacing) never parse the
    * rest of the chain. An EXPIRED parent throws by default (the diff is
    * uncomputable, and re-emitting the whole file set would silently
    * duplicate downstream state); `lenientMissingParent` treats it as an
    * empty parent instead — the whole manifest reads as "added", the
    * conservative UPPER BOUND a pacing estimate wants (a from-0 CDC seed
    * never computes real diffs, so pricing must not die where planning
    * would succeed). Planning paths must NEVER pass lenient. */
  def alongChain(
      dir: String,
      lg: SnapshotLog,
      chain: Seq[Snapshot],
      lenientMissingParent: Boolean = false): Iterator[Diff] = {
    var prevId: Option[Long] = None
    var prevFiles: Seq[DataFileEntry] = Nil
    chain.iterator.map { s =>
      val parentFiles: Seq[DataFileEntry] = s.parentId match {
        case None => Nil
        case pid if pid == prevId => prevFiles
        case Some(p) => lg.byId(p) match {
          case Some(ps) => Manifest.read(s"$dir/${ps.manifestList}").files
          case None if lenientMissingParent => Nil
          case None => throw new IllegalStateException(
            s"snapshot ${s.snapshotId}'s parent $p is missing from the " +
              s"log of $dir (expired?) — its incremental diff cannot be " +
              "computed; restart the stream from a live snapshot")
        }
      }
      val cur = Manifest.read(s"$dir/${s.manifestList}").files
      val parentPaths = parentFiles.map(_.path).toSet
      val curPaths = cur.map(_.path).toSet
      prevId = Some(s.snapshotId)
      prevFiles = cur
      Diff(s,
        added = cur.filterNot(f => parentPaths.contains(f.path)),
        removed = parentFiles.filterNot(f => curPaths.contains(f.path)))
    }
  }
}
