package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils

/** Catalyst leaf standing for "a scan of the graft table at `dir`, snapshot
  * chosen per query" — the piece that makes SQL time travel work the way
  * the reference's storage handler does (IcebergInputFormat.java:284-299):
  * the `snapshot__id = <id>` conjunct of THIS query's predicate picks the
  * snapshot, and the choice never outlives the query (statelessness
  * regression guarded by TestPredicatePushdown.java:74-112).
  *
  * A temp view registered over a plain DataFrame would be pinned to the
  * snapshot current at registration time; this leaf defers snapshot
  * resolution to [[ResolveGraftScan]] at optimization time, after Catalyst
  * has pushed the query's filters down next to the leaf.
  */
final case class GraftRelation(dir: String, output: Seq[Attribute])
    extends LeafNode with MultiInstanceRelation {

  override def newInstance(): GraftRelation =
    copy(output = output.map(_.newInstance()))

  /** Size AND row count from the current manifest — lets Catalyst
    * broadcast small graft tables and feed exact cardinality to the
    * cost-based rules (the manifest records exact per-file counts from
    * parquet footers, so rowCount here is not an estimate). */
  override def computeStats(): Statistics = {
    try {
      // Catalyst asks for stats repeatedly during planning (join reorder,
      // AQE); re-parsing the full manifest JSON each time scales planning
      // with O(plan nodes × manifest size). Memoize per (dir, log mtime):
      // any commit rewrites snapshots.json, so the mtime key invalidates.
      val mtime = java.nio.file.Files
        .getLastModifiedTime(java.nio.file.Paths.get(s"$dir/snapshots.json"))
        .toMillis
      GraftRelation.statsCached((dir, mtime)) {
        val t = GraftTable.load(dir)
        val manifest = t.log.current
          .map(s => Manifest.read(s"$dir/${s.manifestList}"))
          .getOrElse(Manifest.empty) // a snapshotless table IS tiny
        Statistics(
          // totals come from the manifest LIST's per-segment metadata —
          // touching .files here would force every lazy segment parse at
          // plan time, the exact O(files) cost segmentation removed
          sizeInBytes = BigInt(manifest.totalBytes).max(1),
          // every merge-on-read form carries exact dead-row counts in the
          // summary (positional: per-target; predicate/equality: counted
          // at commit), so rowCount stays exact while entries pend. It is
          // withheld only for entries committed with exactCount = false —
          // never overstated. (sizeInBytes stays: overstating size only
          // suppresses a broadcast, the safe direction.)
          rowCount = for {
            p <- t.pendingDeletedCount
            e <- t.equalityDeletedCount
          } yield BigInt(
            manifest.totalRecords - t.positionalDeletedCount - p - e))
      }
    } catch {
      case _: Exception => Statistics(sizeInBytes = BigInt(Long.MaxValue))
    }
  }
}

object GraftRelation {

  /** (table dir, snapshots.json mtime) → Statistics. One live entry per
    * table in practice (stale mtimes stop being requested after the next
    * commit); capped defensively. */
  private val statsCacheMap =
    new java.util.concurrent.ConcurrentHashMap[(String, Long),
      org.apache.spark.sql.catalyst.plans.logical.Statistics]()

  private[table] def statsCached(key: (String, Long))(
      f: => org.apache.spark.sql.catalyst.plans.logical.Statistics)
      : org.apache.spark.sql.catalyst.plans.logical.Statistics = {
    if (statsCacheMap.size() > 1024) statsCacheMap.clear()
    statsCacheMap.computeIfAbsent(key, _ => f)
  }

  /** Build the relation for a table with its read schema (user schema +
    * virtual snapshot column). */
  def apply(t: GraftTable): GraftRelation =
    GraftRelation(t.dir, DataTypeUtils.toAttributes(t.readSchema))

  /** A DataFrame over the deferred relation (what `register` exposes). */
  def dataFrame(spark: SparkSession, t: GraftTable): DataFrame =
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark, apply(t))
}

/** Deferred `__snapshots` system-table leaf: the snapshot LOG is read at
  * optimization time, per query — a view registered over an eager
  * DataFrame would be pinned to the log as of registration and disagree
  * with the (deferred) data view after later appends.
  */
final case class GraftSnapshotsRelation(dir: String, output: Seq[Attribute])
    extends LeafNode with MultiInstanceRelation {

  override def newInstance(): GraftSnapshotsRelation =
    copy(output = output.map(_.newInstance()))

  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(1024)) // metadata-tiny; broadcastable
}

object GraftSnapshotsRelation {
  def apply(t: GraftTable): GraftSnapshotsRelation =
    GraftSnapshotsRelation(t.dir,
      DataTypeUtils.toAttributes(GraftTable.SnapshotsSchema))

  def dataFrame(spark: SparkSession, t: GraftTable): DataFrame =
    org.apache.spark.sql.classic.GraftBridge.ofRows(spark, apply(t))
}

/** Replaces [[GraftRelation]] leaves with concrete parquet scans at the
  * query's snapshot. Runs in the user-provided optimizer batch — after
  * predicate pushdown, so the query's own filter sits directly above the
  * leaf and carries the time-travel conjunct (P16). The original filter is
  * left in place as the residual correctness net (the reference's pushed +
  * residual double-evaluation, IcebergStorageHandler.java:106-112);
  * manifest min/max pruning consumes the neutralized predicate.
  */
final case class ResolveGraftScan(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // Metadata-only count(*): an ungrouped, unfiltered count over the
    // relation is answered from the manifest's record counts — zero data
    // I/O (at 100 TB: a JSON read instead of a table scan). Iceberg-class
    // formats make the same guarantee from the same bookkeeping; the
    // append path records exact per-file counts from parquet footers.
    // Only literal-argument COUNT without DISTINCT/FILTER qualifies —
    // count(col) depends on per-row nulls and must scan.
    case agg @ Aggregate(Seq(), aggExprs, MetadataCountChild(g), _)
        if isLiteralCountOnly(aggExprs) =>
      val t = GraftTable.load(g.dir)
      // every merge-on-read form carries exact dead-row counts in the
      // summary (positional: per-target; predicate/equality: counted at
      // commit), so the metadata answer subtracts them. Only entries
      // committed with exactCount = false fall through to a real scan.
      (t.pendingDeletedCount, t.equalityDeletedCount) match {
        case (Some(pd), Some(ed)) =>
          val n = t.log.current
            .map(s => Manifest.read(s"${g.dir}/${s.manifestList}").totalRecords)
            .getOrElse(0L) - t.positionalDeletedCount - pd - ed
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
            aggExprs.map(_.toAttribute),
            Seq(org.apache.spark.sql.catalyst.InternalRow(
              aggExprs.map(_ => n): _*)))
        case _ => agg.mapChildren(apply)
      }

    case f @ Filter(cond, g: GraftRelation) =>
      val t = GraftTable.load(g.dir)
      val snapId = TimeTravel.extractSnapshotId(cond, t.virtualColumn)
      val pruned = TimeTravel.neutralize(cond, t.virtualColumn)
      val scan = t.scanPlanFor(spark, snapshotId = snapId,
        prunePredicate = Some(pruned))
      Filter(cond, remap(scan, g.output))

    case g: GraftRelation =>
      val t = GraftTable.load(g.dir)
      remap(t.scanPlanFor(spark, None, None), g.output)

    case g: GraftSnapshotsRelation =>
      val t = GraftTable.load(g.dir)
      val df = t.snapshots(spark)
      remap(org.apache.spark.sql.classic.GraftBridge.analyzedPlan(df), g.output)
  }

  /** Every aggregate is COUNT over non-null foldable arguments (count(*)
    * canonicalizes to count(1)), no DISTINCT, no FILTER clause. */
  private def isLiteralCountOnly(
      aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression])
      : Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
    aggExprs.nonEmpty && aggExprs.forall {
      case Alias(AggregateExpression(Count(children), _, false, None, _), _) =>
        children.forall(c => c.foldable && c.eval() != null)
      case _ => false
    }
  }

  /** The aggregate child is the bare relation, possibly under a pruning
    * Project of plain attributes (what ColumnPruning leaves behind). */
  private object MetadataCountChild {
    def unapply(plan: LogicalPlan): Option[GraftRelation] = plan match {
      case g: GraftRelation => Some(g)
      case Project(ps, g: GraftRelation)
          if ps.forall(_.isInstanceOf[Attribute]) => Some(g)
      case _ => None
    }
  }

  /** Project the concrete scan's output onto the relation's attribute ids
    * so references elsewhere in the plan stay valid. */
  private def remap(scan: LogicalPlan, target: Seq[Attribute]): LogicalPlan = {
    val byName = scan.output.map(a => a.name -> a).toMap
    Project(target.map { a =>
      Alias(byName(a.name), a.name)(exprId = a.exprId)
    }, scan)
  }
}
