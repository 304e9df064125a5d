package org.apache.spark.sql.classic

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.V1Scan
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.types.{StructField, StructType}

/** Repairs the one plan shape Spark's variant-extraction pushdown breaks
  * on DSv2 sources: a query combining a METADATA column (`_row_id`,
  * `_file`, `_pos`, `_last_updated_snapshot_id`) with a pushed
  * `variant_get`.
  *
  * Upstream, `V2ScanRelationPushDown.buildScanWithPushedVariants`
  * rebuilds the scan relation's output by zipping
  * `toAttributes(scan.readSchema())` with the holder's output — and the
  * scan's read schema is the DATA schema, so the metadata attributes the
  * analyzer appended at the END of the relation output fall off the zip.
  * The Project above still references them and the query dies at binding
  * with an INTERNAL_ERROR. (Plain metadata-column queries never hit this:
  * their flow goes through `pruneColumns`, which this variant arm
  * bypasses entirely.)
  *
  * This rule runs in the `experimental.extraOptimizations` batch ("User
  * Provided Optimizers" — after Early Filter and Projection Push-Down,
  * before physical planning), recognizes exactly that truncation on a
  * graft scan, and swaps in the scan the NORMAL metadata-column flow
  * would have built ([[graft.table.GraftFileposScan]] over the same
  * pruned file list): data columns as themselves, lineage/provenance
  * columns computed in-reader, and each VariantMetadata-marked struct
  * the rewrite requested computed from the raw variant bytes. The
  * extraction is served INTERPRETED on this path — correct, and
  * exclusive to the rare metadata+variant combination; plain
  * `variant_get` reads keep the shredded pushdown.
  *
  * Soundness notes:
  *  - residual filters stayed ABOVE the scan relation (the pruning
  *    builder claims a conjunct only when file selection alone serves
  *    it), and the repair reuses the SAME pruned path list the broken
  *    delegate planned, so claimed conjuncts keep their proof;
  *  - the replacement output appends exactly the dropped attributes
  *    (same exprIds), so every reference above re-binds;
  *  - the guard re-checks `rel.output.size > output.size`, making the
  *    rewrite a no-op on already-repaired (or healthy) plans under the
  *    fixed-point batch.
  *
  * Injected idempotently per session by [[graft.table.GraftSparkCatalog]]
  * at initialize time — catalog reads work without
  * `GraftExtensions` on the session, so the repair must too.
  */
object GraftVariantMetadataRepair extends Rule[LogicalPlan] {

  private def metaName(n: String): Boolean =
    n == "_file" || n == "_pos" ||
      n == graft.table.GraftTable.RowIdCol ||
      n == graft.table.GraftTable.LastUpdatedCol

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case dsr @ DataSourceV2ScanRelation(
          rel, scan: GraftRuntimeFilterScan, output, None, None)
        if scan.variantPushed && scan.metadataRepair.isDefined &&
          rel.output.size > output.size &&
          rel.output.drop(output.size).forall(a => metaName(a.name)) =>
      // the zip truncation drops the TAIL of the relation output — the
      // metadata attributes appended by the analyzer. Rebuild the full
      // output (data columns carry the rewrite's struct types from
      // `output`; dropped attrs keep their original exprIds) and serve
      // it through the metadata-column scan.
      val dropped = rel.output.drop(output.size)
      val full = output ++ dropped
      val required = StructType(full.map(a =>
        StructField(a.name, a.dataType, a.nullable, a.metadata)))
      val repaired = scan.metadataRepair.get(required) match {
        // physical planning only accepts V1 scans through the wrapper
        // (the normal flow's getWrappedScan does this)
        case v1: V1Scan => V1ScanWrapper(v1, Nil,
          PushedDownOperators(None, None, None, None, Nil, Nil, Nil, None))
        case other => other
      }
      dsr.copy(scan = repaired, output = full)
  }

  /** Idempotently add this rule to the session's optimizer (the same
    * `experimental.extraOptimizations` hook [[graft.table.GraftCatalog
    * .injectRule]] uses). */
  def inject(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      val existing = spark.experimental.extraOptimizations
      if (!existing.contains(GraftVariantMetadataRepair))
        spark.experimental.extraOptimizations =
          existing :+ GraftVariantMetadataRepair
    }
}
