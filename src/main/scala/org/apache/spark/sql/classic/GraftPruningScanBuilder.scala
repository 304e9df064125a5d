package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 scan builder that applies MANIFEST-LEVEL file pruning before
  * delegating to Spark's parquet source. Spark hands this builder the
  * resolved Catalyst data filters (the `SupportsPushDownCatalystFilters`
  * path every `FileScanBuilder` rides); `prune` maps them to the kept
  * file list — min/max stats, manifest blooms, AND the hidden-partition
  * transform conjuncts, the same `GraftTable.pruneKeep` the library scan
  * path uses — so a DSv2 `WHERE id = 7` on a bucketed table plans 1/N of
  * the files instead of all of them. Everything stays residual at this
  * level (the full filter re-applies post-scan; `pushedFilters` reports
  * none) while the delegate builder gets the same filters re-pushed for
  * parquet row-group skipping and the required-column pruning forwarded.
  *
  * Lives in this package because the delegate family and the Catalyst
  * pushdown interface are package-private to org.apache.spark.sql.
  */
final class GraftPruningScanBuilder(
    spark: org.apache.spark.sql.SparkSession,
    tableName: String,
    schema: StructType,
    options: java.util.Map[String, String],
    allPaths: Seq[String],
    prune: Seq[Expression] => Seq[String],
    keyGrouped: Option[(
        Array[org.apache.spark.sql.connector.expressions.Expression],
        String => Option[Int])] = None)
  extends ScanBuilder
  with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var pushed: Seq[Expression] = Nil
  private var required: StructType = schema

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushed = filters
    filters // all residual here — correctness never depends on the pruning
  }

  override def pushedFilters()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val paths = if (pushed.isEmpty) allPaths else prune(pushed)
    val delegate = GraftBridge
      .parquetTable(spark, tableName, paths, schema, options)
      .newScanBuilder(new CaseInsensitiveStringMap(options))
    delegate match {
      case f: SupportsPushDownCatalystFilters => f.pushFilters(pushed)
      case _ => ()
    }
    delegate match {
      case c: SupportsPushDownRequiredColumns => c.pruneColumns(required)
      case _ => ()
    }
    val built = delegate.build()
    keyGrouped match {
      // a pruned-to-empty scan keeps the plain shape (a zero-partition
      // KeyGroupedPartitioning has nothing to report)
      case Some((keys, bucketOf)) if paths.nonEmpty =>
        new GraftKeyGroupedScan(built, keys, bucketOf)
      case _ => built
    }
  }
}
