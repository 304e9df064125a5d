package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types.StructType

/** Key-grouped wrapper over the delegate parquet [[Scan]] — the engine
  * behind storage-partitioned joins on graft tables.
  *
  * The delegate plans its splits normally (bin-packed [[FilePartition]]s
  * with row-group ranges); this wrapper flattens them and re-groups every
  * split by its file's BUCKET id from the manifest's directory values,
  * yielding exactly one input partition per bucket, each announcing its
  * key through [[HasPartitionKey]]. `outputPartitioning` reports
  * `KeyGroupedPartitioning(bucket(n, col), #buckets)`; Spark resolves the
  * transform against the graft catalog's function
  * (`graft.table.GraftV2Functions`) and a join of two tables bucketed the
  * same way on the join key then needs NO shuffle on either side — the
  * lever that turns a 100 TB fact-fact join from a full-network sort
  * into a local per-bucket merge. Reading rides the delegate's own
  * vectorized reader factory untouched.
  *
  * The trade is the standard one: scan parallelism becomes #buckets, so
  * the wrapper only engages when the read opts in (see
  * `GraftV2Table.newScanBuilder`); plain scans keep bin-packed splits.
  *
  * Lives in this package alongside [[GraftPruningScanBuilder]] because
  * the file-source split machinery is internal to org.apache.spark.sql.
  */
final class GraftKeyGroupedScan(
    delegate: Scan,
    v2Keys: Array[V2Expression],
    bucketOf: String => Option[Int])
    extends Scan with Batch with SupportsReportPartitioning {

  // Deliberately does NOT forward SupportsReportStatistics: a
  // key-grouped read is an explicit opt-in to the aligned partitioned
  // join, and withholding size estimates keeps the planner from
  // broadcasting one side and discarding the bucket alignment the user
  // paid for at write time. Plain scans (GraftRuntimeFilterScan) do
  // forward stats.

  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String =
    s"graft key-grouped over ${delegate.description()}"
  override def toBatch: Batch = this

  /** Bucket id of one split, from the manifest map (keyed by
    * scheme-stripped path). A split the manifest does not know is a
    * planning bug, not a data condition — fail loudly rather than
    * mis-bucket it. */
  private def bucketOfSplit(pf: PartitionedFile): Int = {
    val p = pf.toPath.toUri.getPath
    bucketOf(p).getOrElse(throw new IllegalStateException(
      s"file $p is not in the scanned manifest — cannot key-group"))
  }

  private lazy val groups: Array[(Int, Array[PartitionedFile])] =
    delegate.toBatch.planInputPartitions()
      .flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(
          s"parquet delegate planned ${other.getClass.getName}, expected FilePartition")
      }
      .groupBy(bucketOfSplit).toArray.sortBy(_._1)

  override def planInputPartitions(): Array[InputPartition] =
    groups.zipWithIndex.map { case ((bucket, files), i) =>
      new GraftKeyedFilePartition(i, files, bucket)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    delegate.toBatch.createReaderFactory()

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(v2Keys, groups.length)
}

/** A [[FilePartition]] that also announces its bucket id, which is what
  * lets Spark line partitions up across the two sides of a
  * storage-partitioned join. */
final class GraftKeyedFilePartition(
    idx: Int,
    fs: Array[PartitionedFile],
    bucket: Int)
    extends FilePartition(idx, fs) with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}
