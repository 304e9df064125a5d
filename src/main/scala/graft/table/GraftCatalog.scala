package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog/table resolution (S1) — Spark-native analog of
  * `TableResolverUtil.resolveTableFromConfiguration`
  * (TableResolverUtil.java:59-91), which supports path-addressed tables
  * (HadoopTables, :66-68) and warehouse-addressed `db.table` identifiers
  * (HadoopCatalog, :69-85), plus `<name>__snapshots` metadata-table naming
  * (:72-85,93-100).
  */
final class GraftCatalog(warehouse: String) {

  /** `db.table` → `<warehouse>/db/table` (HadoopCatalog layout).
    * Each segment is validated (word characters only) so an identifier
    * containing `/` or `..` can never resolve outside the warehouse root. */
  def tableDir(identifier: String): String = {
    require(identifier.nonEmpty, "empty table identifier")
    val parts = identifier.split('.')
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z0-9_]+")),
      s"invalid table identifier '$identifier': segments must match [A-Za-z0-9_]+")
    (Seq(warehouse) ++ parts).mkString("/")
  }

  def createTable(
      identifier: String,
      schema: org.apache.spark.sql.types.StructType,
      properties: Map[String, String] = Map.empty,
      partitionBy: Seq[String] = Nil): GraftTable =
    GraftTable.create(tableDir(identifier), schema, properties, partitionBy)

  /** Run `f` against a warehouse TRANSACTION and publish its staged
    * commits atomically; any failure (in `f` or pre-atomicity publish)
    * rolls the whole transaction back. `f` receives the open
    * [[GraftTransaction]] — `txn.table("db.t")` hands back staged
    * handles whose commits become visible only at publish, all
    * together. The cross-table consistency primitive: corpus append +
    * index refresh as ONE visible event. */
  def transact[T](f: GraftTransaction => T): T = {
    val txn = beginTransaction()
    try {
      val r = f(txn)
      txn.commit()
      r
    } catch {
      case e: Throwable =>
        try txn.rollback() catch { case _: Throwable => () }
        throw e
    }
  }

  /** Explicit begin/commit form of [[transact]]. */
  def beginTransaction(): GraftTransaction = GraftTransaction.begin(warehouse)

  /** Resolve `db.table` or `db.table__snapshots`. Returns either the data
    * table or its snapshots system table as a DataFrame.
    *
    * A data table whose real name ends in `__snapshots` wins over the
    * system table when it exists on disk with `graft.snapshots.table=false`
    * (reference edge case: TestReadSnapshotTable.java:114-136).
    */
  def loadDataFrame(spark: SparkSession, identifier: String): DataFrame = {
    if (identifier.endsWith(GraftTable.SnapshotsSuffix)) {
      // a real table by that exact name takes precedence if it opted out
      if (GraftTable.exists(tableDir(identifier))) {
        val t = GraftTable.load(tableDir(identifier))
        if (!t.snapshotsTableEnabled) return t.read(spark)
      }
      val base = identifier.dropRight(GraftTable.SnapshotsSuffix.length)
      val t = GraftTable.load(tableDir(base))
      require(t.snapshotsTableEnabled,
        s"snapshots table disabled for $base (${GraftTable.PropSnapshotsTable}=false)")
      t.snapshots(spark)
    } else if (identifier.endsWith(GraftTable.FilesSuffix)) {
      // same naming convention as __snapshots; a real table by that exact
      // name takes precedence
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.FilesSuffix.length)
      GraftTable.load(tableDir(base)).filesTable(spark)
    } else if (identifier.endsWith(GraftTable.PartitionsSuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.PartitionsSuffix.length)
      GraftTable.load(tableDir(base)).partitionsTable(spark)
    } else if (identifier.endsWith(GraftTable.RefsSuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.RefsSuffix.length)
      GraftTable.load(tableDir(base)).refsTable(spark)
    } else if (identifier.endsWith(GraftTable.HistorySuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.HistorySuffix.length)
      GraftTable.load(tableDir(base)).historyTable(spark)
    } else if (identifier.endsWith(GraftTable.AllFilesSuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.AllFilesSuffix.length)
      GraftTable.load(tableDir(base)).allFilesTable(spark)
    } else if (identifier.endsWith(GraftTable.DeletesSuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.DeletesSuffix.length)
      GraftTable.load(tableDir(base)).deletesTable(spark)
    } else if (identifier.endsWith(GraftTable.SegmentsSuffix)) {
      if (GraftTable.exists(tableDir(identifier)))
        return GraftTable.load(tableDir(identifier)).read(spark)
      val base = identifier.dropRight(GraftTable.SegmentsSuffix.length)
      GraftTable.load(tableDir(base)).segmentsTable(spark)
    } else {
      GraftTable.load(tableDir(identifier)).read(spark)
    }
  }

  /** Register `name` (and `name__snapshots` when enabled) as temp views so
    * `spark.sql` can query them. The data view is a deferred
    * [[GraftRelation]]: snapshot choice (current, or this query's
    * `snapshot__id = <id>` predicate) happens per query inside
    * [[ResolveGraftScan]], never at registration — the reference's
    * statelessness invariant (TestPredicatePushdown.java:74-112). */
  def register(spark: SparkSession, identifier: String): Unit = {
    GraftCatalog.injectRule(spark)
    val viewName = identifier.replace('.', '_')
    val t = GraftTable.load(tableDir(identifier))
    GraftRelation.dataFrame(spark, t).createOrReplaceTempView(viewName)
    if (t.snapshotsTableEnabled) {
      // deferred like the data view: the log is re-read per query, so the
      // two views stay consistent after later appends
      GraftSnapshotsRelation.dataFrame(spark, t).createOrReplaceTempView(
        viewName + GraftTable.SnapshotsSuffix)
    }
  }
}

object GraftCatalog {
  /** Path-addressed load (HadoopTables analog, TableResolverUtil.java:66-68). */
  def loadPath(spark: SparkSession, dir: String): DataFrame =
    GraftTable.load(dir).read(spark)

  /** Idempotently add [[ResolveGraftScan]] to the session's optimizer
    * (the `experimental.extraOptimizations` hook runs as the last
    * optimizer batch, after predicate pushdown has placed each query's
    * filter next to the [[GraftRelation]] leaf). */
  def injectRule(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      val existing = spark.experimental.extraOptimizations
      if (!existing.exists(_.isInstanceOf[ResolveGraftScan])) {
        spark.experimental.extraOptimizations =
          existing :+ ResolveGraftScan(spark)
      }
    }
}
