package graft.table

import org.apache.spark.sql.types._

/** Partition-value handling for identity-partitioned graft tables.
  *
  * The reference's Iceberg tables are partition-aware at scan time
  * (`scan.planTasks()` consults partition data the same way it consults
  * file stats; the reference's own fixtures are unpartitioned). Here a
  * partition value lives in the `<col>=<value>/` directory name written by
  * Spark's partitioned parquet writer; the manifest records it per file
  * and synthesizes exact `min = max = value` [[ColumnStats]] so the
  * min/max pruning machinery prunes whole partitions with the same sound
  * logic it applies to file stats. At 100 TB this is the difference
  * between touching one partition and listing the world — the pruning
  * decision is O(manifest), no filesystem listing, no footer reads.
  */
object PartitionValues {

  /** Hive's marker for a null partition value (what Spark's writer emits). */
  val NullMarker = "__HIVE_DEFAULT_PARTITION__"

  /** Partition column types we accept at `create`. Floats are excluded
    * (NaN/-0.0 directory names are a portability trap), as are nested and
    * binary types (no stable path encoding). */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | StringType | DateType => true
    case _ => false
  }

  /** Directory-name fragment → logical value (None = null partition).
    * Spark escapes special characters `%xx`-style on write; undo it. */
  def decode(raw: String): Option[String] = {
    val unescaped = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(raw)
    if (unescaped == NullMarker) None else Some(unescaped)
  }

  /** Synthesized per-file stats for a partition column: every row in the
    * file has exactly this value, so min = max = value (or all-null for a
    * null partition) with exact null/value counts. Stored in the stat
    * string form [[ColumnStats.parse]] reads back (dates re-render as
    * epoch days to match parquet-footer convention). */
  def stats(value: Option[String], dt: DataType, rows: Long): ColumnStats =
    value match {
      case None => ColumnStats(None, None, Some(rows), Some(rows))
      case Some(v) =>
        val s = dt match {
          case DateType => java.time.LocalDate.parse(v).toEpochDay.toString
          case _ => v
        }
        ColumnStats(Some(s), Some(s), Some(0L), Some(rows))
    }
}
