package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in [[queries]] is a DataFrame program over the driver's
  * parquet tables in `sfDir` (see /root/repo/TESTDATA.md). Entries that are
  * ANSI-SQL-expressible also appear in [[oracleSql]] with the SAME result
  * column names (the driver sorts columns by name before hashing, so every
  * computed column must be aliased identically on both sides).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]

  /** Read one of the driver-generated tables. */
  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` normalized to a session-timezone TIMESTAMP
    * in microseconds, whatever physical type the driver's parquet carries:
    *
    *   - INT64 TIMESTAMP(NANOS): Spark's vectorized reader refuses it by
    *     default — sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    *     (Verify/Bench/QueryProbe), the column arrives as nanos-since-epoch
    *     LONG, and `div 1000` converts exactly (double division would lose
    *     precision above 2^53).
    *   - TIMESTAMP(MICROS) without timezone: arrives as TIMESTAMP_NTZ,
    *     which `unix_micros`/`window` arithmetic can't consume — cast to
    *     TIMESTAMP, exact under the UTC session timezone all entry points
    *     pin.
    */
  protected def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
