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
}
