package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[graft.queries.QueryPack]]: each pack contributes
  * driver-checkable queries (and, where SQL-expressible, a DuckDB oracle
  * with identical result column names).
  */
object SparkEntry {

  private val packs: Seq[graft.queries.QueryPack] = Seq(
    graft.queries.Relational,
    graft.queries.TextAnalysis,
    graft.queries.Dedup,
    graft.queries.Versioned,
    graft.queries.Similarity,
    graft.queries.Events,
    graft.queries.MultimodalQueries,
    graft.queries.Pipeline,
    graft.queries.StreamReplay,
    graft.queries.TpcH,
    graft.queries.TpcHExtra
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 in full form — the canonical scan+aggregate the engine is
    * built around. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    queries("h01_pricing_summary")(spark, d)
  }

  /** One entry per implemented operator from SURVEY.md §2. Built once
    * (Bench/Verify iterate it repeatedly) and guarded against cross-pack
    * name collisions — `toMap` would otherwise silently drop an operator
    * from the whole bench/verify/oracle surface (last pack wins). */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val flat = packs.flatMap(_.queries)
    val m = flat.toMap
    require(m.size == flat.size, {
      val dups = flat.groupBy(_._1).filter(_._2.size > 1).keys
      s"duplicate query names across packs: ${dups.mkString(", ")}"
    })
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val flat = packs.flatMap(_.oracleSql)
    val m = flat.toMap
    require(m.size == flat.size, {
      val dups = flat.groupBy(_._1).filter(_._2.size > 1).keys
      s"duplicate oracle names across packs: ${dups.mkString(", ")}"
    })
    m
  }
}
