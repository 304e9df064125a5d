package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints, for each (or one named) SparkEntry query, the
  * physical-plan properties that matter at 100 TB —
  *
  *  - `PushedFilters` / `ReadSchema` on the parquet scan (pushdown + column
  *    pruning actually reached the source);
  *  - join strategies chosen (broadcast vs sort-merge);
  *  - number of shuffle exchanges;
  *  - whole-stage codegen coverage.
  *
  * `sbt "runMain graft.tools.ExplainAudit [sfDir] [queryName]"` — prints
  * one summary line per query, or the full formatted plan when a name is
  * given.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = only.map(Seq(_)).getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        if (only.isDefined) {
          println(s"=== $name ===")
          df.explain("formatted")
        } else {
          def count(pat: String) = pat.r.findAllIn(plan).length
          val pushed = count("PushedFilters: \\[[^\\]]*[A-Za-z]")
          val scans = count("FileScan|BatchScan")
          val bhj = count("BroadcastHashJoin")
          val smj = count("SortMergeJoin")
          val exch = count("Exchange (hash|range|Single)")
          val wsc = count("\\*\\(\\d+\\)")
          println(f"$name%-28s scans=$scans pushedFilterScans=$pushed " +
            f"bhj=$bhj smj=$smj shuffles=$exch codegenSpans=$wsc")
        }
      } catch {
        case e: Exception => println(s"$name ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
