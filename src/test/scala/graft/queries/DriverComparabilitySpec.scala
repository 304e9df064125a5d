package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.{SparkEntry, SparkSpecBase}

/** Driver-comparability gate (round-4 verdict item 2): the driver's oracle
  * harness sorts+hashes every result with pandas, which crashes on
  * array/map/struct cells ("unhashable type: numpy.ndarray" — the r4
  * m05/m06/p03 failure). Every query that claims an oracle must therefore
  * emit only atomic top-level columns; reintroducing a nested result type
  * on an oracled query fails the build here, before the driver ever sees it.
  */
class DriverComparabilitySpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def nestedColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every oracled query emits only atomic (sortable, hashable) columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val q = SparkEntry.queries.getOrElse(name,
        fail(s"oracleSql entry '$name' has no matching queries entry"))
      // building the DataFrame analyzes the plan; no execution needed
      val nested =
        try nestedColumns(q(spark, sfDir))
        catch { case e: Exception => Seq(s"plan build failed: $e") }
      nested.map(c => s"$name → $c")
    }
    assert(offenders.isEmpty,
      s"oracled queries with driver-incomparable result columns:\n" +
        offenders.mkString("\n"))
  }

  test("the detector itself fires on an array-typed result column") {
    val bad = spark.read.parquet(s"$sfDir/nation.parquet")
      .groupBy("n_regionkey")
      .agg(collect_list(col("n_name")).as("names"))
    assert(nestedColumns(bad) == Seq("names: array<string>"))
    val ok = bad.select(col("n_regionkey"),
      array_join(sort_array(col("names")), ",").as("names"))
    assert(nestedColumns(ok).isEmpty)
  }
}
