package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Equivalence proof for [[Pipeline.budgetFill]] (p06's scale-safe
  * bucketed token-budget fill): on random AND adversarial inputs its
  * per-source (budget, docs_kept, tokens_kept) must equal the NAIVE
  * spelling — one cumulative window per source in (h, doc_id) order,
  * keep while cum ≤ budget — that the DuckDB oracle uses. The oracle
  * only exercises the fixed corpus; this sweep drives the boundary
  * cases that decide correctness of the bucket decomposition: budgets
  * landing exactly on a bucket-prefix sum (remaining = 0), zero-token
  * runs straddling the boundary, single-doc sources whose first doc
  * overflows the budget (source dropped), and empty-ish buckets. */
class BudgetFillPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("nt", LongType, nullable = false)))

  private def frame(rows: Seq[(String, Long, Long)]) = {
    val rdd = spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2, r._3)), 4)
    spark.createDataFrame(rdd, schema)
      .withColumn("h", md5(col("doc_id").cast("string")))
  }

  /** The naive reference: per-source cumulative window, the oracle's
    * exact keep rule. */
  private def naive(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val budgets = df.groupBy("source").agg(sum("nt").as("total"))
      .withColumn("budget",
        expr("total * (2 + length(source) % 5) div 10"))
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("nt").over(w))
      .join(budgets, "source")
      .filter(col("cum") <= col("budget"))
      .groupBy("source")
      .agg(first(col("budget")).as("budget"),
        count(lit(1)).as("docs_kept"),
        sum("nt").as("tokens_kept"))
      .select(col("source"), col("budget").cast("long").as("budget"),
        col("docs_kept").cast("long"), col("tokens_kept").cast("long"))
  }

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  private def check(rows: Seq[(String, Long, Long)], label: String): Unit = {
    val df = frame(rows)
    val got = collectMap(Pipeline.budgetFill(df))
    val want = collectMap(naive(df))
    assert(got == want,
      s"$label: bucketed fill diverged from the naive window\n" +
        s"  got:  $got\n  want: $want")
  }

  test("random sweep: bucketed fill ≡ naive per-source window") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 6).foreach { round =>
      var id = 0L
      val rows = (0 until 1 + rnd.nextInt(5)).flatMap { s =>
        val src = "src" + ("x" * (s % 5)) // vary length → vary weight
        (0 until rnd.nextInt(400)).map { _ =>
          id += 1
          // heavy zero mass exercises flat cum runs at boundaries
          val nt = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(50).toLong
          (src, id, nt)
        }
      }
      if (rows.nonEmpty) check(rows, s"random round $round")
    }
  }

  test("adversarial shapes: exact-boundary budgets, overflow-first docs, all-zero sources") {
    // all-zero token source: budget 0, cum 0 ≤ 0 → every doc kept
    check((1L to 40L).map(i => ("zeros", i, 0L)), "all-zero source")
    // one-doc source where the doc exceeds its own budget (w < 1):
    // nothing kept → the source must be ABSENT from both outputs
    val df = frame(Seq(("solo", 1L, 100L)))
    assert(Pipeline.budgetFill(df).collect().isEmpty &&
      naive(df).collect().isEmpty, "overflowing single doc must drop")
    // uniform tokens: the budget is a multiple of nt, so the crossing
    // lands EXACTLY on a doc edge (remaining = 0 paths)
    check((1L to 200L).map(i => ("uni", i, 10L)), "uniform exact edges")
    // two sources sharing doc-id hash space, wildly different sizes
    check((1L to 300L).map(i =>
      (if (i % 7 == 0) "big" else "smallxx", i, (i % 13))) ++
      Seq(("lonely", 1000L, 1L)), "mixed sizes + singleton")
  }
}
