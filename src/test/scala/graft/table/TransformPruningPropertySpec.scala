package graft.table

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Randomized soundness sweep for hidden-partitioning pruning: for random
  * (spec, data, predicate) combinations, a `scan(pred)` over the
  * transform-partitioned table must return EXACTLY the rows the plain
  * DataFrame filter returns — if the conjunct mapping in
  * [[PartitionField.augment]] ever over-prunes, rows vanish silently,
  * which is the worst failure mode a table format can have. (The
  * residual filter guarantees no extra rows; this asserts none are
  * LOST.) Mirrors PruningPropertySpec's stance for the stats walk. */
class TransformPruningPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("k", StringType, nullable = true),
    StructField("x", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = true)))

  private val day0 = 1690000000000L - (1690000000000L % 86400000L)

  private def randomRows(rnd: Random, n: Int): Seq[Row] =
    (0 until n).map { i =>
      val k = if (rnd.nextInt(10) == 0) null else s"p${rnd.nextInt(4)}_${rnd.nextInt(30)}"
      val ts = if (rnd.nextInt(12) == 0) null
        else new Timestamp(day0 + rnd.nextInt(10) * 86400000L +
          rnd.nextInt(86400) * 1000L)
      Row(k, rnd.nextInt(100), ts)
    }

  private def randomPred(rnd: Random, rows: Seq[Row]): Column = {
    def someK: String = {
      val ks = rows.flatMap(r => Option(r.get(0))).map(_.toString)
      if (ks.isEmpty) "p0_0" else ks(rnd.nextInt(ks.size))
    }
    def someTs: Timestamp = {
      val ts = rows.flatMap(r => Option(r.get(2))).map(_.asInstanceOf[Timestamp])
      if (ts.isEmpty) new Timestamp(day0) else ts(rnd.nextInt(ts.size))
    }
    // exact period boundaries exercise the strict mapping in mapConjunct
    // and the proof bounds in proofAugment — the retention shapes
    def boundaryTs: Timestamp =
      new Timestamp(day0 + rnd.nextInt(11) * 86400000L)
    rnd.nextInt(10) match {
      case 0 => col("k") === someK
      case 1 => col("k").isin(someK, someK, s"absent_${rnd.nextInt(9)}")
      case 2 => col("k") >= someK
      case 3 => col("k").isNull
      case 4 => col("ts") >= lit(someTs)
      case 5 => col("ts") < lit(someTs)
      case 6 => col("ts").isNull
      case 7 => col("k") === someK && col("x") < rnd.nextInt(100)
      case 8 => col("ts") < lit(boundaryTs)
      case 9 => col("ts") >= lit(boundaryTs)
    }
  }

  test("random spec × data × predicate: scan(pred) == plain filter(pred)") {
    val rnd = new Random(20260813L)
    val specs = Seq(
      Seq("bucket(2,k)"), Seq("bucket(7,k)"), Seq("truncate(2,k)"),
      Seq("truncate(1,k)"), Seq("days(ts)"), Seq("hours(ts)"),
      Seq("months(ts)"), Seq("x"), Seq("bucket(3,k)", "days(ts)"))
    specs.zipWithIndex.foreach { case (spec, si) =>
      val rows = randomRows(rnd, 120)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      val t = GraftTable.create(tmpDir(s"tp-prop-$si"), schema,
        partitionBy = spec)
      t.append(df, Some(1000L))
      (0 until 6).foreach { pi =>
        val pred = randomPred(rnd, rows)
        val got = t.scan(spark, Some(pred)).drop("snapshot__id")
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val want = df.filter(pred)
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(got.toSeq == want.toSeq,
          s"spec=$spec case=$pi lost/gained rows (got ${got.size}, want ${want.size})")
      }
    }
  }

  test("random spec × data × predicate: DELETE keeps exactly the non-matching rows") {
    // end-to-end soundness of the metadata-only drop fast path under
    // every transform family: delete(pred) must keep precisely the rows
    // a plain SQL DELETE would (NULL predicate keeps the row). A wrong
    // mustMatchAll/proofAugment proof silently deletes survivors —
    // caught here across drops, rewrites, and their mixtures.
    val rnd = new Random(20260814L)
    val specs = Seq(
      Seq("days(ts)"), Seq("hours(ts)"), Seq("truncate(2,k)"),
      Seq("bucket(3,k)"), Seq("x"), Seq("bucket(2,k)", "days(ts)"))
    specs.zipWithIndex.foreach { case (spec, si) =>
      val rows = randomRows(rnd, 100)
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      (0 until 4).foreach { pi =>
        val t = GraftTable.create(tmpDir(s"tp-del-$si-$pi"), schema,
          partitionBy = spec)
        t.append(df, Some(1000L))
        val pred = randomPred(rnd, rows)
        t.delete(spark, pred, Some(2000L))
        val got = t.read(spark).drop("snapshot__id")
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        val want = df.filter(coalesce(!pred, lit(true)))
          .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
        assert(got.toSeq == want.toSeq,
          s"spec=$spec case=$pi delete kept ${got.size}, want ${want.size}")
      }
    }
  }
}
