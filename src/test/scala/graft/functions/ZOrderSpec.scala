package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.table.{GraftTable, Manifest}

/** Z-order key semantics + the end-to-end payoff: a z-ordered compaction
  * leaves every participating dimension prunable, where a lexicographic
  * sort clusters only its first column.
  */
class ZOrderSpec extends SparkSpecBase {

  test("interleave: locality and order-preservation basics") {
    def z(a: Long, b: Long): Long = ZOrderKey.interleave(Array(a, b))
    // quadrant structure: both-small sorts below both-large
    assert(z(0L, 0L) < z(1L << 40, 1L << 40))
    // neighbors in both dims are close in z; distant-in-one-dim is far
    val base = z(1000L << 32, 1000L << 32)
    val near = z(1001L << 32, 1000L << 32)
    val far = z(Long.MaxValue / 2, 1000L << 32)
    assert(math.abs(base - near) < math.abs(base - far))
    // sign flip: negative values sort below positive in every dimension
    assert(z(-5L << 40, 0L) < z(5L << 40, 0L))
  }

  test("expression evaluates identically interpreted and codegen'd") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i * 1234567L, (101 - i) * 7654321L))
      .toDF("x", "y")
    val viaExpr = df.select(ZOrderKey.zorder_key(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val viaEval = df.collect().map(r =>
      ZOrderKey.interleave(Array(r.getLong(0), r.getLong(1))))
    assert(viaExpr.toSeq == viaEval.toSeq)
    // null handling: nulls group at the bottom, no NPE
    val withNull = Seq((Some(1L), None: Option[Long]), (Some(1L), Some(2L)))
      .toDF("x", "y")
    val zs = withNull.select(ZOrderKey.zorder_key(col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(zs(0) < zs(1)) // null y sorts below y=2 at same x
  }

  test("observed span wider than Long.MaxValue does not overflow the grid") {
    // large negative AND positive bounds in one compaction input: the
    // signed span mx - mn overflows; the normalization must stay monotone
    // and discriminating instead of dividing by a negative garbage span
    val mn = Long.MinValue + 10
    val mx = Long.MaxValue - 10
    def key(v: Long) =
      ZOrderKey.interleaveRanged(Array(v), Array(mn), Array(mx))
    val probe = Seq(mn, mn / 2, 0L, mx / 2, mx)
    val ks = probe.map(key)
    assert(ks == ks.sorted, s"keys not monotone over the wide span: $ks")
    assert(ks.distinct.size == probe.size, s"keys collapsed: $ks")
    // 2-d: both dimensions keep quadrant structure over the wide span
    def z2(a: Long, b: Long) = ZOrderKey.interleaveRanged(
      Array(a, b), Array(mn, mn), Array(mx, mx))
    assert(z2(mn, mn) < z2(mx, mx))
    assert(z2(mn, mx) < z2(mx, mx))
  }

  test("SMALL-RANGE values cluster via range normalization (no << 55 crutch)") {
    // the realistic case the raw top-bits interleave silently no-ops on:
    // plain 0..31 ints — every raw key is identical; the ranged key must
    // still discriminate and keep both dimensions prunable
    val dir = tmpDir("graft-zorder-small")
    val schema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false),
      StructField("payload", StringType, nullable = true)))
    val t = GraftTable.create(s"$dir/t", schema)
    val rng = new scala.util.Random(7)
    val grid = rng.shuffle(
      (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)).toSeq)
    grid.grouped(256).zipWithIndex.foreach { case (chunk, i) =>
      t.append(spark.createDataFrame(
        spark.sparkContext.parallelize(
          chunk.map { case (x, y) => Row(x, y, s"p$x-$y") }, 1), schema),
        Some(1000L + i))
    }
    t.compact(spark, smallerThanBytes = 1 << 20, Some(9000L),
      zorderBy = Seq("x", "y"), targetFileBytes = Some(2500L))
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files
    assert(files.size >= 4, s"want a multi-file rewrite, got ${files.size}")
    val xq = t.scan(spark, Some(col("x") === 5L))
    val yq = t.scan(spark, Some(col("y") === 5L))
    assert(xq.count() == 32 && yq.count() == 32)
    assert(xq.inputFiles.length < files.size,
      s"x not prunable at small range: ${xq.inputFiles.length}/${files.size}")
    assert(yq.inputFiles.length < files.size,
      s"y not prunable at small range: ${yq.inputFiles.length}/${files.size}")
    // and the raw key really IS degenerate here (the reason this matters)
    val rawKeys = t.read(spark)
      .select(ZOrderKey.zorder_key(col("x"), col("y"))).distinct().count()
    assert(rawKeys == 1L, s"raw keys should collapse, got $rawKeys distinct")
  }

  test("z-ordered compaction keeps BOTH dimensions prunable") {
    val dir = tmpDir("graft-zorder")
    val schema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false),
      StructField("payload", StringType, nullable = true)))
    val t = GraftTable.create(s"$dir/t", schema)
    // 32x32 grid, row-shuffled so appended files have no locality at all.
    // Values spread over the full positive long range so the top-bits
    // interleave actually discriminates.
    val rng = new scala.util.Random(5)
    val grid = rng.shuffle(
      (for (x <- 0 until 32; y <- 0 until 32)
        yield (x.toLong << 55, y.toLong << 55)).toSeq)
    grid.grouped(256).zipWithIndex.foreach { case (chunk, i) =>
      t.append(spark.createDataFrame(
        spark.sparkContext.parallelize(
          chunk.map { case (x, y) => Row(x, y, s"p$x-$y") }, 1), schema),
        Some(1000L + i))
    }

    t.compact(spark, smallerThanBytes = 1 << 20, Some(9000L),
      zorderBy = Seq("x", "y"), targetFileBytes = Some(2500L))
    val files = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files
    assert(files.size >= 4, s"want a multi-file rewrite, got ${files.size}")

    // a box query on X alone AND one on Y alone must both prune
    val xq = t.scan(spark, Some(col("x") === (5L << 55)))
    val yq = t.scan(spark, Some(col("y") === (5L << 55)))
    assert(xq.count() == 32 && yq.count() == 32)
    assert(xq.inputFiles.length < files.size,
      s"x not prunable: ${xq.inputFiles.length} of ${files.size}")
    assert(yq.inputFiles.length < files.size,
      s"y (second dim!) not prunable: ${yq.inputFiles.length} of ${files.size}")
  }
}
