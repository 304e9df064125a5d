package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Bloom-filter file skipping: point lookups on a high-cardinality key
  * scattered across files (min/max useless) must plan only the files
  * whose manifest bloom admits the probe — and NEVER skip a file that
  * holds a matching row (soundness over every inserted key).
  */
class FileBloomSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tag", StringType, nullable = true)))

  private def mkDf(ids: Seq[Long]) = {
    val rdd = spark.sparkContext.parallelize(
      ids.map(i => Row(i, s"tag-$i")), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Two files with FULLY OVERLAPPING id ranges (evens vs odds over the
    * same span): min/max pruning can never separate them; blooms must. */
  private def mkTable(dir: String): GraftTable = {
    val t = GraftTable.create(s"$dir/t", schema,
      properties = Map(GraftTable.PropBloomColumns -> "id,tag"))
    t.append(mkDf(0L until 2000L by 2), committedAt = Some(1000L))
    t.append(mkDf(1L until 2000L by 2), committedAt = Some(2000L))
    t
  }

  test("point lookup plans only the bloom-admitted file") {
    val dir = tmp("graft-bloom")
    val t = mkTable(dir)
    val all = t.read(spark).inputFiles.length
    assert(all == 2)

    // manifest carries blooms for both columns on every file
    val mf = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(mf.files.forall(f => f.blooms.keySet == Set("id", "tag")),
      mf.files.map(_.blooms.keySet).toString)

    // even id → only the even file (bounds overlap fully, bloom decides);
    // a false positive could keep both, so assert < all over several probes
    val probed = (0L until 40L).map { i =>
      t.scan(spark, Some(col("id") === i)).inputFiles.length
    }
    assert(probed.count(_ == 1) >= 35, s"bloom rarely pruned: $probed")

    // absent key: usually ZERO files planned, and always an empty result
    val absent = t.scan(spark, Some(col("id") === 999999L))
    assert(absent.count() == 0)

    // string column probes prune too
    val sProbe = t.scan(spark, Some(col("tag") === "tag-4"))
    assert(sProbe.inputFiles.length == 1 ||
      sProbe.collect().map(_.getLong(0)).toSeq == Seq(4L))
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("soundness: no inserted key's file is ever skipped") {
    val dir = tmp("graft-bloom-sound")
    val t = mkTable(dir)
    // every key must come back — for all 2000, through the pruned scan
    val missing = (0L until 2000L).filter { i =>
      t.scan(spark, Some(col("id") === i)).count() != 1L
    }
    assert(missing.isEmpty, s"keys lost to pruning: ${missing.take(10)}")
    // IN probes: union semantics (any admitted file kept)
    val in = t.scan(spark, Some(col("id").isin(3L, 999999L)))
    assert(in.collect().map(_.getLong(0)).toSeq == Seq(3L))
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("bloom columns filter: partition/unsupported/unknown columns ignored") {
    val dir = tmp("graft-bloom-cols")
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = true),
      StructField("cat", StringType, nullable = true)))
    val t = GraftTable.create(s"$dir/t", s2,
      properties = Map(
        GraftTable.PropBloomColumns -> "id, score, cat, nope"),
      partitionBy = Seq("cat"))
    // score: double (unsupported), cat: partition, nope: unknown
    assert(t.bloomColumns == Set("id"))
    val rdd = spark.sparkContext.parallelize(
      Seq(Row(1L, 0.5, "a"), Row(2L, 0.7, "b")), 1)
    t.append(spark.createDataFrame(rdd, s2), committedAt = Some(1000L))
    val mf = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(mf.files.forall(_.blooms.keySet == Set("id")))
    assert(t.scan(spark, Some(col("id") === 1L)).count() == 1)
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("multi-row-group files: per-group blooms OR-merge, no key lost") {
    // force several row groups per file via a tiny block size, then check
    // the harvested (merged) bloom still admits keys from EVERY group
    val dir = tmp("graft-bloom-rg")
    locally {
      val t = GraftTable.create(s"$dir/t", schema,
        properties = Map(
          GraftTable.PropBloomColumns -> "id",
          // writer-option passthrough forces tiny row groups
          GraftTable.PropWriteOptionPrefix + "parquet.block.size" -> "16384",
          GraftTable.PropWriteOptionPrefix + "parquet.page.size" -> "4096"))
      // long tags pad row size so 5k rows split into multiple 16KB groups
      val rdd = spark.sparkContext.parallelize(
        (0L until 5000L).map(i => Row(i, "x" * 64 + i)), 1)
      t.append(spark.createDataFrame(rdd, schema), committedAt = Some(1000L))

      val mf = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      assert(mf.files.size == 1)
      // precondition: the file really has several row groups
      val conf = spark.sessionState.newHadoopConf()
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"${t.dir}/${mf.files.head.path}"), conf))
      val nGroups = try reader.getFooter.getBlocks.size finally reader.close()
      assert(nGroups > 1, s"expected multiple row groups, got $nGroups")
      assert(mf.files.head.blooms.contains("id"), "bloom missing after merge")

      // soundness across ALL groups: keys from the start, middle and end
      // of the file (different row groups) must all be found
      for (k <- Seq(0L, 1L, 2499L, 2500L, 4998L, 4999L)) {
        assert(t.scan(spark, Some(col("id") === k)).count() == 1L, s"lost key $k")
      }
    }
  }

  test("compaction rewrites keep blooms; tables without the property get none") {
    val dir = tmp("graft-bloom-compact")
    val t = mkTable(dir)
    t.compact(spark, smallerThanBytes = Long.MaxValue,
      committedAt = Some(3000L))
    val mf = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    assert(mf.files.nonEmpty && mf.files.forall(_.blooms.contains("id")))
    assert(t.scan(spark, Some(col("id") === 7L)).count() == 1)

    val plain = GraftTable.create(s"$dir/plain", schema)
    plain.append(mkDf(Seq(1L, 2L)), committedAt = Some(1000L))
    val pm = Manifest.read(s"${plain.dir}/${plain.log.current.get.manifestList}")
    assert(pm.files.forall(_.blooms.isEmpty))
    GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
