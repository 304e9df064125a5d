package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import org.apache.spark.sql.classic.GraftBridge

/** Hidden partitioning (Iceberg partition transforms): the layout is keyed
  * by bucket(N, c) / days(c) / truncate(W, c) while queries filter the
  * SOURCE column — [[PartitionField.augment]] maps source conjuncts to
  * directory-value conjuncts, so point lookups read 1/N of a bucketed
  * table and time ranges read their slice, with the source column still a
  * normal data column in the files. */
class HiddenPartitioningSpec extends SparkSpecBase {

  private def keep(t: GraftTable, pred: org.apache.spark.sql.Column) = {
    val resolved = GraftTable.resolveAgainst(spark, t.schema,
      GraftBridge.expr(pred))
    val m = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    m.files.filter(t.pruneKeep(resolved))
  }

  private def allFiles(t: GraftTable) =
    Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}").files

  private val idSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  test("bucket(N, id): point lookup prunes to one bucket, parity kept") {
    val dir = tmpDir("hp-bucket")
    val t = GraftTable.create(dir, idSchema, partitionBy = Seq("bucket(4,id)"))
    val rows = (0L until 64L).map(i => Row(i, s"v$i"))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), idSchema), Some(1000L))

    val files = allFiles(t)
    assert(files.map(_.partition.keySet).distinct == Seq(Set("id_bucket")),
      "layout must be keyed by the derived bucket field")
    assert(files.map(_.partition("id_bucket")).distinct.size == 4,
      "64 sequential ids must spread over all 4 buckets")

    // equality on the SOURCE column prunes to exactly one bucket's files
    val kept = keep(t, col("id") === 17L)
    assert(kept.nonEmpty && kept.size < files.size)
    val bucketOf17 = kept.map(_.partition("id_bucket")).distinct
    assert(bucketOf17.size == 1)

    // and the scan still answers correctly (residual filter applies)
    val got = t.scan(spark, Some(col("id") === 17L))
      .select("id", "v").collect().toSeq
    assert(got == Seq(Row(17L, "v17")))

    // IN lists prune to the union of their buckets
    val keptIn = keep(t, col("id").isin(1L, 2L, 3L))
    assert(keptIn.map(_.partition("id_bucket")).distinct.size <= 3)
    assert(t.scan(spark, Some(col("id").isin(1L, 2L, 3L))).count() == 3)
  }

  test("bucket pruning soundness sweep: no matching row is ever lost") {
    val dir = tmpDir("hp-sound")
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = true),
      StructField("x", IntegerType, nullable = false)))
    val t = GraftTable.create(dir, schema, partitionBy = Seq("bucket(8,k)"))
    val rows = (0 until 200).map(i =>
      Row(if (i % 17 == 0) null else s"key_${i % 43}", i))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema), Some(1000L))

    (0 until 43).foreach { i =>
      val key = s"key_$i"
      val expect = rows.count(r => r.get(0) == key)
      val got = t.scan(spark, Some(col("k") === key)).count()
      assert(got == expect, s"lost rows for $key: $got != $expect")
    }
    // null-keyed rows are untouched by the transform mapping
    assert(t.scan(spark, Some(col("k").isNull)).count() ==
      rows.count(_.get(0) == null))
  }

  test("days(ts): range predicates on the timestamp prune day slices") {
    val dir = tmpDir("hp-days")
    val schema = StructType(Seq(
      StructField("ts", TimestampType, nullable = true),
      StructField("n", LongType, nullable = false)))
    val t = GraftTable.create(dir, schema, partitionBy = Seq("days(ts)"))
    val day0 = 1700000000000L - (1700000000000L % 86400000L) // UTC midnight
    val rows = (0 until 96).map { i =>
      Row(new Timestamp(day0 + i * 3600_000L), i.toLong) // 4 days hourly
    }
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), Some(1000L))

    val files = allFiles(t)
    assert(files.map(_.partition("ts_day")).distinct.size == 4)

    val cut = new Timestamp(day0 + 2 * 86400_000L + 5 * 3600_000L) // day 2, 05:00
    val kept = keep(t, col("ts") >= lit(cut))
    val keptDays = kept.flatMap(_.partition("ts_day")).map(_.toInt).distinct.sorted
    val allDays = files.flatMap(_.partition("ts_day")).map(_.toInt).distinct.sorted
    assert(keptDays == allDays.drop(2),
      s"ts >= day2 05:00 must keep days 2..3 only (kept $keptDays of $allDays)")

    val got = t.scan(spark, Some(col("ts") >= lit(cut))).count()
    assert(got == rows.count(_.getAs[Timestamp](0).getTime >= cut.getTime))

    // a null timestamp lands in the null partition and survives scans;
    // `ts IS NULL` prunes to just that partition's file (days() is
    // null-propagating, unlike bucket)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, 999L)), 1), schema),
      Some(2000L))
    assert(t.read(spark).filter(col("ts").isNull).count() == 1)
    val keptNull = keep(t, col("ts").isNull)
    assert(keptNull.size == 1 && keptNull.head.partition("ts_day").isEmpty,
      s"IS NULL must keep only the null-partition file, kept $keptNull")
  }

  test("years/months/hours: the coarser time units derive and prune") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType, nullable = true),
      StructField("n", LongType, nullable = false)))
    val mk = (i: Int) => // one row per week over ~2 years
      Row(new Timestamp(1600000000000L + i.toLong * 7 * 86400_000L), i.toLong)
    val rows = (0 until 104).map(mk)
    def build(spec: String, name: String): GraftTable = {
      val t = GraftTable.create(tmpDir(name), schema, partitionBy = Seq(spec))
      t.append(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema), Some(1000L))
      t
    }
    val cut = new Timestamp(1600000000000L + 52L * 7 * 86400_000L)

    val ty = build("years(ts)", "hp-years")
    assert(allFiles(ty).flatMap(_.partition("ts_year")).distinct.size >= 2)
    val keptY = keep(ty, col("ts") >= lit(cut))
    assert(keptY.size < allFiles(ty).size)
    assert(ty.scan(spark, Some(col("ts") >= lit(cut))).count() ==
      rows.count(_.getAs[Timestamp](0).getTime >= cut.getTime))

    val tm = build("months(ts)", "hp-months")
    assert(allFiles(tm).flatMap(_.partition("ts_month")).distinct.size >= 20)
    val keptM = keep(tm, col("ts") >= lit(cut))
    assert(keptM.size <= allFiles(tm).size / 2 + 1)
    assert(tm.scan(spark, Some(col("ts") >= lit(cut))).count() ==
      rows.count(_.getAs[Timestamp](0).getTime >= cut.getTime))

    val th = build("hours(ts)", "hp-hours")
    val one = rows(10).getAs[Timestamp](0)
    val keptH = keep(th, col("ts") === lit(one))
    assert(keptH.size == 1, s"hour equality must keep one slice, kept $keptH")
    assert(th.scan(spark, Some(col("ts") === lit(one))).count() == 1)
  }

  test("truncate(W, s): prefix equality and ranges prune") {
    val dir = tmpDir("hp-trunc")
    val schema = StructType(Seq(
      StructField("s", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    val t = GraftTable.create(dir, schema, partitionBy = Seq("truncate(2,s)"))
    val rows = for (p <- Seq("aa", "ab", "ba", "bb"); i <- 0 until 8)
      yield Row(s"$p-suffix-$i", i.toLong)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema), Some(1000L))

    assert(allFiles(t).flatMap(_.partition("s_trunc")).distinct.sorted ==
      Seq("aa", "ab", "ba", "bb"))

    val kept = keep(t, col("s") === "ab-suffix-3")
    assert(kept.flatMap(_.partition("s_trunc")).distinct == Seq("ab"))
    assert(t.scan(spark, Some(col("s") === "ab-suffix-3")).count() == 1)

    val keptRange = keep(t, col("s") >= "b")
    assert(keptRange.flatMap(_.partition("s_trunc")).distinct.sorted ==
      Seq("ba", "bb"))
  }

  test("spec evolution onto a transform: identity era + bucket era") {
    val dir = tmpDir("hp-evo")
    val nation = spark.read.parquet(sf("nation"))
    val t0 = GraftTable.create(dir, nation.schema,
      partitionBy = Seq("n_regionkey"))
    t0.append(nation.filter(col("n_nationkey") < 12), Some(1000L))
    val t1 = t0.updatePartitionSpec(Seq("bucket(4,n_nationkey)"))
    t1.append(nation.filter(col("n_nationkey") >= 12), Some(2000L))

    val got = t1.read(spark).drop("snapshot__id")
      .orderBy("n_nationkey").collect().map(_.toSeq)
    val want = nation.orderBy("n_nationkey").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)

    // a point lookup in the bucketed era prunes its files; identity-era
    // files prune by their own footer/partition stats
    val all = allFiles(t1)
    val kept = keep(t1, col("n_nationkey") === 20)
    assert(kept.size < all.size)
  }

  test("copy-on-write DML respects transform layouts") {
    val dir = tmpDir("hp-dml")
    val t = GraftTable.create(dir, idSchema, partitionBy = Seq("bucket(4,id)"))
    val rows = (0L until 32L).map(i => Row(i, s"v$i"))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), idSchema), Some(1000L))

    // updating the SOURCE of a transform is refused like an identity col
    intercept[IllegalArgumentException] {
      t.update(spark, col("v") === "v3", Map("id" -> lit(999L)))
    }
    // updating a data column rewrites within the layout
    t.update(spark, col("id") === 3L, Map("v" -> lit("patched")), Some(2000L))
    assert(t.read(spark).filter(col("id") === 3L)
      .select("v").head().getString(0) == "patched")
    t.delete(spark, col("id") === 4L, Some(3000L))
    assert(t.read(spark).count() == 31)
    assert(allFiles(t).map(_.partition.keySet).distinct == Seq(Set("id_bucket")))
  }

  test("deleting a whole day slice under days(ts) drops files metadata-only") {
    val dir = tmpDir("hp-dropday")
    val schema = StructType(Seq(
      StructField("ts", TimestampType, nullable = true),
      StructField("n", LongType, nullable = false)))
    val t = GraftTable.create(dir, schema, partitionBy = Seq("days(ts)"))
    val day0 = 1700000000000L - (1700000000000L % 86400000L)
    val rows = (0 until 96).map { i =>
      Row(new Timestamp(day0 + i * 3600_000L), i.toLong)
    }
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema), Some(1000L))
    // the retention sweep: everything before day 1 goes — the footer ts
    // bounds PROVE each day-0 file all-matches, so the delete is a
    // manifest edit (zero rewrite), the 100 TB retention pattern
    val cut = new Timestamp(day0 + 86400_000L)
    val snap = t.delete(spark, col("ts") < lit(cut), Some(2000L)).get
    assert(snap.summary("dropped-data-files").toInt >= 1)
    assert(snap.summary("rewritten-data-files") == "0")
    assert(snap.summary("deleted-records") == "24")
    assert(t.read(spark).count() == 72)
    assert(t.read(spark).filter(col("ts") < lit(cut)).count() == 0)
  }

  test("streaming micro-batch appends land in the transform layout") {
    val dir = tmpDir("hp-stream")
    val t = GraftTable.create(dir, idSchema, partitionBy = Seq("bucket(4,id)"))
    // two micro-batches through the exactly-once streaming commit path
    val b0 = (0L until 8L).map(i => Row(i, s"v$i"))
    val b1 = (8L until 16L).map(i => Row(i, s"v$i"))
    assert(t.appendStreamBatch(spark.createDataFrame(
      spark.sparkContext.parallelize(b0, 1), idSchema), "sink", 0L,
      Some(1000L)).isDefined)
    assert(t.appendStreamBatch(spark.createDataFrame(
      spark.sparkContext.parallelize(b1, 1), idSchema), "sink", 1L,
      Some(2000L)).isDefined)
    // re-delivery of batch 1 is dropped (cursor), layout stays bucketed
    assert(t.appendStreamBatch(spark.createDataFrame(
      spark.sparkContext.parallelize(b1, 1), idSchema), "sink", 1L,
      Some(3000L)).isEmpty)
    assert(allFiles(t).nonEmpty &&
      allFiles(t).forall(_.partition.keySet == Set("id_bucket")))
    assert(t.read(spark).count() == 16)
    assert(keep(t, col("id") === 11L).size < allFiles(t).size)
  }

  test("bad transform specs are rejected at create") {
    intercept[IllegalArgumentException] {
      GraftTable.create(tmpDir("hp-bad1"), idSchema,
        partitionBy = Seq("bucket(0,id)"))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(tmpDir("hp-bad2"), idSchema,
        partitionBy = Seq("days(id)")) // not a date/timestamp
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(tmpDir("hp-bad3"), idSchema,
        partitionBy = Seq("truncate(2,id)")) // not a string
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(tmpDir("hp-bad4"), idSchema,
        partitionBy = Seq("bucket(4,nope)"))
    }
  }
}
