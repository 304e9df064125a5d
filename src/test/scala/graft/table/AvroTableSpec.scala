package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Mixed-format versioned tables: parquet and avro data files in ONE
  * table, dispatched per file at scan time (the IcebergReaderFactory
  * behavior the reference builds its whole reader factory around).
  */
class AvroTableSpec extends SparkSpecBase {

  private def freshTable(prefix: String): GraftTable = {
    val dir = tmpDir(prefix)
    val region = spark.read.parquet(sf("region"))
    GraftTable.create(s"$dir/t", region.schema)
  }

  private def region = spark.read.parquet(sf("region"))

  test("parquet snapshot + avro snapshot read as one table, tagged correctly") {
    val tbl = freshTable("avro_mixed")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))

    val latest = tbl.read(spark)
    assert(latest.count() == 10)
    // every row is visible at snapshot 2; keys 0-4 parquet, 10-14 avro
    val keys = latest.select("r_regionkey").collect()
      .map(_.getAs[Number](0).longValue).sorted
    assert(keys.toSeq == Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 14L))
    assert(latest.select("snapshot__id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("time travel isolates the parquet-only snapshot") {
    val tbl = freshTable("avro_tt")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))
    val snap1 = tbl.read(spark, snapshotId = Some(1L))
    assert(snap1.count() == 5)
    assert(snap1.agg(max(col("r_regionkey"))).head().getAs[Number](0).longValue == 4L)
  }

  test("predicates stay correct: avro files are kept conservatively, parquet pruned") {
    val tbl = freshTable("avro_prune")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))
    // predicate selects only avro-side keys; parquet min/max prunes its
    // files, the avro file (no stats) is scanned and filtered by Spark
    val out = tbl.scan(spark, filter = Some(col("r_regionkey") >= 10))
    assert(out.count() == 5)
    // and a parquet-side predicate still answers over the mixed table
    val out2 = tbl.scan(spark, filter = Some(col("r_regionkey") < 3))
    assert(out2.count() == 3)
  }

  test("manifest record counts are exact for avro files (metadata-only count)") {
    val tbl = freshTable("avro_meta")
    tbl.appendAvro(region, committedAt = Some(1000L))
    val m = Manifest.read(
      s"${tbl.dir}/${tbl.log.current.get.manifestList}")
    assert(m.totalRecords == 5L)
    assert(m.files.forall(_.path.endsWith(".avro")))
    assert(m.files.forall(_.stats.isEmpty))
  }

  test("compaction rewrites a mixed table to parquet with identical rows") {
    val tbl = freshTable("avro_compact")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))
    val before = tbl.read(spark).drop("snapshot__id")
      .collect().map(_.toSeq).toSet
    tbl.compact(spark, smallerThanBytes = Long.MaxValue,
      committedAt = Some(3000L))
    val after = tbl.read(spark)
    assert(after.select("snapshot__id").distinct().head().getLong(0) == 3L)
    assert(after.drop("snapshot__id").collect().map(_.toSeq).toSet == before)
    val m = Manifest.read(s"${tbl.dir}/${tbl.log.current.get.manifestList}")
    assert(m.files.forall(_.path.endsWith(".parquet")))
  }

  test("changes() sees rows appended via avro") {
    val tbl = freshTable("avro_changes")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))
    val delta = tbl.changes(spark, fromSnapshotId = 1L)
    assert(delta.count() == 5)
    assert(delta.agg(min(col("r_regionkey"))).head().getAs[Number](0).longValue == 10L)
  }

  test("DELETE rewrites across formats: avro candidates become parquet") {
    val tbl = freshTable("avro_delete")
    tbl.append(region, committedAt = Some(1000L))
    tbl.appendAvro(region.withColumn("r_regionkey", col("r_regionkey") + 10),
      committedAt = Some(2000L))
    // predicate hits one avro-side key; avro files carry no stats so they
    // are always rewrite candidates (conservative), parquet files with
    // non-matching bounds are untouched
    tbl.delete(spark, col("r_regionkey") === 12, committedAt = Some(3000L))
    val out = tbl.read(spark)
    assert(out.count() == 9)
    assert(!out.select("r_regionkey").collect()
      .exists(_.getAs[Number](0).longValue == 12L))
  }

  test("schema evolution over avro files: added column null-fills on read") {
    val tbl = freshTable("avro_evo")
    tbl.appendAvro(region, committedAt = Some(1000L))
    val evolved = tbl.addColumn("score",
      org.apache.spark.sql.types.DoubleType)
    // the avro writer schema lacks `score`; the table schema must still
    // drive every read (parquet-branch parity: null-fill, not an
    // unresolved-column failure)
    val out = evolved.read(spark)
    assert(out.count() == 5)
    assert(out.filter(col("score").isNull).count() == 5)
    // post-evolution parquet rows coexist with pre-evolution avro rows
    evolved.append(
      region.withColumn("r_regionkey", col("r_regionkey") + 10)
        .withColumn("score", lit(1.5)),
      committedAt = Some(2000L))
    val all = evolved.read(spark)
    assert(all.count() == 10)
    assert(all.filter(col("score") === 1.5).count() == 5)
    assert(all.filter(col("score").isNull).count() == 5)
  }

  test("appendAvro refuses partitioned tables and non-roundtrippable schemas") {
    val dir = tmpDir("avro_refuse")
    val nation = spark.read.parquet(sf("nation"))
    val part = GraftTable.create(s"$dir/p", nation.schema,
      partitionBy = Seq("n_regionkey"))
    intercept[IllegalArgumentException] {
      part.appendAvro(nation)
    }
  }
}
