package graft.table

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Type-system round-trips through graft tables, mirroring the reference's
  * SerDe/type fixtures (FIXTURES.md F3; TestIcebergSerDe.java:100-166,
  * TestIcebergSchemaToTypeInfo.java:36-135): maps, lists, all primitives
  * incl. date/binary/decimal, nested map-of-array, struct schemas, and
  * map-of-structs. Stats/pruning only track top-level primitives — scans
  * with predicates on untracked columns must stay conservative (correct).
  */
class TypesSpec extends SparkSpecBase {

  private def roundTrip(name: String, schema: StructType, rows: Row*): Seq[Row] = {
    val dir = tmpDir(s"graft-types-$name")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema), Some(1000L))
    t.read(spark).drop("snapshot__id").collect().toSeq
  }

  test("map<string,string> (F3)") {
    val schema = StructType(Seq(
      StructField("map_type", MapType(StringType, StringType), nullable = false)))
    val out = roundTrip("map", schema, Row(Map("foo" -> "bar")))
    assert(out.head.getMap[String, String](0).toMap == Map("foo" -> "bar"))
  }

  test("array<bigint> (F3)") {
    val schema = StructType(Seq(
      StructField("list_type", ArrayType(LongType), nullable = false)))
    val out = roundTrip("list", schema, Row(Seq(1000L, 2000L, 3000L)))
    assert(out.head.getSeq[Long](0) == Seq(1000L, 2000L, 3000L))
  }

  test("all primitives incl. date, binary, decimal (F3 + §1.4 mapping)") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("b", BooleanType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("dt", DateType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(10, 2))))
    val row = Row("foo", 12, 3000L, true, 3.01f, 3.0,
      Date.valueOf("1998-11-13"), Array[Byte](1, 2, 3),
      new java.math.BigDecimal("12345.67"))
    val out = roundTrip("prims", schema, row)
    val got = out.head
    assert(got.getString(0) == "foo" && got.getInt(1) == 12 &&
      got.getLong(2) == 3000L && got.getBoolean(3))
    assert(got.getDate(6) == Date.valueOf("1998-11-13"))
    assert(got.getAs[Array[Byte]](7).toSeq == Seq[Byte](1, 2, 3))
    assert(got.getDecimal(8) == new java.math.BigDecimal("12345.67"))
  }

  test("nested map<string, array<bigint>> (F3)") {
    val schema = StructType(Seq(
      StructField("m", MapType(StringType, ArrayType(LongType)), nullable = false)))
    val out = roundTrip("nestedmap", schema, Row(Map("foo" -> Seq(1000L, 2000L, 3000L))))
    assert(out.head.getMap[String, scala.collection.Seq[Long]](0)("foo").toSeq ==
      Seq(1000L, 2000L, 3000L))
  }

  test("complex struct schema (F3 complex)") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("data", StringType),
      StructField("preferences", StructType(Seq(
        StructField("feature1", BooleanType, nullable = false),
        StructField("feature2", BooleanType)))),
      StructField("doubles", ArrayType(DoubleType), nullable = false),
      StructField("properties", MapType(StringType, StringType))))
    val out = roundTrip("complex", schema,
      Row(1, "x", Row(true, null), Seq(1.0, 2.0), Map("k" -> "v")))
    val got = out.head
    assert(got.getStruct(2).getBoolean(0))
    assert(got.getStruct(2).isNullAt(1))
    assert(got.getSeq[Double](3) == Seq(1.0, 2.0))
  }

  test("map of structs (F3 locations)") {
    val key = StructType(Seq(
      StructField("address", StringType), StructField("city", StringType),
      StructField("state", StringType), StructField("zip", IntegerType)))
    val value = StructType(Seq(
      StructField("lat", FloatType), StructField("long", FloatType)))
    val schema = StructType(Seq(
      StructField("locations", MapType(key, value), nullable = false)))
    val out = roundTrip("mapstruct", schema,
      Row(Map(Row("1 Main St", "Springfield", "OR", 97477) -> Row(44.04f, -123.02f))))
    val m = out.head.getMap[Row, Row](0)
    assert(m.head._1.getString(1) == "Springfield")
    assert(m.head._2.getFloat(0) == 44.04f)
  }

  test("decimal pruning: unscaled parquet stats are rescaled (regression)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DecimalType(10, 2), nullable = false)))
    val dir = tmpDir("graft-dec-prune")
    val t = GraftTable.create(s"$dir/t", schema)
    def df(rows: (Long, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1, new java.math.BigDecimal(r._2))), 1), schema)
    // two files with disjoint decimal ranges
    t.append(df(1L -> "12345.67", 2L -> "19999.99"), Some(1000L))
    t.append(df(3L -> "23456.78", 4L -> "29999.99"), Some(2000L))

    // manifest stats must be SCALED decimals, not raw unscaled longs
    val manifest = Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
    val mins = manifest.files.flatMap(_.stats.get("amount")).flatMap(_.min)
    assert(mins.toSet == Set("12345.67", "23456.78"), s"raw stats: $mins")

    // equality scan returns the matching row (pre-fix: pruned everything)
    val hit = t.scan(spark,
      Some(col("amount") === new java.math.BigDecimal("12345.67")))
    assert(hit.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // and actually prunes the non-matching file
    val expr = GraftTable.resolveAgainst(spark, schema,
      org.apache.spark.sql.classic.GraftBridge.expr(
        col("amount") === new java.math.BigDecimal("12345.67")))
    val kept = manifest.files.filter(f => Pruning.mayMatch(expr, f.stats, schema))
    assert(kept.size == 1)
  }

  test("string pruning uses UTF-8 byte order — emoji beyond U+FFFD (regression)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false)))
    val dir = tmpDir("graft-utf8-prune")
    val t = GraftTable.create(s"$dir/t", schema)
    val rows = Seq(Row(1L, "�"), Row(2L, "😀")) // U+FFFD, 😀
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema), Some(1000L))

    // UTF-16 order sorts 😀 below U+FFFD; UTF-8 byte order (parquet's stat
    // order) sorts it above — the pre-fix compare pruned the file
    val hit = t.scan(spark, Some(col("s") === "😀"))
    assert(hit.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(ColumnStats.compare("😀", "�").exists(_ > 0))
  }

  test("filters on nested/untracked columns stay conservative and correct") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType), nullable = false),
      StructField("meta", StructType(Seq(StructField("score", DoubleType))))))
    val dir = tmpDir("graft-types-filter")
    val t = GraftTable.create(s"$dir/t", schema)
    def df(rows: Row*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    t.append(df(Row(1L, Seq("a", "b"), Row(0.5)),
      Row(2L, Seq("c"), Row(0.9))), Some(1000L))
    t.append(df(Row(10L, Seq("a"), Row(0.1))), Some(2000L))

    // predicate on a nested field: no stats → both files scanned, result exact
    val hi = t.scan(spark, Some(col("meta.score") > 0.4))
    assert(hi.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // array_contains: unsupported shape for pruning → conservative, correct
    val tagged = t.scan(spark, Some(array_contains(col("tags"), "a")))
    assert(tagged.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 10L))
    // while a tracked top-level predicate still prunes alongside
    val combo = t.scan(spark,
      Some(col("id") >= 10L && array_contains(col("tags"), "a")))
    assert(combo.select("id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("user schema already containing snapshot__id + renamed virtual column (F5)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("snapshot__id", LongType, nullable = false)))
    val dir = tmpDir("graft-types-vcol")
    val t = GraftTable.create(s"$dir/t", schema,
      Map(GraftTable.PropVirtualColumnName -> "metadata_snapshot_id"))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 42L)), 1), schema), Some(1000L))
    val out = t.read(spark)
    assert(out.columns.toSeq == Seq("id", "snapshot__id", "metadata_snapshot_id"))
    val r = out.collect().head
    assert(r.getLong(1) == 42L) // user column preserved
    assert(r.getLong(2) == 1L)  // virtual column from the scan
  }
}
