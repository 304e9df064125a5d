package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Avro source/sink round-trips: every supported type survives
  * write → read bit-exactly, nulls ride [null, T] unions, the reader is
  * partition-parallel (one task per container file), and column pruning
  * skips conversion of unrequested fields.
  */
class AvroSourceSpec extends SparkSpecBase {

  private lazy val typed = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType),
      StructField("small", IntegerType),
      StructField("ratio", DoubleType),
      StructField("ratio_f", FloatType),
      StructField("name", StringType),
      StructField("payload", BinaryType),
      StructField("born", DateType),
      StructField("seen", TimestampType),
      StructField("tags", ArrayType(StringType)),
      StructField("props", MapType(StringType, LongType)),
      StructField("nested", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val rows = Seq(
      Row(1L, true, 7, 2.5, 1.25f, "alpha", Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2020-02-29"),
        java.sql.Timestamp.valueOf("2021-06-01 12:34:56.789"),
        Seq("x", "y"), Map("k" -> 9L), Row(5L, "in")),
      Row(2L, null, null, null, null, null, null, null, null,
        null, null, null),
      Row(3L, false, -1, -0.5, 0f, "", Array.emptyByteArray,
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Seq(), Map(), Row(null, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("all supported types round-trip write -> read exactly") {
    val dir = tmpDir("avro_rt")
    AvroSource.write(typed, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      typed.schema.fields.map(f => f.name -> f.dataType).toSeq)
    val a = typed.orderBy("id").collect().map(normalize)
    val b = back.orderBy("id").collect().map(normalize)
    assert(a.toSeq == b.toSeq)
  }

  private def normalize(r: Row): Seq[Any] = r.toSeq.map {
    case bytes: Array[Byte] => bytes.toSeq
    case row: Row => normalize(row)
    case x => x
  }

  test("reader is partition-parallel: one task per container file") {
    val dir = tmpDir("avro_par")
    AvroSource.write(typed.repartition(2), dir)
    val back = AvroSource.read(spark, dir)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.count() == 3)
  }

  test("column pruning returns only requested fields") {
    val dir = tmpDir("avro_prune")
    AvroSource.write(typed, dir)
    val back = AvroSource.read(spark, dir, columns = Seq("name", "id"))
    assert(back.columns.toSeq == Seq("name", "id"))
    assert(back.filter(col("id") === 1L).select("name").head().getString(0)
      == "alpha")
  }

  test("catalyst plans filters/aggregates on top of the avro scan") {
    val dir = tmpDir("avro_sql")
    AvroSource.write(typed, dir)
    val back = AvroSource.read(spark, dir)
    back.createOrReplaceTempView("avro_t")
    val out = spark.sql(
      "SELECT count(*) AS n FROM avro_t WHERE flag = true").head().getLong(0)
    assert(out == 1L)
  }
}
