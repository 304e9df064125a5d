package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source and sink built directly on avro-core (the
  * `spark-avro` DataSource jar is not shipped in this environment, but the
  * Avro codec itself is — `avro-1.12.1.jar` on the unmanaged classpath).
  * Covers SURVEY §2.1 S5, the reference's Avro read path
  * (IcebergReaderFactory.java:54-65, which delegates to Iceberg's Avro
  * value readers the same way this delegates to GenericDatumReader).
  *
  * Scale design: the DRIVER touches only file NAMES and one file HEADER
  * (the writer schema); record decoding happens in `mapPartitions` with
  * one task per file, and writes happen in `mapPartitions` with one
  * container file per input partition — no row ever crosses the driver.
  * Avro is a row-oriented format, so column pruning can only skip
  * per-field CONVERSION, not IO; `read(columns = …)` does exactly that.
  * Filters are applied by Catalyst on top (same residual-filter behavior
  * as the reference's Hive integration, which also decodes then filters).
  */
object AvroSource {

  // ---------------- schema mapping ----------------

  /** Avro writer schema → Spark schema. Unions of [null, T] map to a
    * nullable T; logical date / timestamp-micros map to Spark date /
    * timestamp; enum and fixed map to string / binary. */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      logicalName(s) match {
        case Some("date") => DateType
        case Some(other) => throw new UnsupportedOperationException(
          s"unsupported avro logical type $other over int (surfacing the " +
            "raw int would silently drop its semantics)")
        case None => IntegerType
      }
    case Schema.Type.LONG =>
      logicalName(s) match {
        case Some("timestamp-micros") => TimestampType
        case Some(other) => throw new UnsupportedOperationException(
          s"unsupported avro logical type $other over long (surfacing the " +
            "raw long would silently drop its semantics)")
        case None => LongType
      }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      logicalName(s) match {
        case Some("decimal") => throw new UnsupportedOperationException(
          "unsupported avro logical type decimal (surfacing raw bytes " +
            "would silently drop scale/precision)")
        case _ => BinaryType
      }
    case Schema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType),
        containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType),
        valueContainsNull = isNullable(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name(), toSparkType(f.schema()), nullable = isNullable(f.schema()))))
    case Schema.Type.UNION => toSparkType(nonNullBranch(s))
    case other => throw new UnsupportedOperationException(s"avro type $other")
  }

  private def logicalName(s: Schema): Option[String] =
    Option(s.getLogicalType).map(_.getName)

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1, s"only [null, T] unions are supported: $s")
    branches.head
  }

  /** Spark schema → Avro record schema (nullable fields become
    * [null, T] unions), for the writer side. */
  def toAvroSchema(st: StructType, name: String = "spark_record"): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType, s"${name}_${f.name}")
      val sch =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val e = toAvroType(et, s"${name}_item")
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, s"${name}_value")
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), v) else v)
    case st: StructType => toAvroSchema(st, name)
    case other => throw new UnsupportedOperationException(s"spark type $other")
  }

  // ---------------- value conversion ----------------

  private def toSpark(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map(f => toSpark(r.get(f.name), f.dataType)).toSeq)
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.map(toSpark(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> toSpark(mv, vt) }.toMap
    case (x, _) => x // primitives pass through
  }

  private def toAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = if (s.getType == Schema.Type.UNION) nonNullBranch(s) else s
    v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case t: java.sql.Timestamp =>
        t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
      case t: java.time.Instant =>
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
      case r: Row =>
        val rec = new GenericData.Record(sch)
        sch.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name(), toAvro(r.get(i), f.schema()))
        }
        rec
      case seq: scala.collection.Seq[_] =>
        new GenericData.Array(sch, seq.map(toAvro(_, sch.getElementType)).asJava)
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, mv) => k.toString -> toAvro(mv, sch.getValueType) }.asJava
      case x => x
    }
  }

  // ---------------- read ----------------

  /** Read a directory of `.avro` container files (or one file) into a
    * DataFrame. `columns` prunes per-field conversion (Avro rows are
    * decoded whole — row format — but unrequested fields skip the
    * Avro→Spark value conversion). */
  def read(spark: SparkSession, path: String, columns: Seq[String] = Nil): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
      else Seq(path)
    readFiles(spark, files, columns)
  }

  /** Read an explicit list of `.avro` container files (all written with
    * the same schema) — the entry point table scans use after manifest
    * pruning picked the file list. */
  def readFiles(
      spark: SparkSession,
      files: Seq[String],
      columns: Seq[String] = Nil,
      targetSchema: Option[StructType] = None): DataFrame = {
    require(files.nonEmpty, "no .avro files to read")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(files.head).getFileSystem(conf)

    // driver reads ONE header for the writer schema — no records
    val writerSchema = {
      val in = fs.open(new Path(files.head))
      try {
        val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        try s.getSchema finally s.close()
      } finally {
        // DataFileStream.close() already closed `in` on the happy path;
        // FSDataInputStream close is idempotent, and this covers a
        // constructor failure (corrupt header) leaking the handle
        try in.close() catch { case _: Exception => () }
      }
    }
    val fullStruct = toSparkType(writerSchema).asInstanceOf[StructType]
    // target-schema projection (schema evolution): fields absent from the
    // writer schema surface as NULL columns, mirroring the parquet
    // branch's `spark.read.schema(tableSchema)` null-fill — without it an
    // evolved mixed-format table would be unreadable (the table-side
    // select would hit an unresolved column)
    val struct = targetSchema match {
      case Some(ts) => ts
      case None =>
        if (columns.isEmpty) fullStruct
        else StructType(columns.map(c => fullStruct(fullStruct.fieldIndex(c))))
    }
    val writerFields = fullStruct.fieldNames.toSet
    val schemaJson = writerSchema.toString
    val serConf = new SerializableConfiguration(conf)
    val structFields = struct.fields.map(f => (f.name, f.dataType))
    val writerHas = writerFields

    val rdd = spark.sparkContext.parallelize(files, files.size)
      .mapPartitions { it =>
        val hconf = serConf.value
        val reader = new GenericDatumReader[GenericRecord](
          new Schema.Parser().parse(schemaJson))
        it.flatMap { file =>
          val fp = new Path(file)
          val in = fp.getFileSystem(hconf).open(fp)
          val stream =
            try new DataFileStream(in, reader)
            catch { case e: Throwable => // corrupt header: close the handle
              try in.close() catch { case _: Exception => () }
              throw e
            }
          // a limit/take downstream may abandon the iterator mid-file;
          // the task-completion hook closes the handle regardless
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
            try stream.close() catch { case _: Exception => () }
          }
          new Iterator[Row] {
            def hasNext: Boolean = {
              val h = stream.hasNext
              if (!h) stream.close()
              h
            }
            def next(): Row = {
              val rec = stream.next()
              Row.fromSeq(structFields.map { case (n, dt) =>
                if (!writerHas.contains(n)) null // evolved column: null-fill
                else toSpark(rec.get(n), dt)
              }.toSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd, struct)
  }

  /** Exact record count of one container file WITHOUT decoding records:
    * every Avro block header carries its object count, so this walks
    * block headers only (the manifest-stats analog of a parquet footer
    * read). */
  def countRecords(file: String, conf: Configuration): Long = {
    val p = new Path(file)
    val in = p.getFileSystem(conf).open(p)
    val stream =
      try new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      catch { case e: Throwable => // corrupt header: don't leak the handle
        try in.close() catch { case _: Exception => () }
        throw e
      }
    try {
      var n = 0L
      while (stream.hasNext) {
        n += stream.getBlockCount
        stream.nextBlock()
      }
      n
    } finally stream.close()
  }

  // ---------------- write ----------------

  /** Write `df` as Avro container files, one per partition, decoding
    * nothing on the driver. Returns the output directory. */
  def write(df: DataFrame, path: String): String = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val avroSchema = toAvroSchema(df.schema)
    val schemaJson = avroSchema.toString
    val serConf = new SerializableConfiguration(conf)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    // clear previous part files: a later write with FEWER partitions must
    // not leave the earlier write's tail visible to readers (silent row
    // duplication). Callers wanting atomicity still stage + move
    // (appendAvro does) — this guards the direct-path users.
    Option(fs.globStatus(new Path(dir, "part-*.avro")))
      .getOrElse(Array.empty).foreach(st => fs.delete(st.getPath, false))

    df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.hasNext) {
        val sch = new Schema.Parser().parse(schemaJson)
        val out = new Path(f"$path/part-$i%05d.avro")
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
        val os = out.getFileSystem(serConf.value).create(out, true)
        var created = false
        try {
          w.create(sch, os)
          created = true
          it.foreach { row =>
            w.append(toAvro(row, sch).asInstanceOf[GenericRecord])
          }
        } finally {
          // w.close() closes os once create() succeeded; before that the
          // raw stream (and its 0-byte file) is ours to clean up
          if (created) w.close() else os.close()
        }
        Iterator.single(out.toString)
      } else Iterator.empty
    }.collect() // file NAMES only — bounded by partition count
    path
  }

  /** Minimal serializable Hadoop-conf carrier (Spark's own is private). */
  private class SerializableConfiguration(@transient var value: Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      value = new Configuration(false)
      value.readFields(in)
    }
  }
}
