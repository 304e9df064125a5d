package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** `write.format = parquet | orc | avro` (the Iceberg
  * `write.format.default` analog): every data-file write path — append,
  * copy-on-write DML rewrites, compaction — emits the table's declared
  * format, so an imported ORC/Avro estate stays in its format under DML.
  * Reads dispatch per FILE (a format switch mid-table just makes it
  * mixed); non-parquet entries carry exact record counts but no footer
  * stats (conservative keeps); positional MoR auto-routes to the
  * format-agnostic deferred forms (predicate / equality) — only the
  * position-PAIR form refuses, naming the working spelling. */
class WriteFormatSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-wfmt").toString

  private def dataFiles(dir: String): Seq[String] = {
    val p = java.nio.file.Paths.get(s"$dir/data")
    if (!java.nio.file.Files.exists(p)) return Nil
    scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
      val b = Seq.newBuilder[String]
      st.iterator().forEachRemaining(x =>
        if (java.nio.file.Files.isRegularFile(x)) b += x.toString)
      b.result()
    }
  }

  private def rows(t: GraftTable): Map[Long, String] =
    t.read(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("write.format=orc: append + CoW DML + compact all stay ORC; counts exact") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema,
      properties = Map(GraftTable.PropWriteFormat -> "orc"))
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    assert(dataFiles(dir).nonEmpty && dataFiles(dir).forall(_.endsWith(".orc")),
      dataFiles(dir).mkString(","))
    assert(rows(t) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // manifest record counts are exact without footer stats
    val m = Manifest.read(s"$dir/${t.log.current.get.manifestList}")
    assert(m.totalRecords == 3L)
    // CoW delete and update rewrite in ORC
    t.delete(spark, col("id") === 2L, Some(2000L))
    t.update(spark, col("id") === 3L, Map("data" -> lit("C")), Some(3000L))
    assert(rows(t) == Map(1L -> "a", 3L -> "C"))
    assert(dataFiles(dir).forall(_.endsWith(".orc")))
    // compaction repacks in ORC; reads unchanged
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    assert(rows(t) == Map(1L -> "a", 3L -> "C"))
    assert(dataFiles(dir).forall(_.endsWith(".orc")))
    // positional MoR on ORC auto-routes to the predicate-deferred form
    val r = t.deletePositional(spark, col("id") === 1L, Some(5000L))
    assert(r.isDefined && t.pendingDeletes.nonEmpty &&
      t.positionalDeletes.isEmpty)
    assert(rows(t) == Map(3L -> "C"))
    // time travel reads the pre-DML ORC files
    assert(t.read(spark, Some(1L)).count() == 3L)
  }

  test("write.format=orc on an identity-partitioned layout: values recovered, pruning intact") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema,
      properties = Map(GraftTable.PropWriteFormat -> "orc"),
      partitionBy = Seq("data"))
    t.append(mkDf(1L -> "x", 2L -> "y", 3L -> "x"), Some(1000L))
    assert(dataFiles(dir).forall(_.endsWith(".orc")))
    assert(dataFiles(dir).exists(_.contains("data=x")),
      "identity layout missing")
    assert(rows(t) == Map(1L -> "x", 2L -> "y", 3L -> "x"))
    // synthesized partition stats prune whole files despite no footers
    val scanned = t.scan(spark, Some(col("data") === "y"))
    assert(scanned.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // countWhere proves the partition slice metadata-only
    assert(t.countWhere(spark, col("data") === "x") == 2L)
  }

  test("write.format=avro: unpartitioned DML stays avro; partitioned refuses") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema,
      properties = Map(GraftTable.PropWriteFormat -> "avro"))
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    assert(dataFiles(dir).nonEmpty && dataFiles(dir).forall(_.endsWith(".avro")))
    assert(rows(t) == Map(1L -> "a", 2L -> "b"))
    t.delete(spark, col("id") === 1L, Some(2000L))
    assert(rows(t) == Map(2L -> "b"))
    assert(dataFiles(dir).forall(_.endsWith(".avro")))
    // partitioned avro refuses at write time, nothing lands
    val dir2 = s"${tmp()}/t2"
    val t2 = GraftTable.create(dir2, schema,
      properties = Map(GraftTable.PropWriteFormat -> "avro"),
      partitionBy = Seq("data"))
    intercept[IllegalArgumentException] {
      t2.append(mkDf(1L -> "a"), Some(1000L))
    }
    assert(t2.log.snapshots.isEmpty, "refused write committed a snapshot")
  }

  test("streaming sink refuses a non-parquet write.format at plan time") {
    val wh = tmp()
    val t = GraftTable.create(s"$wh/db/wfmt_stream", schema,
      properties = Map(GraftTable.PropWriteFormat -> "orc"))
    t.append(mkDf(1L -> "a"), Some(1000L))
    spark.conf.set("spark.sql.catalog.gwf", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gwf.warehouse", wh)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    src.addData(2L -> "b")
    val e = intercept[Exception] {
      val q = src.toDF().toDF("id", "data")
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wfmt-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("gwf.db.wfmt_stream")
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("streaming sink writes parquet only"), msgs)
    // nothing landed; the table still reads its ORC estate
    assert(rows(t) == Map(1L -> "a"))
  }

  test("format switch makes a MIXED table: per-file dispatch, one union") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L)) // parquet era
    val t2 = t.updateProperties(Map(GraftTable.PropWriteFormat -> "orc"))
    t2.append(mkDf(2L -> "b"), Some(2000L)) // orc era
    val t3 = t2.updateProperties(Map(GraftTable.PropWriteFormat -> "avro"))
    t3.append(mkDf(3L -> "c"), Some(3000L)) // avro era
    val exts = dataFiles(dir).map(p => p.substring(p.lastIndexOf('.'))).toSet
    assert(exts == Set(".parquet", ".orc", ".avro"), exts.toString)
    assert(rows(t3) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // compaction under the final format materializes everything avro
    t3.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    assert(rows(t3) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(dataFiles(dir).count(_.endsWith(".avro")) >= 1)
    // unknown formats refuse before anything lands
    val bad = t3.updateProperties(Map(GraftTable.PropWriteFormat -> "csv"))
    intercept[IllegalArgumentException] {
      bad.append(mkDf(9L -> "z"), Some(5000L))
    }
  }

  test("ORC-estate curation cycle: key-addressed deletes auto-route to the equality form") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(dir, schema,
      Map(GraftTable.PropWriteFormat -> "orc"))
    t.append(mkDf(1L -> "good", 2L -> "junk", 3L -> "good"), Some(1000L))
    t.append(mkDf(4L -> "junk", 5L -> "good"), Some(2000L))
    assert(dataFiles(dir).forall(_.endsWith(".orc")))
    // the p04-style curation step: victims addressed BY KEY — on an ORC
    // estate (no parquet row index) the positional form routes to an
    // equality entry automatically, same statement, same end state
    val snap = t.deletePositionalByKeys(spark,
      Seq(2L, 4L).toDF("id"), Seq("id"), Some(3000L))
    assert(snap.isDefined)
    assert(t.equalityDeletes.nonEmpty,
      "ORC curation should land as a pending equality entry")
    assert(t.positionalDeletes.isEmpty)
    assert(rows(t) == Map(1L -> "good", 3L -> "good", 5L -> "good"))
    // appends AFTER the curation are untouched (covered-snap scoping)
    t.append(mkDf(6L -> "junk"), Some(4000L))
    assert(rows(t).contains(6L))
    // compact materializes the entry IN ORC; counts stay exact
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(5000L))
    assert(t.equalityDeletes.isEmpty)
    assert(rows(t) == Map(1L -> "good", 3L -> "good", 5L -> "good",
      6L -> "junk"))
    assert(dataFiles(dir).filter(_.endsWith(".parquet")).isEmpty)
    // the position-PAIR form still refuses on ORC — pointing at the
    // working spelling (must name a file in the CURRENT manifest:
    // unknown/stale names are ignored by design, not refused, and the
    // data/ walk may surface pre-compact leftovers in any order)
    val orcFile = Manifest.read(s"$dir/${t.log.current.get.manifestList}")
      .files.map(_.path).find(_.endsWith(".orc")).get
    val e = intercept[IllegalArgumentException] {
      t.deletePositionalAt(spark,
        Seq((orcFile, 0L)).toDF("_file", "_pos"), Some(6000L))
    }
    assert(e.getMessage.contains("deletePositionalByKeys") &&
      e.getMessage.contains("equality"), e.getMessage)
  }

  test("ORC estate: predicate-addressed positional delete routes to the deferred form") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(dir, schema,
      Map(GraftTable.PropWriteFormat -> "orc"))
    t.append(mkDf(1L -> "junk", 2L -> "good"), Some(1000L))
    t.append(mkDf(3L -> "junk", 4L -> "good"), Some(2000L))
    // the p04 quality-gate step, predicate-addressed — on ORC it lands
    // as a predicate-deferred entry (same visible-row semantics)
    val snap = t.deletePositional(spark, col("data") === "junk", Some(3000L))
    assert(snap.isDefined)
    assert(t.pendingDeletes.nonEmpty && t.positionalDeletes.isEmpty,
      "ORC predicate curation should land as a pending predicate entry")
    assert(rows(t) == Map(2L -> "good", 4L -> "good"))
    // covered-snapshot scoping: junk arriving AFTER the gate survives
    t.append(mkDf(5L -> "junk"), Some(4000L))
    assert(rows(t).contains(5L))
    // compaction materializes the entry, still ORC
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(5000L))
    assert(t.pendingDeletes.isEmpty)
    assert(rows(t) == Map(2L -> "good", 4L -> "good", 5L -> "junk"))
    assert(dataFiles(dir).forall(_.endsWith(".orc")))
  }

  test("mixed parquet+ORC estate: one key-addressed delete covers both via equality") {
    import spark.implicits._
    val dir = tmp()
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "junk", 2L -> "good"), Some(1000L)) // parquet era
    val t2 = t.updateProperties(Map(GraftTable.PropWriteFormat -> "orc"))
    t2.append(mkDf(3L -> "junk", 4L -> "good"), Some(2000L)) // orc era
    val snap = t2.deletePositionalByKeys(spark,
      Seq(1L, 3L).toDF("id"), Seq("id"), Some(3000L))
    assert(snap.isDefined)
    // routed whole to equality: ONE entry covers both formats' files
    assert(t2.equalityDeletes.nonEmpty && t2.positionalDeletes.isEmpty)
    assert(rows(t2) == Map(2L -> "good", 4L -> "good"))
  }
}
