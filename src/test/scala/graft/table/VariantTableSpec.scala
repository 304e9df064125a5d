package graft.table

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** VARIANT columns in graft tables (Iceberg v3's headline type, served by
  * Spark 4's native `VariantType` + `parse_json`/`variant_get`):
  *
  *  - schema round-trip: a variant column survives create → metadata.json
  *    → load (DataType JSON spells it "variant");
  *  - data round-trip: parse_json ingest → typed variant_get reads,
  *    including nested paths and type-missing → NULL;
  *  - DML survival: CoW delete/update THROUGH a variant_get predicate
  *    rewrite the variant bytes losslessly; compaction too;
  *  - pruning honesty: parquet stores variant as a value/metadata binary
  *    group, so files carry NO footer bounds — a variant predicate must
  *    keep every candidate file (conservative, sound) and the delete
  *    proof must never claim a whole-file drop it can't prove;
  *  - metadata-table visibility: __files/__snapshots serve the variant
  *    table like any other (exact record counts);
  *  - loud refusals where the type genuinely can't serve: avro format
  *    (no avro spelling), bloom columns (unsupported type);
  *  - PERFORMANCE: writes land SHREDDED (Spark 4's default — per-path
  *    typed_value subcolumns) and `variant_get` pushes into the scan on
  *    BOTH read paths (Catalyst's V1 rewrite for library reads; the
  *    DSv2 `SupportsPushDownVariantExtractions` forward for catalog
  *    reads) — a path read touches one shredded subcolumn, never the
  *    whole binary; the known upstream edge (metadata column +
  *    variant_get drops the metadata attr in Spark's rewrite) is
  *    repaired engine-side (GraftVariantMetadataRepair routes the
  *    combination to the metadata scan, extraction interpreted), with
  *    the conf gate kept as a manual escape hatch.
  */
class VariantTableSpec extends SparkSpecBase {

  private def srcDf() = {
    import spark.implicits._
    Seq(
      (1L, """{"k": 5,  "tag": "a", "nested": {"x": 1.5}}"""),
      (2L, """{"k": 40, "tag": "b", "nested": {"x": 2.5}}"""),
      (3L, """{"k": 99, "tag": "c"}"""),
      (4L, """{"k": 63, "arr": [1,2,3]}""")
    ).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("meta"))
  }

  test("variant schema survives create → metadata.json → load") {
    val dir = tmpDir("variant_schema")
    val df = srcDf()
    assert(df.schema("meta").dataType == VariantType)
    GraftTable.create(s"$dir/t", df.schema)
    val loaded = GraftTable.load(s"$dir/t")
    assert(loaded.schema("meta").dataType == VariantType)
  }

  test("parse_json ingest round-trips through typed variant_get reads") {
    val dir = tmpDir("variant_rt")
    val df = srcDf()
    val tb = GraftTable.create(s"$dir/t", df.schema)
    tb.append(df, committedAt = Some(1000L))
    val back = tb.read(spark)
      .select(col("id"),
        variant_get(col("meta"), "$.k", "int").as("k"),
        variant_get(col("meta"), "$.tag", "string").as("tag"),
        variant_get(col("meta"), "$.nested.x", "double").as("x"),
        variant_get(col("meta"), "$.arr[1]", "int").as("a1"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
    assert(back.toSeq == Seq(
      (1L, Some(5), Some("a"), Some(1.5), None),
      (2L, Some(40), Some("b"), Some(2.5), None),
      (3L, Some(99), Some("c"), None, None),
      (4L, Some(63), None, None, Some(2))))
  }

  test("CoW delete and update through a variant predicate round-trip the bytes") {
    val dir = tmpDir("variant_dml")
    val df = srcDf()
    val tb = GraftTable.create(s"$dir/t", df.schema)
    tb.append(df, committedAt = Some(1000L))
    // delete via a variant_get path: k < 10 removes id 1 only
    tb.delete(spark, variant_get(col("meta"), "$.k", "int") < 10, Some(2000L))
    val t2 = GraftTable.load(s"$dir/t")
    assert(t2.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(2L, 3L, 4L))
    // survivors' variant bytes are intact after the rewrite
    val k = t2.read(spark)
      .select(col("id"), variant_get(col("meta"), "$.k", "int").as("k"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(k.toSeq == Seq((2L, 40), (3L, 99), (4L, 63)))
    // CoW update of a NON-variant column: the untouched variant column
    // rides through the rewrite projection
    t2.update(spark, variant_get(col("meta"), "$.tag", "string") === "b",
      Map("id" -> (col("id") + lit(100L))), Some(3000L))
    val t3 = GraftTable.load(s"$dir/t")
    val after = t3.read(spark)
      .select(col("id"), variant_get(col("meta"), "$.k", "int").as("k"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(after.toSeq == Seq((3L, 99), (4L, 63), (102L, 40)))
    // compaction preserves the column
    t3.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    val t4 = GraftTable.load(s"$dir/t")
    assert(t4.read(spark)
      .select(variant_get(col("meta"), "$.k", "int").as("k"))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(40, 63, 99))
  }

  test("variant predicates prune via shredded stats; the raw column carries none") {
    val dir = tmpDir("variant_prune")
    val df = srcDf()
    val tb = GraftTable.create(s"$dir/t", df.schema)
    // file 1: k ∈ {5, 40}; file 2: k ∈ {99, 63}
    tb.append(df.filter(col("id") <= 2), committedAt = Some(1000L))
    tb.append(df.filter(col("id") > 2), committedAt = Some(2000L))
    val t2 = GraftTable.load(s"$dir/t")
    val manifest = Manifest.read(
      s"${t2.dir}/${t2.log.current.get.manifestList}")
    assert(manifest.totalFiles >= 2)
    val pred = GraftTable.resolveAgainst(spark, t2.schema,
      org.apache.spark.sql.classic.GraftBridge.expr(
        variant_get(col("meta"), "$.k", "int") >= 50))
    val kept = t2.prunedFiles(manifest, pred)
    // shredded-path stats (VariantPruning) skip the provably-low file
    // (k ∈ {5,40}); every surviving file's bounds reach 50
    assert(kept.size < manifest.totalFiles && kept.nonEmpty,
      s"shredded pruning should skip the low file: ${kept.map(_.path)}")
    assert(kept.forall(_.stats
      .get(VariantPruning.statKey("meta", "$.k", "long"))
      .flatMap(_.max).exists(_.toLong >= 50L)))
    // the variant column itself carries no direct bounds (binary group)
    assert(manifest.files.forall(f => !f.stats.contains("meta")))
    // the scan answers exactly over the pruned list + residual filter
    assert(t2.read(spark)
      .filter(variant_get(col("meta"), "$.k", "int") >= 50)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }

  test("metadata tables serve a variant table exactly") {
    val dir = tmpDir("variant_meta")
    val df = srcDf()
    val tb = GraftTable.create(s"$dir/t", df.schema)
    tb.append(df, committedAt = Some(1000L))
    val snaps = tb.snapshots(spark).collect()
    assert(snaps.length == 1)
    val files = tb.filesTable(spark).collect()
    assert(files.map(r =>
      r.getLong(r.fieldIndex("record_count"))).sum == 4L)
  }

  test("writes are SHREDDED and variant extraction pushes through the DSv2 catalog") {
    val wh = tmpDir("variant_shred")
    spark.conf.set("spark.sql.catalog.gvar", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gvar.warehouse", wh)
    import spark.implicits._
    val src = (1 to 500).map(i =>
      (i.toLong, s"""{"k": ${i % 50}, "tag": "t${i % 7}"}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("meta"))
    val tb = GraftTable.create(s"$wh/db/vshred", src.schema)
    tb.append(src, committedAt = Some(1000L))
    // the data files carry the shredded typed_value subcolumns (Spark
    // 4's default write shredding — this is what extraction reads)
    val f = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"$wh/db/vshred/data")).iterator()
      .asScala.find(_.toString.endsWith(".parquet")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        spark.sessionState.newHadoopConf()))
    try assert(footer.getFooter.getFileMetaData.getSchema.toString
      .contains("typed_value"), "variant write must shred")
    finally footer.close()
    // DSv2 read: the extraction is PUSHED — the scan serves a struct of
    // just the requested paths, never the whole variant binary
    val q = spark.sql("SELECT id, variant_get(meta, '$.k', 'int') AS k " +
      "FROM gvar.db.vshred WHERE variant_get(meta, '$.k', 'int') = 7")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedVariantExtractions: [meta"),
      s"extraction not pushed:\n${plan.take(1500)}")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      (1 to 500).filter(_ % 50 == 7).map(_.toLong))
    // library reads push through Catalyst's V1 rule (ReadSchema shrinks
    // to the requested paths)
    val libPlan = tb.read(spark)
      .select(variant_get(col("meta"), "$.k", "int").as("k"))
      .queryExecution.executedPlan.toString
    assert(libPlan.contains("meta:struct<0:int>"),
      s"library variant read not pushed:\n${libPlan.take(1500)}")
  }

  test("metadata columns compose with pushed extraction (_row_id + variant_get)") {
    val wh = tmpDir("variant_meta_ext")
    spark.conf.set("spark.sql.catalog.gvm", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gvm.warehouse", wh)
    import spark.implicits._
    val src = Seq((1L, """{"k": 11}"""), (2L, """{"k": 22}"""),
      (3L, """{"k": 33}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("meta"))
    val tb = GraftTable.create(s"$wh/db/vmeta", src.schema)
    tb.append(src.repartition(1), committedAt = Some(1000L))
    // KNOWN UPSTREAM EDGE, repaired engine-side: Spark's variant rewrite
    // drops requested metadata attributes from the rebuilt relation
    // output (the scan's read schema drives a positional zip and the
    // appended metadata attrs fall off the tail). GraftVariantMetadata-
    // Repair — injected by the catalog, no SET needed — swaps in the
    // metadata-column scan, which computes the requested extraction from
    // the raw variant bytes interpreted, on this path only.
    val q = spark.sql(
      "SELECT id, _row_id, variant_get(meta, '$.k', 'int') AS k " +
        "FROM gvm.db.vmeta ORDER BY id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftFileposScan"),
      s"repair should route to the metadata scan:\n${plan.take(1500)}")
    assert(!plan.contains("PushedVariantExtractions: [meta"),
      "the metadata path serves the extraction interpreted, not pushed")
    val rows = q.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(rows.map(x => (x._1, x._3)) ==
      Seq((1L, 11), (2L, 22), (3L, 33)), s"values wrong: $rows")
    assert(rows.map(_._2).distinct.size == 3 &&
      rows.map(_._2).forall(r => r >= 0 && r < 3),
      s"row ids wrong: $rows")
    // the conf gate stays as a second, upstream-level escape hatch
    val key = "spark.sql.variant.pushVariantIntoScan"
    spark.conf.set(key, "false")
    try {
      val unpushedRows = spark.sql(
        "SELECT id, _row_id, variant_get(meta, '$.k', 'int') AS k " +
          "FROM gvm.db.vmeta ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(unpushedRows == rows, s"conf-gate path diverged: $unpushedRows")
    } finally spark.conf.set(key, "true")
    // the per-read opt-out serves plain variant_get reads unpushed too
    val unpushed = spark.read.option("variant-pushdown", "false")
      .table("gvm.db.vmeta")
      .select(col("id"), variant_get(col("meta"), "$.k", "int").as("k"))
    assert(!unpushed.queryExecution.executedPlan.toString
      .contains("PushedVariantExtractions: [meta"))
    assert(unpushed.collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1).toSeq == Seq((1L, 11), (2L, 22), (3L, 33)))
  }

  test("genuinely unservable surfaces refuse loudly") {
    val dir = tmpDir("variant_refuse")
    val df = srcDf()
    // avro write.format: variant has no avro spelling — the write job
    // refuses (round-trip check), nothing commits
    val t1 = GraftTable.create(s"$dir/avro", df.schema,
      properties = Map(GraftTable.PropWriteFormat -> "avro"))
    intercept[Exception] { t1.append(df, Some(1000L)) }
    assert(t1.log.current.isEmpty)
    // bloom columns on variant: FileBloom.supported refuses the type
    assert(!FileBloom.supported(VariantType))
  }
}
