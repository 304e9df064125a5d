package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** RENAME / DROP column evolution — metadata-only, name-mapped per file
  * era (the field-id-free analog of Iceberg's schema evolution): files
  * keep their era's physical column names; reads alias them back to the
  * logical schema. The resurrection rule is the load-bearing invariant:
  * a name whose physical values still sit in any file can never re-enter
  * the schema.
  */
class SchemaEvolutionSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-schevo").toString

  test("rename: old-era files read under the new name; values intact") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L)) // era 1: 'data'
    t = t.renameColumn("data", "payload")
    assert(t.schema.fieldNames.toSeq == Seq("id", "payload"))
    // reads map era-1 files' physical 'data' to logical 'payload'
    assert(t.read(spark).select("payload").collect().map(_.getString(0))
      .sorted.toSeq == Seq("a", "b"))
    // new writes land under the new name and mix with old-era files
    t.append(mkDf(3L -> "c").withColumnRenamed("data", "payload"), Some(2000L))
    assert(t.read(spark).select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel to the pre-rename snapshot reads the CURRENT logical
    // schema (schema is table-level metadata, not snapshot-level)
    assert(t.read(spark, Some(1L)).columns.contains("payload"))
    // chained rename: payload -> body; both eras still map
    t = t.renameColumn("payload", "body")
    t.append(mkDf(4L -> "d").withColumnRenamed("data", "body"), Some(3000L))
    assert(t.read(spark).select("body").collect().map(_.getString(0))
      .sorted.toSeq == Seq("a", "b", "c", "d"))
    // a reloaded handle sees the same mapping (metadata round-trip)
    val t2 = GraftTable.load(dir)
    assert(t2.read(spark).select("body").collect().map(_.getString(0))
      .sorted.toSeq == Seq("a", "b", "c", "d"))
    // predicates and pruning on the new name stay CORRECT over old-era
    // files (their stats sit under the old name — conservative keep)
    assert(t2.scan(spark, Some(col("body") === "a"))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("rename: DML and compaction migrate files to the current name") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    t = t.renameColumn("data", "payload")
    // CoW update reads era-mapped rows and writes current-name files
    t.update(spark, col("id") === 2L,
      Map("payload" -> lit("B")), Some(2000L))
    assert(t.read(spark).select("payload").collect().map(_.getString(0))
      .sorted.toSeq == Seq("B", "a", "c"))
    // compaction rewrites everything under the current name: the DSv2
    // raw path (which refuses pre-rename files) works again after it
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(3000L))
    val files = Manifest.read(s"$dir/${t.log.current.get.manifestList}").files
    assert(files.forall(f => f.stats.contains("payload") &&
      !f.stats.contains("data")),
      s"compaction did not migrate stats: ${files.map(_.stats.keySet)}")
    assert(t.read(spark).count() == 3L)
  }

  test("drop: metadata-only; remaining columns read; resurrection refused") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t = t.dropColumn("data")
    assert(t.schema.fieldNames.toSeq == Seq("id"))
    assert(t.read(spark).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))
    // re-adding the dropped name must refuse: era-1 files still hold
    // physical 'data' values that would silently resurrect
    val e = intercept[IllegalArgumentException] {
      t.addColumn("data", StringType)
    }
    assert(e.getMessage.contains("resurrect"), e.getMessage)
    // a different name is fine and null-fills
    t = t.addColumn("note", StringType)
    assert(t.read(spark).select("note").collect().forall(_.isNullAt(0)))
  }

  test("rename+drop interplay: old physical names stay tombstoned") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t = t.renameColumn("data", "payload")
    // the old physical name cannot come back as a fresh column
    val e1 = intercept[IllegalArgumentException] {
      t.addColumn("data", StringType)
    }
    assert(e1.getMessage.contains("resurrect"), e1.getMessage)
    // dropping the renamed column tombstones its whole alias chain
    t = t.dropColumn("payload")
    intercept[IllegalArgumentException] { t.addColumn("payload", LongType) }
    intercept[IllegalArgumentException] { t.addColumn("data", LongType) }
    // and renaming another column ONTO a tombstoned name refuses
    intercept[IllegalArgumentException] { t.renameColumn("id", "data") }
  }

  test("refusals: partition sources, MoR pending, property references") {
    val dir = s"${tmp()}/t"
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("cat", StringType, nullable = true)))
    val tp = GraftTable.create(s"$dir/p", s2, partitionBy = Seq("cat"))
    intercept[IllegalArgumentException] { tp.renameColumn("cat", "c2") }
    intercept[IllegalArgumentException] { tp.dropColumn("cat") }

    val tm = GraftTable.create(s"$dir/m", schema)
    tm.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    tm.deleteDeferred(spark, col("data") === "a", Some(2000L))
    intercept[IllegalArgumentException] { tm.renameColumn("data", "d2") }
    intercept[IllegalArgumentException] { tm.dropColumn("data") }

    val tc = GraftTable.create(s"$dir/c", schema,
      properties = Map(GraftTable.PropCheckPrefix + "pos" -> "id > 0"))
    tc.append(mkDf(1L -> "a"), Some(1000L))
    intercept[IllegalArgumentException] { tc.renameColumn("id", "id2") }
  }

  test("widen: int-era files read as long; stats prune; blooms stripped") {
    val dir = s"${tmp()}/t"
    val s2 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("data", StringType, nullable = true)))
    def df(rows: (Int, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1), s2)
    var t = GraftTable.create(dir, s2,
      properties = Map(GraftTable.PropBloomColumns -> "id"))
    t.append(df(1 -> "a", 2 -> "b"), Some(1000L))    // era 1: INT + bloom
    t = t.widenColumn("id", LongType)
    assert(t.schema("id").dataType == LongType)
    // era-1 rows read as LONG, values intact
    assert(t.read(spark).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))
    // mixed eras: new LONG files union with cast INT files
    t.append(df(3 -> "c")
      .withColumn("id", col("id").cast(LongType)), Some(2000L))
    assert(t.read(spark).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
    // point-lookup scan over the widened column stays CORRECT on era-1
    // files (their int-typed bloom must be stripped, not probed)
    assert(t.scan(spark, Some(col("id") === 2L))
      .select("data").collect().map(_.getString(0)).toSeq == Seq("b"))
    // and era-1 footer STATS still prune: a miss outside every range
    // plans zero files
    assert(t.scan(spark, Some(col("id") === 999L)).count() == 0)
    // a reloaded handle round-trips the widening metadata
    assert(GraftTable.load(dir).read(spark).count() == 3L)
    // lossy "widenings" refuse
    intercept[IllegalArgumentException] {
      GraftTable.load(dir).widenColumn("id", IntegerType)
    }
    // CoW update migrates rewritten files to the new type
    val t2 = GraftTable.load(dir)
    t2.update(spark, col("id") === 1L, Map("data" -> lit("A")), Some(3000L))
    assert(t2.read(spark).select("data").collect().map(_.getString(0))
      .sorted.toSeq == Seq("A", "b", "c"))
  }

  test("widen composes with rename across eras") {
    val dir = s"${tmp()}/t"
    val s2 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("data", StringType, nullable = true)))
    def df(rows: (Int, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1), s2)
    var t = GraftTable.create(dir, s2)
    t.append(df(1 -> "a"), Some(1000L))          // era 1: id INT
    t = t.widenColumn("id", LongType)            // era 2: id LONG
    t.append(df(2 -> "b").withColumn("id", col("id").cast(LongType)),
      Some(2000L))
    t = t.renameColumn("id", "key")              // era 3: key LONG
    t.append(df(3 -> "c").withColumn("id", col("id").cast(LongType))
      .withColumnRenamed("id", "key"), Some(3000L))
    // all three eras: (id INT), (id LONG), (key LONG) → logical key LONG
    assert(t.read(spark).select("key").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
    assert(GraftTable.load(dir).read(spark).select("key").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("evolution vs live branches: publish refuses drift; branch era maps") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    val br = t.createBranch("audit", Some(1500L))
    br.append(mkDf(2L -> "staged"), Some(2000L))
    // parent renames while the branch lives: the branch keeps its fork
    // metadata, so a fast-forward publish would graft old-schema files
    // under a renamed parent — refused as metadata drift
    t = t.renameColumn("data", "payload")
    val e = intercept[IllegalArgumentException] {
      t.publishBranch("audit", Some(3000L))
    }
    assert(e.getMessage.contains("identical metadata"), e.getMessage)
    // the parent's own era-mapped read is unaffected
    assert(t.read(spark).select("payload").collect().map(_.getString(0))
      .toSeq == Seq("a"))
    // and a rename ON the branch is refused outright: fork-inherited
    // `../../` entries cannot be era-attributed in the branch's sequence
    val e2 = intercept[IllegalArgumentException] {
      br.renameColumn("data", "d2")
    }
    assert(e2.getMessage.contains("branch era"), e2.getMessage)
  }

  test("branching an evolved table: refused until compact; tombstones carry") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t = t.renameColumn("data", "payload")
    // pre-rename files cannot be era-attributed across the fork
    val e = intercept[IllegalArgumentException] { t.createBranch("audit") }
    assert(e.getMessage.contains("pre-rename"), e.getMessage)
    // compact migrates every file to the current schema; branching works
    t.compact(spark, smallerThanBytes = Long.MaxValue, Some(2000L))
    val br = t.createBranch("audit", Some(3000L))
    assert(br.read(spark).select("payload").collect().map(_.getString(0))
      .toSeq == Seq("a"))
    // the old physical name is tombstoned ON THE BRANCH too: fork files
    // (and the parent's history) still hold physical 'data' values
    val e2 = intercept[IllegalArgumentException] {
      br.addColumn("data", StringType)
    }
    assert(e2.getMessage.contains("resurrect"), e2.getMessage)
  }

  test("mergeSchema append: new source column widens the table first") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    val evolvedDf = {
      val rows = Seq(Row(3L, "c", 30L), Row(4L, "d", null))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(schema.fields.toSeq :+
          StructField("score", LongType, nullable = true)))
    }
    // refusal stays the DEFAULT: an un-opted append with an extra column
    // must not silently evolve anything
    intercept[IllegalArgumentException] { t.append(evolvedDf, Some(2000L)) }
    assert(t.schema.fieldNames.toSeq == Seq("id", "data"))
    // opt in: the table widens (ALTER add-column path — evolution event,
    // nullable), then the rows land; pre-evolution files read NULL
    t.append(evolvedDf, Some(2000L), mergeSchema = true): Unit
    val t2 = GraftTable.load(dir)
    assert(t2.schema.fieldNames.toSeq == Seq("id", "data", "score"))
    val got = t2.read(spark).select("id", "data", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", null), (2L, "b", null),
      (3L, "c", 30L), (4L, "d", null)), s"got $got")
    // identical source schema: mergeSchema is a no-op passthrough
    t2.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(5L, "e", 50L)), 1),
      t2.schema), Some(3000L), mergeSchema = true): Unit
    assert(GraftTable.load(dir).read(spark).count() == 5L)
    // a widened TYPE still refuses even under mergeSchema (additive
    // columns only — never the unionByName widening trap)
    val widenedType = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(6L, "f", "not-a-long")), 1),
      StructType(Seq(schema.fields(0), schema.fields(1),
        StructField("score", StringType, nullable = true))))
    intercept[IllegalArgumentException] {
      GraftTable.load(dir).append(widenedType, Some(4000L),
        mergeSchema = true)
    }
  }

  test("mergeSchema merge: INSERT with extra source column upserts + widens") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b", 3L -> "c"), Some(1000L))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(2L, "B2", 20L), // matched: replaced, score lands
        Row(9L, "i9", 90L)), 1), // not matched: inserted
      StructType(schema.fields.toSeq :+
        StructField("score", LongType, nullable = true)))
    // default refuses; opted-in widens then merges in one flow
    intercept[IllegalArgumentException] { t.merge(spark, src, "id") }
    t.merge(spark, src, "id", Some(2000L), mergeSchema = true): Unit
    val t2 = GraftTable.load(dir)
    assert(t2.schema.fieldNames.toSeq == Seq("id", "data", "score"))
    val got = t2.read(spark).select("id", "data", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", null), (2L, "B2", 20L),
      (3L, "c", null), (9L, "i9", 90L)), s"got $got")
    assert(t2.log.current.get.operation == "merge")
  }

  test("mergeSchema keeps the resurrection guards: dropped names refuse") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, StructType(schema.fields.toSeq :+
      StructField("old", LongType, nullable = true)))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a", 10L)), 1),
      t.schema), Some(1000L))
    t = t.dropColumn("old")
    // a mergeSchema write must NOT resurrect the dropped column's stored
    // physical values — same refusal as ALTER ADD COLUMN
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, "b", 99L)), 1),
      StructType(schema.fields.toSeq :+
        StructField("old", LongType, nullable = true)))
    val e = intercept[IllegalArgumentException] {
      t.append(src, Some(2000L), mergeSchema = true)
    }
    assert(e.getMessage.contains("dropped"), e.getMessage)
  }

  test("mergeSchema merge: atomic refusals; composes with pending predicate deletes") {
    val dir = s"${tmp()}/t"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    val t1 = GraftTable.load(dir)
    t1.deleteDeferred(spark, col("id") === 1L, Some(1500L)): Unit
    val pending = GraftTable.load(dir)
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(3L, "c", 30L)), 1),
      StructType(schema.fields.toSeq :+
        StructField("score", LongType, nullable = true)))
    // pending predicate deletes COMPOSE with CoW merge now: the widen +
    // upsert land, and the predicate-dead row (id=1) stays dead — the
    // rewrite read visible rows only
    pending.merge(spark, src, "id", Some(2000L), mergeSchema = true)
    val after = GraftTable.load(dir)
    assert(after.schema.fieldNames.toSeq == Seq("id", "data", "score"))
    assert(after.read(spark).select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 3L), "merge resurrected a predicate-dead row")
    // atomicity for a bogus merge key: checked against the would-be
    // widened field set BEFORE any addColumn commits metadata
    val clean = s"${tmp()}/t2"
    val tc = GraftTable.create(clean, schema)
    tc.append(mkDf(1L -> "a"), Some(1000L))
    intercept[IllegalArgumentException] {
      GraftTable.load(clean).merge(spark, src, "nope", Some(2000L),
        mergeSchema = true)
    }
    assert(GraftTable.load(clean).schema.fieldNames.toSeq ==
      Seq("id", "data"), "bogus-key merge must not have widened the schema")
  }

  test("widenForSource is all-or-nothing across several extra columns") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, StructType(schema.fields.toSeq :+
      StructField("old", LongType, nullable = true)))
    t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "a", 10L)), 1),
      t.schema), Some(1000L))
    t = t.dropColumn("old")
    // extras = (fresh, old): the SECOND trips the resurrection guard, so
    // the FIRST must not have committed its addColumn either
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, "b", 1L, 99L)), 1),
      StructType(schema.fields.toSeq ++ Seq(
        StructField("fresh", LongType, nullable = true),
        StructField("old", LongType, nullable = true))))
    val e = intercept[IllegalArgumentException] {
      t.append(src, Some(2000L), mergeSchema = true)
    }
    assert(e.getMessage.contains("dropped"), e.getMessage)
    assert(GraftTable.load(dir).schema.fieldNames.toSeq ==
      Seq("id", "data"),
      "partial widening leaked from a refused multi-column mergeSchema")
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN + reads through the extensions") {
    val wh = tmpDir("graft-schevo-sql")
    spark.conf.set("spark.sql.catalog.gse", "graft.table.GraftSparkCatalog")
    spark.conf.set("spark.sql.catalog.gse.warehouse", wh)
    val t = GraftTable.create(s"$wh/db/t", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    spark.sql("ALTER TABLE gse.db.t RENAME COLUMN data TO payload")
    assert(GraftTable.load(s"$wh/db/t").schema.fieldNames.toSeq ==
      Seq("id", "payload"))
    // the plain session's raw DSv2 scan refuses pre-rename files loudly
    val e = intercept[Exception] { spark.sql("SELECT * FROM gse.db.t").count() }
    assert(e.getMessage.contains("pre-rename"), e.getMessage)
    // an extensions session splices the era-mapped library plan
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    sE.conf.set("spark.sql.catalog.gse", "graft.table.GraftSparkCatalog")
    sE.conf.set("spark.sql.catalog.gse.warehouse", wh)
    assert(sE.sql("SELECT payload FROM gse.db.t ORDER BY id")
      .collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    sE.sql("ALTER TABLE gse.db.t DROP COLUMN payload")
    assert(sE.sql("SELECT * FROM gse.db.t").columns.toSeq == Seq("id"))

    // widening through SQL DDL: INT column promoted to BIGINT, era-read
    val tw = GraftTable.create(s"$wh/db/w",
      StructType(Seq(StructField("n", IntegerType, nullable = false))))
    tw.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7)), 1), tw.schema), Some(1000L))
    sE.sql("ALTER TABLE gse.db.w ALTER COLUMN n TYPE BIGINT")
    assert(GraftTable.load(s"$wh/db/w").schema("n").dataType == LongType)
    assert(sE.sql("SELECT n FROM gse.db.w").collect().map(_.getLong(0))
      .toSeq == Seq(7L))
  }

  test("add column with DEFAULT: pre-add rows read the default, written values intact") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L)) // pre-add era
    t = t.addColumn("grade", StringType, Some("'unknown'"))
    // initial default (Iceberg v3): pre-add rows read the literal, not NULL
    assert(t.read(spark).select("id", "grade").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "unknown", 2L -> "unknown"))
    // post-add writes: explicit values — NULL included — are untouched
    // (the fill is per-era, never a coalesce over live data)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(3L, "c", "good"), Row(4L, "d", null)), 1), t.schema)
    t.append(df, Some(2000L))
    // WRITE default: a source simply lacking the column fills it
    t.append(mkDf(5L -> "e"), Some(3000L))
    def grades(tb: GraftTable): Map[Long, Option[String]] =
      tb.read(spark).select("id", "grade").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val expected = Map(1L -> Some("unknown"), 2L -> Some("unknown"),
      3L -> Some("good"), 4L -> None, 5L -> Some("unknown"))
    assert(grades(t) == expected)
    // metadata round-trip
    val t2 = GraftTable.load(dir)
    assert(grades(t2) == expected)
    // predicates over the defaulted column stay correct across eras
    // (pre-add files have no stats for it — conservative keep)
    assert(t2.countWhere(spark, col("grade") === "unknown") == 3L)
    assert(t2.scan(spark, Some(col("grade").isNull)).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    // compact materializes the default physically and retires the era
    t2.compact(spark, smallerThanBytes = Long.MaxValue, Some(4000L))
    assert(grades(t2) == expected)
    val mf = Manifest.read(
      s"$dir/${t2.log.current.get.manifestList}")
    assert(mf.files.forall(f => !t2.renameAffects(f)),
      "compaction must retire the pre-default era")
    // the default stays the WRITE default after materialization
    t2.append(mkDf(6L -> "f"), Some(5000L))
    assert(grades(t2)(6L) == Some("unknown"))
  }

  test("DEFAULT composes with rename; CoW DML sees filled values") {
    val dir = s"${tmp()}/t"
    var t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    t = t.addColumn("grade", StringType, Some("'unknown'"))
    t = t.renameColumn("grade", "quality")
    // pre-add rows read the default under the RENAMED logical name
    assert(t.read(spark).select("quality").collect()
      .map(_.getString(0)).toSeq == Seq("unknown"))
    // the write fill follows the rename (current-name tracking)
    t.append(mkDf(2L -> "b"), Some(2000L))
    assert(t.read(spark).filter(col("id") === 2L).select("quality")
      .collect().map(_.getString(0)).toSeq == Seq("unknown"))
    // CoW DML evaluates predicates over the FILLED view: the pre-add
    // row matches the default and rewrites away
    assert(t.delete(spark, col("quality") === "unknown" && col("id") === 1L,
      Some(3000L)).isDefined)
    assert(t.read(spark).select("id").collect().map(_.getLong(0))
      .toSeq == Seq(2L))
    // dropping the column drops its default event
    t = t.dropColumn("quality")
    assert(t.defaults.isEmpty, "drop must remove the default event")
    // non-constant defaults refuse at declaration
    intercept[IllegalArgumentException] {
      t.addColumn("bad", StringType, Some("data || 'x'"))
    }
  }

  test("SQL surface: CREATE/ALTER with DEFAULT, INSERT subset fills, raw-path refusal") {
    val wh = tmpDir("graft-schevo-default")
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    Seq(spark, sE).foreach { s =>
      s.conf.set("spark.sql.catalog.gdf", "graft.table.GraftSparkCatalog")
      s.conf.set("spark.sql.catalog.gdf.warehouse", wh)
    }
    // CREATE TABLE with a column default → pure write default
    sE.sql("CREATE TABLE gdf.db.d (id BIGINT, lang STRING DEFAULT 'en') " +
      "USING graft")
    sE.sql("INSERT INTO gdf.db.d VALUES (1, 'fr')")
    // INSERT with a column subset: Spark fills the declared default
    sE.sql("INSERT INTO gdf.db.d (id) VALUES (2)")
    assert(sE.sql("SELECT id, lang FROM gdf.db.d ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "fr"), (2L, "en")))
    // ALTER ADD COLUMN DEFAULT: pre-add files now need the era fill —
    // the plain session's raw scan refuses, extensions session serves
    sE.sql("ALTER TABLE gdf.db.d ADD COLUMN score INT DEFAULT 7")
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gdf.db.d").count() }
    assert(e.getMessage.contains("pre-default"), e.getMessage)
    assert(sE.sql("SELECT id, score FROM gdf.db.d ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 7), (2L, 7)))
    // compact materializes; the plain session's raw path serves again
    GraftTable.load(s"$wh/db/d")
      .compact(spark, smallerThanBytes = Long.MaxValue)
    assert(spark.sql("SELECT sum(score) FROM gdf.db.d").collect()
      .head.getLong(0) == 14L)
  }
}
