package graft.table

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Dynamic-partition INSERT OVERWRITE
  * ([[GraftTable.overwritePartitionsDynamic]]): replace exactly the
  * partitions the source writes into, in ONE atomic commit. The matrix:
  * metadata-only slice drops on identity AND hidden-transform layouts
  * (untouched files byte-identical), static-vs-dynamic parity, the
  * `df.writeTo(t).overwritePartitions()` and `partitionOverwriteMode=
  * dynamic` SQL spellings, other-era files (pre-evolution) rewriting
  * row-correctly, null partitions, MoR composition, and the
  * unpartitioned / empty-source degenerate forms. */
class DynamicOverwriteSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cat", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*): DataFrame = {
    val rdd = spark.sparkContext.parallelize(
      rows.map(r => Row(r._1, r._2)), 2)
    spark.createDataFrame(rdd, schema)
  }

  private lazy val wh = tmpDir("graft-dynovr")

  private lazy val sqlS: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create()
    s.conf.set("spark.sql.catalog.gdo", "graft.table.GraftSparkCatalog")
    s.conf.set("spark.sql.catalog.gdo.warehouse", wh)
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    s
  }

  private def idsOf(t: GraftTable): Seq[Long] =
    t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def filesOf(t: GraftTable): Set[String] =
    Manifest.read(s"${t.dir}/${t.log.current.get.manifestList}")
      .files.map(_.path).toSet

  test("replace two of five identity partitions: metadata-only, untouched slices byte-identical") {
    val t0 = GraftTable.create(s"$wh/db/five", schema, partitionBy = Seq("cat"))
    t0.append(mkDf((1 to 10).map(i =>
      (i.toLong, s"c${i % 5}")): _*), Some(1000L))
    val t1 = GraftTable.load(s"$wh/db/five")
    val before = filesOf(t1)
    val untouchedBefore = before.filterNot(p =>
      p.contains("cat=c1") || p.contains("cat=c3"))

    t1.overwritePartitionsDynamic(spark,
      mkDf(101L -> "c1", 103L -> "c3"), Some(2000L))

    val t2 = GraftTable.load(s"$wh/db/five")
    assert(t2.log.snapshots.size == 2, "dynamic overwrite must be ONE commit")
    val snap = t2.log.current.get
    assert(snap.operation == "overwrite")
    assert(snap.summary("replaced-partitions") == "2")
    assert(snap.summary("rewritten-data-files") == "0",
      "in-era slice drops must be metadata-only")
    assert(snap.summary("dropped-data-files").toLong >= 2)
    // untouched partitions keep their exact files (no rewrite, no move)
    val after = filesOf(t2)
    assert(untouchedBefore.subsetOf(after),
      s"untouched slices must carry by ref: ${untouchedBefore.diff(after)}")
    assert(after.intersect(before.diff(untouchedBefore)).isEmpty,
      "touched-slice files must all leave the manifest")
    // rows: c1/c3 replaced wholesale, c0/c2/c4 untouched
    // dropped: ids 1,6 (c1) and 3,8 (c3); replaced by 101/103
    assert(idsOf(t2) == Seq(2L, 4L, 5L, 7L, 9L, 10L, 101L, 103L))
    // time travel still sees the pre-overwrite state
    assert(t2.read(spark, Some(1L)).count() == 10L)
  }

  test("static PARTITION (c=…) and dynamic overwrite agree on the same slice") {
    val mk = (suffix: String) => {
      val t = GraftTable.create(s"$wh/db/par_$suffix", schema,
        partitionBy = Seq("cat"))
      t.append(mkDf(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "c"), Some(1000L))
      t
    }
    mk("static"); mk("dyn")
    sqlS.sql("INSERT OVERWRITE gdo.db.par_static PARTITION (cat = 'a') " +
      "VALUES (10), (11)")
    // dynamic: same rows arrive with their partition value in-line
    sqlS.sql("INSERT OVERWRITE gdo.db.par_dyn " +
      "VALUES (10, 'a'), (11, 'a')")
    val st = sqlS.sql("SELECT id, cat FROM gdo.db.par_static ORDER BY id, cat")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val dy = sqlS.sql("SELECT id, cat FROM gdo.db.par_dyn ORDER BY id, cat")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(st == dy, s"static $st != dynamic $dy")
    assert(st == Seq(3L -> "b", 4L -> "c", 10L -> "a", 11L -> "a"))
    val t2 = GraftTable.load(s"$wh/db/par_dyn")
    assert(t2.log.current.get.summary("rewritten-data-files") == "0")
  }

  test("df.writeTo(t).overwritePartitions() routes to the same commit") {
    val t = GraftTable.create(s"$wh/db/wto", schema, partitionBy = Seq("cat"))
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    import sqlS.implicits._
    Seq((10L, "a"), (12L, "a")).toDF("id", "cat")
      .writeTo("gdo.db.wto").overwritePartitions()
    val t2 = GraftTable.load(s"$wh/db/wto")
    assert(t2.log.current.get.operation == "overwrite")
    assert(t2.log.snapshots.size == 2)
    assert(idsOf(t2) == Seq(2L, 10L, 12L))
  }

  test("hidden transforms (days): tuple-exact drops, no rewrite") {
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true)))
    def df(rows: (Long, String)*): DataFrame =
      spark.createDataFrame(spark.sparkContext.parallelize(rows.map(r =>
        Row(r._1, java.sql.Timestamp.valueOf(r._2))), 2), s2)
    val t = GraftTable.create(s"$wh/db/bydays", s2,
      partitionBy = Seq("days(ts)"))
    t.append(df(
      1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 23:00:00",
      3L -> "2024-01-02 01:00:00", 4L -> "2024-01-03 12:00:00"),
      Some(1000L))
    val t1 = GraftTable.load(s"$wh/db/bydays")
    // replace only 2024-01-02
    t1.overwritePartitionsDynamic(spark,
      df(30L -> "2024-01-02 05:00:00", 31L -> "2024-01-02 06:00:00"),
      Some(2000L))
    val t2 = GraftTable.load(s"$wh/db/bydays")
    val snap = t2.log.current.get
    assert(snap.summary("replaced-partitions") == "1")
    assert(snap.summary("rewritten-data-files") == "0",
      "in-era hidden-transform slice drops must be metadata-only")
    assert(idsOf(t2) == Seq(1L, 2L, 4L, 30L, 31L))
  }

  test("other-era files (pre-evolution) rewrite row-correctly") {
    // files written BEFORE the table was partitioned can hold rows of a
    // touched partition — they must rewrite keeping only the other rows
    val t0 = GraftTable.create(s"$wh/db/evo", schema)
    t0.append(mkDf(1L -> "a", 2L -> "b", 3L -> "a"), Some(1000L))
    val t1 = GraftTable.load(s"$wh/db/evo").updatePartitionSpec(Seq("cat"))
    t1.append(mkDf(4L -> "c"), Some(2000L))
    val t2 = GraftTable.load(s"$wh/db/evo")
    t2.overwritePartitionsDynamic(spark, mkDf(10L -> "a"), Some(3000L))
    val t3 = GraftTable.load(s"$wh/db/evo")
    val snap = t3.log.current.get
    assert(snap.summary("rewritten-data-files").toLong >= 1,
      "pre-partitioning files must take the rewrite path")
    assert(idsOf(t3) == Seq(2L, 4L, 10L))
    assert(t3.read(spark).filter(col("cat") === "a")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("null partition: a source writing the null slice replaces it") {
    val t = GraftTable.create(s"$wh/db/nulls", schema, partitionBy = Seq("cat"))
    t.append(mkDf(1L -> "a", 2L -> null, 3L -> null), Some(1000L))
    GraftTable.load(s"$wh/db/nulls").overwritePartitionsDynamic(spark,
      mkDf(20L -> null), Some(2000L))
    val t2 = GraftTable.load(s"$wh/db/nulls")
    assert(t2.log.current.get.summary("rewritten-data-files") == "0")
    assert(idsOf(t2) == Seq(1L, 20L))
    assert(t2.read(spark).filter(col("cat").isNull)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(20L))
  }

  test("MoR composition: covered drops demote to rewrites, visible rows stay exact") {
    val t = GraftTable.create(s"$wh/db/mor", schema, partitionBy = Seq("cat"))
    t.append(mkDf(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"), Some(1000L))
    // pending predicate entry covering the b-slice file
    t.deleteDeferred(spark, col("id") === 3L, Some(2000L))
    GraftTable.load(s"$wh/db/mor").overwritePartitionsDynamic(spark,
      mkDf(30L -> "b"), Some(3000L))
    val t2 = GraftTable.load(s"$wh/db/mor")
    // the b file was covered by the pending entry: it must NOT drop
    // metadata-only (that would resurrect nothing here, but the dead
    // count bookkeeping requires the visible-row rewrite path)
    assert(idsOf(t2) == Seq(1L, 2L, 30L))
    assert(t2.read(spark).filter(col("cat") === "b")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(30L))
    // count(*) stays exact after the composition
    assert(t2.read(spark).count() == 3L)
  }

  test("mixed static+dynamic PARTITION clause keeps Hive semantics through the dynamic route") {
    // `INSERT OVERWRITE t PARTITION (cat='a', sub)` under dynamic mode:
    // Spark folds the static value into the source and plans
    // OverwritePartitionsDynamic — only the WRITTEN (cat, sub) combos
    // replace; the static prefix's other sub-partitions survive
    sqlS.sql("CREATE TABLE gdo.db.mixed (id BIGINT, cat STRING, sub STRING) " +
      "PARTITIONED BY (cat, sub)")
    sqlS.sql("INSERT INTO gdo.db.mixed VALUES " +
      "(1,'a','x'), (2,'a','y'), (3,'b','x')")
    sqlS.sql("INSERT OVERWRITE gdo.db.mixed PARTITION (cat='a', sub) " +
      "VALUES (10, 'x')")
    val got = sqlS.sql("SELECT id, cat, sub FROM gdo.db.mixed ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((2L, "a", "y"), (3L, "b", "x"), (10L, "a", "x")), got)
    val t = GraftTable.load(s"$wh/db/mixed")
    assert(t.log.current.get.summary("replaced-partitions") == "1")
    assert(t.log.current.get.summary("rewritten-data-files") == "0")
  }

  test("property: random DML chains with dynamic overwrites match a driver-side model") {
    val rnd = new scala.util.Random(
      sys.env.getOrElse("GRAFT_FUZZ_SEED", "61").toLong)
    var nextId = 0L
    def fresh(n: Int): Seq[(Long, String)] =
      (0 until n).map { _ =>
        nextId += 1
        nextId -> s"c${nextId % 4}"
      }
    def df(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)),
        math.max(1, math.min(2, rows.size))), schema)

    for (trial <- 1 to 4) {
      val dir = s"$wh/db/prop$trial"
      val t = GraftTable.create(dir, schema, partitionBy = Seq("cat"))
      var model = scala.collection.mutable.LinkedHashMap[Long, String]()
      def commitModel(rows: Seq[(Long, String)]): Unit =
        rows.foreach { case (i, c) => model(i) = c }
      val first = fresh(8)
      t.append(df(first), Some(1000L)); commitModel(first)
      var ts = 2000L
      for (step <- 1 to 10) {
        ts += 1000L
        val ids = model.keys.toSeq
        val ops = Seq("append", "dyn", "dynEmpty", "deferred",
          "equality", "positional", "upsert", "compact")
          .filter(o => ids.nonEmpty ||
            o == "append" || o == "dyn" || o == "dynEmpty" || o == "compact")
        val op = ops(rnd.nextInt(ops.size))
        val handle = GraftTable.load(dir)
        op match {
          case "append" =>
            val rows = fresh(1 + rnd.nextInt(3))
            handle.append(df(rows), Some(ts)); commitModel(rows)
          case "dyn" =>
            // replace exactly the partitions the source writes into —
            // under WHATEVER MoR state is pending (demotion discipline)
            val rows = fresh(1 + rnd.nextInt(4))
            val touched = rows.map(_._2).toSet
            handle.overwritePartitionsDynamic(spark, df(rows), Some(ts))
            model = model.filterNot { case (_, c) => touched(c) }
            commitModel(rows)
          case "dynEmpty" =>
            handle.overwritePartitionsDynamic(spark,
              df(Nil).filter(col("id") < 0), Some(ts))
          case "deferred" =>
            val lo = nextId - rnd.nextInt(6)
            handle.deleteDeferred(spark, col("id") >= lo, Some(ts))
            model = model.filterNot { case (i, _) => i >= lo }
          case "equality" =>
            val victims = rnd.shuffle(ids).take(1 + rnd.nextInt(2))
            import spark.implicits._
            handle.deleteEquality(spark, victims.toDF("id"),
              Seq("id"), Some(ts))
            victims.foreach(model.remove)
          case "positional" =>
            val k = ids(rnd.nextInt(ids.size))
            handle.deletePositional(spark, col("id") === k, Some(ts))
            model.remove(k): Unit
          case "upsert" =>
            val k = ids(rnd.nextInt(ids.size))
            val rows = Seq(k -> "up") ++ fresh(1)
            handle.mergeEquality(spark, df(rows), Seq("id"), Some(ts))
            commitModel(rows)
          case "compact" =>
            handle.compact(spark, smallerThanBytes = Long.MaxValue,
              Some(ts)): Unit
        }
        val got = GraftTable.load(dir).read(spark)
          .select("id", "cat").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == model.toMap,
          s"trial $trial step $step ($op): visible rows diverged from " +
            s"the model — extra=${got.toSet -- model.toSet} " +
            s"missing=${model.toSet -- got.toSet}")
      }
      GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("degenerate forms: unpartitioned replaces all; empty source replaces nothing") {
    val t = GraftTable.create(s"$wh/db/unpart", schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.overwritePartitionsDynamic(spark, mkDf(9L -> "z"), Some(2000L))
    val t2 = GraftTable.load(s"$wh/db/unpart")
    assert(idsOf(t2) == Seq(9L))
    assert(t2.log.current.get.operation == "overwrite")

    val p = GraftTable.create(s"$wh/db/emptysrc", schema,
      partitionBy = Seq("cat"))
    p.append(mkDf(1L -> "a"), Some(1000L))
    val before = GraftTable.load(s"$wh/db/emptysrc").log.snapshots.size
    GraftTable.load(s"$wh/db/emptysrc").overwritePartitionsDynamic(spark,
      mkDf(2L -> "b").filter(col("id") < 0L), Some(2000L))
    val after = GraftTable.load(s"$wh/db/emptysrc")
    assert(after.log.snapshots.size == before,
      "an empty source must not commit a snapshot")
    assert(idsOf(after) == Seq(1L))
  }
}
