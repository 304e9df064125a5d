package graft.table

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Atomic `CREATE OR REPLACE TABLE … AS SELECT`
  * ([[GraftTable.replaceAtomic]] + the `GraftRtasCommand` SQL route):
  * schema/partitioning/content swap in one recoverable commit — the old
  * table serves until the atomicity point, a mid-swap kill heals to the
  * complete new table on the next read, pre-commit failures leave the
  * old table untouched with no protocol residue, and old files become
  * reclaimable orphans. */
class ReplaceTableSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def ids(dir: String): Seq[Long] =
    GraftTable.load(dir).read(spark).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq

  private lazy val wh = tmpDir("graft-rtas")

  private lazy val sqlS: org.apache.spark.sql.SparkSession = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .create()
    s.conf.set("spark.sql.catalog.grt", "graft.table.GraftSparkCatalog")
    s.conf.set("spark.sql.catalog.grt.warehouse", wh)
    s
  }

  test("replaceAtomic swaps schema, partitioning and content in one event") {
    val dir = s"$wh/db/lib"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    t.append(mkDf(3L -> "c"), Some(2000L))
    import spark.implicits._
    val newDf = Seq((10L, "x", 1), (11L, "y", 2)).toDF("id", "txt", "part")
    val t2 = GraftTable.replaceAtomic(dir, newDf,
      properties = Map("graft.check.pos" -> "id > 0"),
      partitionBy = Seq("part"), committedAt = Some(3000L))
    assert(t2.schema.fieldNames.toSeq == Seq("id", "txt", "part"))
    assert(t2.partitionColumns == Seq("part"))
    assert(t2.properties("graft.check.pos") == "id > 0")
    assert(ids(dir) == Seq(10L, 11L))
    // REPLACE has (atomic) DROP+CREATE semantics: history restarts
    assert(t2.log.snapshots.map(_.snapshotId) == Seq(1L))
    // no protocol residue
    assert(!Files.exists(Paths.get(dir, GraftTable.ReplacePendingFile)))
    assert(scala.util.Using.resource(Files.list(Paths.get(dir))) { st =>
      !st.iterator().asScala.exists(_.getFileName.toString.contains(".rtas-"))
    })
    // ordinary commits proceed (claim released)
    val t3 = GraftTable.load(dir)
    t3.append(newDf.limit(0), Some(4000L))
    assert(GraftTable.load(dir).log.snapshots.size == 2)
    // old data files are unreferenced: the orphan sweep reclaims them
    val removed = GraftTable.load(dir).removeOrphanFiles(olderThanMillis = 0L)
    assert(removed.nonEmpty, "old table files must become orphans")
    assert(ids(dir) == Seq(10L, 11L), "sweep must not touch the new table")
  }

  test("crash injection: pre-commit failures keep the OLD table; post-commit heals to the NEW one") {
    import spark.implicits._
    for (step <- Seq("staged", "pointer")) {
      val dir = s"$wh/db/crash_pre_$step"
      GraftTable.create(dir, schema).append(mkDf(1L -> "a"), Some(1000L))
      GraftTable.replaceCrashAt =
        s => if (s == step) throw new RuntimeException("kill")
      try intercept[RuntimeException] {
        GraftTable.replaceAtomic(dir, Seq((9L, "z")).toDF("id", "data"))
      } finally GraftTable.replaceCrashAt = _ => ()
      // old table fully intact AND writable (claim + pointer cleaned by
      // the graceful-failure path)
      assert(ids(dir) == Seq(1L), step)
      assert(!Files.exists(Paths.get(dir, GraftTable.ReplacePendingFile)), step)
      GraftTable.load(dir).append(mkDf(2L -> "b"), Some(2000L))
      assert(ids(dir) == Seq(1L, 2L), step)
    }
    for (step <- Seq("meta-swapped", "log-swapped")) {
      val dir = s"$wh/db/crash_post_${step.takeWhile(_ != '-')}"
      GraftTable.create(dir, schema).append(mkDf(1L -> "a"), Some(1000L))
      GraftTable.replaceCrashAt =
        s => if (s == step) throw new RuntimeException("kill")
      try intercept[RuntimeException] {
        GraftTable.replaceAtomic(dir, Seq((9L, "z")).toDF("id", "data"),
          committedAt = Some(2000L))
      } finally GraftTable.replaceCrashAt = _ => ()
      // a kill -9 would also leave the commit claim — plant it back to
      // prove the heal releases it too
      val claim = Paths.get(dir, "manifests/.commit-00002")
      if (!Files.exists(claim)) Files.createFile(claim)
      // past the atomicity point: the next plain read serves the
      // complete NEW table (log rename healed, pointer + claim swept)
      assert(ids(dir) == Seq(9L), step)
      assert(!Files.exists(Paths.get(dir, GraftTable.ReplacePendingFile)), step)
      assert(!Files.exists(claim), step)
      GraftTable.load(dir).append(
        Seq((10L, "w")).toDF("id", "data"), Some(3000L))
      assert(ids(dir) == Seq(9L, 10L), step)
    }
  }

  test("a replace in flight blocks committers and the orphan sweep, loudly") {
    import spark.implicits._
    val dir = s"$wh/db/inflight"
    val t = GraftTable.create(dir, schema)
    t.append(mkDf(1L -> "a"), Some(1000L))
    // freeze the replace just after its pointer landed (pre-commit)
    GraftTable.replaceCrashAt =
      s => if (s == "pointer") throw new RuntimeException("freeze")
    // keep the pointer: simulate the kill by re-planting state the
    // graceful path cleans (pointer + claim)
    try intercept[RuntimeException] {
      GraftTable.replaceAtomic(dir, Seq((9L, "z")).toDF("id", "data"))
    } finally GraftTable.replaceCrashAt = _ => ()
    graft.util.Json.writeFileAtomic(
      Paths.get(dir, GraftTable.ReplacePendingFile).toString,
      graft.util.Json.write(Map(
        "meta" -> "metadata.json.rtas-dead", "log" -> "snapshots.json.rtas-dead",
        "claim" -> "manifests/.commit-00002")))
    Files.writeString(Paths.get(dir, "metadata.json.rtas-dead"), "{}")
    // pointer present + staged metadata present = uncommitted: reads
    // serve the OLD table, the orphan sweep refuses
    assert(ids(dir) == Seq(1L))
    val e = intercept[IllegalArgumentException] {
      GraftTable.load(dir).removeOrphanFiles(0L)
    }
    assert(e.getMessage.contains("REPLACE is in flight"), e.getMessage)
    Files.deleteIfExists(Paths.get(dir, GraftTable.ReplacePendingFile))
    Files.deleteIfExists(Paths.get(dir, "metadata.json.rtas-dead"))
  }

  test("SQL: CREATE OR REPLACE TABLE AS SELECT is atomic; REPLACE of a missing table refuses") {
    sqlS.sql("CREATE TABLE grt.db.sq (id BIGINT, data STRING)")
    sqlS.sql("INSERT INTO grt.db.sq VALUES (1, 'a'), (2, 'b')")
    // replace with a DIFFERENT schema + a partition spec
    sqlS.sql("CREATE OR REPLACE TABLE grt.db.sq PARTITIONED BY (part) AS " +
      "SELECT id * 10 AS id, CAST(id % 2 AS INT) AS part FROM grt.db.sq")
    assert(sqlS.sql("SELECT id, part FROM grt.db.sq ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq(10L -> 1, 20L -> 0))
    assert(GraftTable.load(s"$wh/db/sq").partitionColumns == Seq("part"))
    // history restarted: snapshot 1 is the replacement
    assert(sqlS.sql("SELECT count(*) FROM grt.db.sq VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // CREATE OR REPLACE on a missing table degrades to CTAS
    sqlS.sql("CREATE OR REPLACE TABLE grt.db.fresh AS SELECT 5 AS n")
    assert(sqlS.sql("SELECT n FROM grt.db.fresh").head().getInt(0) == 5)
    // bare REPLACE on a missing table refuses loudly
    val e = intercept[Exception] {
      sqlS.sql("REPLACE TABLE grt.db.nope AS SELECT 1 AS n")
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // the DataFrameWriterV2 spelling routes to the same atomic swap
    import sqlS.implicits._
    Seq((7L, "api")).toDF("id", "data").writeTo("grt.db.sq").createOrReplace()
    assert(sqlS.sql("SELECT id, data FROM grt.db.sq").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq(7L -> "api"))
    assert(GraftTable.load(s"$wh/db/sq").log.snapshots.map(_.snapshotId)
      == Seq(1L))
  }
}
