package graft.table

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Write constraints (`graft.check.*`, `graft.notnull.columns`) enforced
  * in the write job itself — no extra validation pass, nothing committed
  * on violation — plus the `partitions` metadata table.
  */
class ConstraintSpec extends SparkSpecBase {
  import spark.implicits._

  private def mkTable(dir: String, props: Map[String, String]) =
    GraftTable.create(dir, Seq((1L, "a", 1)).toDF("id", "v", "n").schema, props)

  test("CHECK constraint fails the write job and commits nothing") {
    val dir = tmpDir("graft-check")
    val t = mkTable(dir, Map("graft.check.pos" -> "n >= 0"))
    t.append(Seq((1L, "a", 5)).toDF("id", "v", "n"), Some(1000L))
    val e = intercept[Exception] {
      t.append(Seq((2L, "b", -1)).toDF("id", "v", "n"), Some(2000L))
    }
    assert(e.getMessage != null)
    assert(t.log.snapshots.size == 1)          // nothing committed
    assert(t.read(spark).count() == 1)
    // no staging garbage left behind
    val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.getFileName.toString.startsWith(".staging"))
      .count()
    assert(leftovers == 0)
  }

  test("NULL check predicate passes (SQL CHECK semantics)") {
    val dir = tmpDir("graft-checknull")
    val t = GraftTable.create(dir,
      Seq((1L, Option(1))).toDF("id", "n").schema,
      Map("graft.check.pos" -> "n >= 0"))
    // n = NULL → predicate NULL → row passes
    t.append(Seq((1L, None: Option[Int])).toDF("id", "n"), Some(1000L))
    assert(t.read(spark).count() == 1)
  }

  test("NOT NULL columns reject null writes") {
    val dir = tmpDir("graft-notnull")
    val t = GraftTable.create(dir,
      Seq((1L, Option("x"))).toDF("id", "v").schema,
      Map("graft.notnull.columns" -> "v"))
    t.append(Seq((1L, Option("a"))).toDF("id", "v"), Some(1000L))
    intercept[Exception] {
      t.append(Seq((2L, None: Option[String])).toDF("id", "v"), Some(2000L))
    }
    assert(t.log.snapshots.size == 1)
  }

  test("constraints gate copy-on-write UPDATE rewrites too") {
    val dir = tmpDir("graft-checkupd")
    val t = mkTable(dir, Map("graft.check.pos" -> "n >= 0"))
    t.append(Seq((1L, "a", 5), (2L, "b", 6)).toDF("id", "v", "n"), Some(1000L))
    intercept[Exception] {
      t.update(spark, col("id") === 1L, Map("n" -> lit(-7)), Some(2000L))
    }
    assert(t.log.snapshots.size == 1)
    assert(t.read(spark).filter($"n" < 0).count() == 0)
    // a constraint-respecting update still works
    t.update(spark, col("id") === 1L, Map("n" -> lit(7)), Some(3000L))
    assert(t.read(spark).filter($"id" === 1L).select($"n").as[Int].head() == 7)
  }

  test("constraints gate streaming batch appends; a failed batch leaves the cursor") {
    val dir = tmpDir("graft-checkstream")
    val t = mkTable(dir, Map("graft.check.pos" -> "n >= 0"))
    t.appendStreamBatch(Seq((1L, "a", 1)).toDF("id", "v", "n"),
      sinkId = "s", batchId = 0L, Some(1000L))
    intercept[Exception] {
      t.appendStreamBatch(Seq((2L, "b", -1)).toDF("id", "v", "n"),
        sinkId = "s", batchId = 1L, Some(2000L))
    }
    // the violating batch committed nothing and did NOT advance the
    // cursor — the stream's retry of batch 1 re-ingests (at-least-once)
    assert(t.streamCursors == Map("s" -> 0L))
    t.appendStreamBatch(Seq((2L, "b", 7)).toDF("id", "v", "n"),
      sinkId = "s", batchId = 1L, Some(3000L))
    assert(t.streamCursors == Map("s" -> 1L))
    assert(t.read(spark).count() == 2)
  }

  test("branch cycle on a PARTITIONED table keeps identity recovery per root") {
    val dir = tmpDir("graft-branch-part")
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val t = GraftTable.create(dir, df0.schema, partitionBy = Seq("cat"))
    t.append(df0, Some(1000L))
    val bt = t.createBranch("p", Some(1500L))
    bt.append(Seq((3L, "a"), (4L, "c")).toDF("id", "cat"), Some(2000L))
    // branch read mixes fork-root and branch-root partitioned files
    assert(bt.read(spark).select($"cat").as[String].collect().sorted.toSeq
      == Seq("a", "a", "b", "c"))
    t.publishBranch("p", Some(2500L))
    assert(t.read(spark).count() == 4)
    // partition pruning still holds across the two roots
    val pruned = t.scan(spark, Some(col("cat") === "c"))
    assert(pruned.select($"id").as[Long].collect().toSeq == Seq(4L))
    // and the partitions view aggregates across roots
    val parts = t.partitionsTable(spark)
      .select(element_at($"partition", "cat").as("c"), $"record_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parts == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
  }

  test("copy-on-write DELETE drops fully-matching files metadata-only") {
    // partition slice: the cat='a' files' synthesized stats PROVE every
    // row matches -> manifest edit, zero rewrite I/O
    val dir = tmpDir("graft-dropdel")
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat")
    val t = GraftTable.create(dir, df.schema, partitionBy = Seq("cat"))
    t.append(df, Some(1000L))
    val snap = t.delete(spark, col("cat") === "a", Some(2000L)).get
    assert(snap.summary("dropped-data-files").toInt >= 1)
    assert(snap.summary("rewritten-data-files") == "0")
    assert(snap.summary("deleted-records") == "2")
    assert(t.read(spark).select($"id").as[Long].collect().toSeq == Seq(3L))
    // time travel still sees the dropped slice (files untouched on disk)
    assert(t.read(spark, Some(1L)).count() == 3)
    // and CDC nets the drop as two delete rows
    val cdc = t.changesCdc(spark, 1L)
    assert(cdc.filter($"_change_type" === "delete").count() == 2)

    // range proof on plain footer stats: ids 1-2 file drops, 10-11 stays
    val u = GraftTable.create(tmpDir("graft-dropdel-u"), df.schema)
    u.append(Seq((1L, "x"), (2L, "x")).toDF("id", "cat"), Some(1000L))
    u.append(Seq((10L, "y"), (11L, "y")).toDF("id", "cat"), Some(2000L))
    val s2 = u.delete(spark, col("id") < 5L, Some(3000L)).get
    // the 2-row input may land as 1-2 files depending on parallelism;
    // all of them prove and drop, none rewrites
    assert(s2.summary("dropped-data-files").toInt >= 1)
    assert(s2.summary("rewritten-data-files") == "0")
    assert(u.read(spark).select($"id").as[Long].collect().sorted.toSeq
      == Seq(10L, 11L))
  }

  test("countWhere: metadata-accelerated predicate counts match a full scan") {
    val dir = tmpDir("graft-countwhere")
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("id", "cat")
    val t = GraftTable.create(dir, df.schema, partitionBy = Seq("cat"))
    t.append(df, Some(1000L))
    def scanCount(p: org.apache.spark.sql.Column) =
      t.read(spark).filter(p).count()
    for (p <- Seq(col("cat") === "a", col("cat") =!= "b", col("id") < 4L,
        col("id") >= 3L && col("cat") === "b", col("cat") === "zzz",
        col("id").isNotNull, col("cat").isin("a", "c")))
      assert(t.countWhere(spark, p) == scanCount(p), s"predicate $p")
    // time travel: count at an earlier snapshot
    t.delete(spark, col("cat") === "a", Some(2000L))
    assert(t.countWhere(spark, col("cat") === "a") == 0L)
    assert(t.countWhere(spark, col("cat") === "a", Some(1L)) == 2L)
  }

  test("__partitions and __refs resolve through the catalog naming convention") {
    val wh = tmpDir("graft-sysnames")
    val cat = new GraftCatalog(wh)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val t = cat.createTable("db.part", df.schema, partitionBy = Seq("cat"))
    t.append(df, Some(1000L))
    t.tag("v1", 1L)
    val parts = cat.loadDataFrame(spark, "db.part__partitions")
      .select(element_at($"partition", "cat").as("c"), $"record_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parts == Map("a" -> 1L, "b" -> 1L))
    val refs = cat.loadDataFrame(spark, "db.part__refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq == Seq(("v1", "tag", 1L)))
  }

  test("partitions metadata table aggregates the manifest per partition") {
    val dir = tmpDir("graft-parts")
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "cat")
    val t = GraftTable.create(dir, df.schema, partitionBy = Seq("cat"))
    t.append(df, Some(1000L))
    t.append(Seq((4L, "a")).toDF("id", "cat"), Some(2000L))
    val parts = t.partitionsTable(spark)
      .select(element_at($"partition", "cat").as("cat"),
        $"record_count", $"file_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(parts == Map("a" -> 3L, "b" -> 1L))
    // unpartitioned: one row, empty partition map
    val u = GraftTable.create(tmpDir("graft-parts-u"), df.schema)
    u.append(df, Some(1000L))
    val row = u.partitionsTable(spark).collect()
    assert(row.length == 1)
    assert(row.head.getMap[String, String](0).isEmpty)
    assert(row.head.getLong(2) == 3L)
  }
}
