package graft.table

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** Write–audit–publish branches: metadata-only fork, isolated branch
  * commits (the branch is a full GraftTable), atomic fast-forward
  * publish, retention anchoring, and the conflict / drift refusals.
  */
class BranchSpec extends SparkSpecBase {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")

  test("fork is metadata-only and branch reads the parent's data") {
    val dir = tmpDir("graft-branch-fork")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("audit", Some(1500L))
    // no data byte copied: the branch dir holds no parquet
    val branchFiles = scala.util.Using.resource(java.nio.file.Files.walk(
      java.nio.file.Paths.get(t.dir, "branches", "audit"))) { st =>
      st.iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    assert(branchFiles == 0)
    assert(bt.read(spark).count() == 3)
    assert(bt.read(spark).select(sum($"id")).as[Long].head() == 6L)
  }

  test("branch commits are invisible to the parent until publish") {
    val dir = tmpDir("graft-branch-iso")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("audit", Some(1500L))
    bt.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"), Some(2000L))
    assert(t.read(spark).count() == 3)       // parent unchanged
    assert(bt.read(spark).count() == 5)      // branch sees both
    val snap = t.publishBranch("audit", Some(3000L))
    assert(snap.operation == "publish")
    assert(t.read(spark).count() == 5)       // one atomic commit
    assert(t.read(spark).select(sum($"id")).as[Long].head() == 15L)
    // time travel to the pre-publish snapshot still shows 3 rows
    assert(t.read(spark, Some(1L)).count() == 3)
  }

  test("branch DML (delete + compact) publishes the audited state") {
    val dir = tmpDir("graft-branch-dml")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("fix", Some(1500L))
    bt.append(Seq((4L, "dup"), (5L, "dup")).toDF("id", "v"), Some(2000L))
    bt.delete(spark, col("v") === "dup" && col("id") === 5L, Some(2500L))
    assert(bt.read(spark).count() == 4)
    t.publishBranch("fix", Some(3000L))
    assert(t.read(spark).count() == 4)
    assert(t.read(spark).filter($"id" === 5L).count() == 0)
    // the parent's change feed nets the publish as one insert delta
    val feed = t.changes(spark, fromSnapshotId = 1L)
    assert(feed.count() == 1)
    assert(feed.select($"id").as[Long].collect().toSet == Set(4L))
  }

  test("abandoned branch leaves no trace; unpublished data deleted") {
    val dir = tmpDir("graft-branch-drop")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("bad", Some(1500L))
    bt.append(Seq((9L, "x")).toDF("id", "v"), Some(2000L))
    t.dropBranch("bad")
    assert(t.branches.isEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "branches", "bad")))
    assert(t.read(spark).count() == 3)
  }

  test("publish refuses when the parent advanced past the fork") {
    val dir = tmpDir("graft-branch-conflict")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("late", Some(1500L))
    bt.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    t.append(Seq((6L, "f")).toDF("id", "v"), Some(2500L)) // parent moves on
    val e = intercept[IllegalArgumentException] {
      t.publishBranch("late", Some(3000L))
    }
    assert(e.getMessage.contains("advanced past fork"))
    t.dropBranch("late")
  }

  test("publish refuses schema drift; double publish refuses") {
    val dir = tmpDir("graft-branch-drift")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    t.createBranch("evo", Some(1500L))
    t.branch("evo").addColumn("extra", org.apache.spark.sql.types.LongType)
    val e = intercept[IllegalArgumentException] {
      t.publishBranch("evo", Some(2000L))
    }
    assert(e.getMessage.contains("evolved its schema"))
    t.dropBranch("evo")
    val bt2 = t.createBranch("ok", Some(2500L))
    bt2.append(Seq((4L, "d")).toDF("id", "v"), Some(3000L))
    t.publishBranch("ok", Some(3500L))
    val e2 = intercept[IllegalArgumentException] {
      t.publishBranch("ok", Some(4000L))
    }
    assert(e2.getMessage.contains("already published"))
  }

  test("live branch forks anchor parent expiration; branch expire never reclaims parent bytes") {
    val dir = tmpDir("graft-branch-expire")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))            // snap 1 = fork anchor
    val bt = t.createBranch("hold", Some(1200L))
    bt.append(Seq((4L, "d")).toDF("id", "v"), Some(1300L))
    // branch-side expiration: fork snapshot 1 expires off the branch log,
    // but its `../../` files belong to the parent and must survive
    bt.append(Seq((5L, "e")).toDF("id", "v"), Some(1400L))
    // parent files still readable through the parent afterwards
    bt.expireSnapshots(olderThanMillis = 1350L)
    assert(t.read(spark).count() == 3)
    // parent-side: snapshot 1 is a live branch's fork → expire keeps it
    t.append(Seq((7L, "g")).toDF("id", "v"), Some(2000L))
    val expired = t.expireSnapshots(olderThanMillis = 5000L)
    assert(!expired.contains(1L))
    assert(t.log.byId(1L).isDefined)
  }

  test("published branch data is physically reclaimed once compaction re-owns it") {
    val dir = tmpDir("graft-branch-reclaim")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("pub", Some(1500L))
    bt.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    t.publishBranch("pub", Some(2500L))
    t.dropBranch("pub")
    def branchParquets = {
      val root = java.nio.file.Paths.get(dir, "branches", "pub", "data")
      if (!java.nio.file.Files.exists(root)) 0L
      else scala.util.Using.resource(java.nio.file.Files.walk(root)) {
        _.iterator().asScala.count(_.toString.endsWith(".parquet"))
      }
    }
    assert(branchParquets == 1L) // still live under the parent's manifest
    // compaction rewrites into the parent's own data dir; expiration then
    // reclaims the orphaned bytes under branches/ — full lifecycle closure
    t.compact(spark, smallerThanBytes = Long.MaxValue, committedAt = Some(3000L))
    t.expireSnapshots(olderThanMillis = 10000L)
    assert(branchParquets == 0L, "published-branch bytes were not reclaimed")
    assert(t.read(spark).count() == 4)
  }

  test("branch names with path traversal or separators are rejected") {
    val dir = tmpDir("graft-branch-names")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    for (bad <- Seq("..", ".", "a/b", "a\\b", "x y", "", "42"))
      intercept[IllegalArgumentException] { t.createBranch(bad) }
    assert(t.branches.isEmpty)
  }

  test("refs metadata table lists tags and branches; retain-last floors expiration") {
    val dir = tmpDir("graft-refs")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    t.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    t.append(Seq((5L, "e")).toDF("id", "v"), Some(3000L))
    t.tag("gold", 1L)
    t.createBranch("wip", Some(3500L))
    val refs = t.refsTable(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs == Set(("gold", "tag", 1L), ("wip", "branch", 3L)))
    t.dropBranch("wip")
    t.dropTag("gold")
    // aggressive age cutoff, but retainLast=3 keeps the whole history
    assert(t.expireSnapshots(olderThanMillis = 5000L, retainLast = 3).isEmpty)
    assert(t.log.snapshots.size == 3)
    // retainLast=2 expires exactly the oldest
    assert(t.expireSnapshots(olderThanMillis = 5000L, retainLast = 2) == Seq(1L))
    assert(t.log.snapshots.map(_.snapshotId) == Seq(2L, 3L))
  }

  test("published branch files survive dropBranch and parent compaction reowns them") {
    val dir = tmpDir("graft-branch-compact")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("pub", Some(1500L))
    bt.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    t.publishBranch("pub", Some(2500L))
    t.dropBranch("pub")
    assert(t.read(spark).count() == 4)     // branches/pub/data/... still live
    // compaction rewrites everything into the parent's own data dir
    val snap = t.compact(spark, smallerThanBytes = Long.MaxValue,
      committedAt = Some(3000L))
    assert(snap.isDefined)
    val m = Manifest.read(s"$dir/${snap.get.manifestList}")
    assert(m.files.forall(f => f.path.startsWith("data/")))
    assert(t.read(spark).count() == 4)
  }

  test("per-ref retention: an aged-out tag is dropped and stops anchoring") {
    val dir = tmpDir("graft-ref-age")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    t.append(base, Some(2000L))
    t.append(base, Some(3000L))
    // an AGED tag on snapshot 1 (created far in the past, 1h ttl) and a
    // FRESH policy-less tag on snapshot 2
    t.tag("old-audit", 1L, maxRefAgeMs = Some(3600L * 1000),
      createdAtMs = Some(System.currentTimeMillis() - 7200L * 1000))
    t.tag("keep", 2L)
    // global policy would expire snapshots 1+2; the aged tag is dropped
    // first (stops anchoring), the plain tag still anchors snapshot 2
    val expired = t.expireSnapshots(Long.MaxValue, retainLast = 1)
    assert(expired == Seq(1L), s"expired=$expired")
    assert(t.refs.keySet == Set("keep"), t.refs.toString)
    assert(t.log.snapshots.map(_.snapshotId) == Seq(2L, 3L))
    // a YOUNG tag with a policy is untouched
    t.tag("young", 3L, maxRefAgeMs = Some(3600L * 1000))
    t.expireSnapshots(Long.MaxValue, retainLast = 1)
    assert(t.refs.keySet == Set("keep", "young"))
  }

  test("per-ref retention: an aged-out unpublished branch dies with its candidate data") {
    val dir = tmpDir("graft-branch-age")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    t.createBranch("stale-experiment", Some(1500L),
      maxRefAgeMs = Some(3600L * 1000),
      createdAtMs = Some(System.currentTimeMillis() - 7200L * 1000))
    t.createBranch("live-experiment", Some(1600L),
      maxRefAgeMs = Some(3600L * 1000))
    t.append(base, Some(2000L))
    t.expireSnapshots(0L, retainLast = 1) // expires nothing by age…
    // …but the aged branch ref is gone, dir and all; the young one lives
    assert(t.branches.keySet == Set("live-experiment"), t.branches.toString)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "branches", "stale-experiment")))
    assert(t.branch("live-experiment").read(spark).count() == 3)
  }

  test("per-branch retention: the branch chain keeps its min floor under an aggressive global policy") {
    val dir = tmpDir("graft-branch-floor")
    val t = GraftTable.create(dir, base.schema)
    t.append(base, Some(1000L))
    val bt = t.createBranch("audit", Some(1500L),
      minSnapshotsToKeep = Some(3))
    import spark.implicits._
    bt.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    bt.append(Seq((5L, "e")).toDF("id", "v"), Some(3000L))
    bt.append(Seq((6L, "f")).toDF("id", "v"), Some(4000L))
    assert(bt.log.snapshots.size == 4)
    // the parent's global policy says "expire EVERYTHING old" — the
    // branch keeps its 3-snapshot floor (and the parent its retain-last)
    t.append(base, Some(5000L))
    t.expireSnapshots(Long.MaxValue, retainLast = 1)
    val b2 = t.branch("audit")
    assert(b2.log.snapshots.size == 3,
      s"floor violated: ${b2.log.snapshots.map(_.snapshotId)}")
    assert(b2.read(spark).count() == 6)
    // a TIGHTER per-branch age (max_snapshot_age_ms = 0 → everything
    // expirable) shrinks the chain to the floor even when the global
    // call expires nothing
    val t2dir = tmpDir("graft-branch-tight")
    val t2 = GraftTable.create(t2dir, base.schema)
    t2.append(base, Some(1000L))
    val bt2 = t2.createBranch("fast", Some(1500L),
      minSnapshotsToKeep = Some(1), maxSnapshotAgeMs = Some(0L))
    bt2.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))
    bt2.append(Seq((5L, "e")).toDF("id", "v"), Some(3000L))
    t2.expireSnapshots(0L, retainLast = 10) // global: expire nothing
    assert(t2.log.snapshots.size == 1)
    val b3 = t2.branch("fast")
    assert(b3.log.snapshots.size == 1,
      s"tight age ignored: ${b3.log.snapshots.map(_.snapshotId)}")
    assert(b3.read(spark).count() == 5)
  }

  test("retention policy survives publish and CALL args reach the refs") {
    val dir = tmpDir("graft-ref-call")
    val wh = s"$dir/wh"
    val cat = new GraftCatalog(wh)
    val t = cat.createTable("db.reft", base.schema)
    t.append(base, Some(1000L))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.gref", "graft.table.GraftSparkCatalog")
    s2.conf.set("spark.sql.catalog.gref.warehouse", wh)
    s2.sql("CALL gref.system.create_tag('db.reft', 'rel', " +
      "max_ref_age_ms => 3600000)").collect()
    s2.sql("CALL gref.system.create_branch('db.reft', 'wip', " +
      "min_snapshots_to_keep => 2, max_snapshot_age_ms => 3600000)")
      .collect()
    val t2 = GraftTable.load(s"$wh/db/reft")
    assert(t2.refs.contains("rel"))
    assert(t2.branchRetention.get("wip").exists { case (_, _, mk, sa) =>
      mk.contains(2) && sa.contains(3600000L) })
    // publishBranch rewrites the (fork, published) pair — policy keys
    // survive the rewrite
    t2.branch("wip").append(base, Some(2000L))
    t2.publishBranch("wip", Some(3000L))
    assert(t2.branchRetention.get("wip").exists { case (_, _, mk, _) =>
      mk.contains(2) })
  }

  test("ref DDL: ALTER TABLE CREATE/DROP BRANCH|TAG through the parser extension") {
    val wh = tmpDir("graft-refddl-wh")
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    sE.conf.set("spark.sql.catalog.grd", "graft.table.GraftSparkCatalog")
    sE.conf.set("spark.sql.catalog.grd.warehouse", wh)
    val t = GraftTable.create(s"$wh/db/t", base.schema)
    t.append(base, Some(1000L))                               // snap 1
    t.append(Seq((4L, "d")).toDF("id", "v"), Some(2000L))     // snap 2
    // tag the CURRENT snapshot and an explicit older one
    val tg = sE.sql("ALTER TABLE grd.db.t CREATE TAG stable").collect()
    assert(tg.head.getString(1) == "tag" && tg.head.getLong(2) == 2L)
    sE.sql("ALTER TABLE grd.db.t CREATE TAG v1 AS OF VERSION 1").collect()
    assert(GraftTable.load(s"$wh/db/t").refs ==
      Map("stable" -> 2L, "v1" -> 1L))
    // reads through the catalog resolve the tag
    assert(sE.sql("SELECT count(*) FROM grd.db.t VERSION AS OF 'v1'")
      .head().getLong(0) == 3L)
    // branch forks the current tip; the WAP flow runs from DDL + CALL
    val br = sE.sql("ALTER TABLE grd.db.t CREATE BRANCH audit").collect()
    assert(br.head.getString(1) == "branch" && br.head.getLong(2) == 2L)
    assert(GraftTable.load(s"$wh/db/t").branches.contains("audit"))
    // AS OF VERSION on a branch refuses (branches fork from the tip)
    val e = intercept[Exception] { sE.sql(
      "ALTER TABLE grd.db.t CREATE BRANCH old AS OF VERSION 1").collect() }
    assert(e.getMessage.contains("CURRENT snapshot"), e.getMessage)
    // drops
    sE.sql("ALTER TABLE grd.db.t DROP BRANCH audit").collect()
    sE.sql("ALTER TABLE grd.db.t DROP TAG v1").collect()
    val after = GraftTable.load(s"$wh/db/t")
    assert(after.refs == Map("stable" -> 2L) && after.branches.isEmpty)
  }

  test("SQL-shop WAP: <table>__branch_<b> routes DML to the branch; main untouched until publish") {
    val wh = tmpDir("graft-wapsql-wh")
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    sE.conf.set("spark.sql.catalog.gwb", "graft.table.GraftSparkCatalog")
    sE.conf.set("spark.sql.catalog.gwb.warehouse", wh)
    val t = GraftTable.create(s"$wh/db/w", base.schema)
    t.append(base, Some(1000L))
    sE.sql("ALTER TABLE gwb.db.w CREATE BRANCH audit").collect()
    // the FULL SQL DML surface stages on the branch handle
    sE.sql("INSERT INTO gwb.db.w__branch_audit VALUES (4, 'd')")
    sE.sql("UPDATE gwb.db.w__branch_audit SET v = 'B' WHERE id = 2")
    sE.sql("DELETE FROM gwb.db.w__branch_audit WHERE id = 1")
    sE.sql("MERGE INTO gwb.db.w__branch_audit t USING " +
      "(SELECT 5L AS id, 'e' AS v) s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)")
    def rows(q: String) = sE.sql(q).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val audited = Seq(2L -> "B", 3L -> "c", 4L -> "d", 5L -> "e")
    // audit reads: the staged-name SELECT and VERSION AS OF agree
    assert(rows("SELECT id, v FROM gwb.db.w__branch_audit ORDER BY id")
      == audited)
    assert(rows("SELECT id, v FROM gwb.db.w VERSION AS OF 'branch:audit' " +
      "ORDER BY id") == audited)
    // main untouched until publish
    assert(rows("SELECT id, v FROM gwb.db.w ORDER BY id") ==
      Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    sE.sql("CALL gwb.system.publish_branch('db.w', 'audit')").collect()
    assert(rows("SELECT id, v FROM gwb.db.w ORDER BY id") == audited)
    // a real table named like the staged form wins over the routing
    sE.sql("CREATE TABLE gwb.db.real__branch_x (id BIGINT, v STRING)")
    sE.sql("INSERT INTO gwb.db.real__branch_x VALUES (9, 'z')")
    assert(rows("SELECT id, v FROM gwb.db.real__branch_x") == Seq(9L -> "z"))
    // unknown branch refuses with direction
    val e = intercept[Exception] {
      sE.sql("SELECT * FROM gwb.db.w__branch_nope").collect()
    }
    assert(e.getMessage.contains("no branch 'nope'"), e.getMessage)
  }

  test("session WAP mode: graft.wap.branch routes opted-in tables to the branch") {
    val wh = tmpDir("graft-wapconf-wh")
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    sE.conf.set("spark.sql.catalog.gwc", "graft.table.GraftSparkCatalog")
    sE.conf.set("spark.sql.catalog.gwc.warehouse", wh)
    val t = GraftTable.create(s"$wh/db/w", base.schema,
      properties = Map("graft.wap.enabled" -> "true"))
    t.append(base, Some(1000L))
    val other = GraftTable.create(s"$wh/db/plain", base.schema)
    other.append(base, Some(1000L))
    t.createBranch("audit", Some(2000L))
    try {
      sE.conf.set("graft.wap.branch", "audit")
      // reads AND writes of the opted-in table land on the branch
      sE.sql("INSERT INTO gwc.db.w VALUES (4, 'd')")
      sE.sql("DELETE FROM gwc.db.w WHERE id = 1")
      assert(sE.sql("SELECT id FROM gwc.db.w ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
      // main is untouched (library read bypasses the session conf)
      assert(GraftTable.load(s"$wh/db/w").read(spark).count() == 3L)
      // tables WITHOUT the opt-in property ignore the session conf
      sE.sql("INSERT INTO gwc.db.plain VALUES (9, 'z')")
      assert(sE.sql("SELECT count(*) FROM gwc.db.plain")
        .head().getLong(0) == 4L)
      assert(GraftTable.load(s"$wh/db/plain").read(spark).count() == 4L)
      // an opted-in table MISSING the branch refuses loudly (a typo
      // must never quietly write to main)
      val t2 = GraftTable.create(s"$wh/db/w2", base.schema,
        properties = Map("graft.wap.enabled" -> "true"))
      t2.append(base, Some(1000L))
      val e = intercept[Exception] {
        sE.sql("SELECT * FROM gwc.db.w2").collect()
      }
      assert(e.getMessage.contains("no branch 'audit'"), e.getMessage)
      // unset: the very next query is back on main (stateless)
      sE.conf.unset("graft.wap.branch")
      assert(sE.sql("SELECT id FROM gwc.db.w ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // publish lands the audited state
      GraftTable.load(s"$wh/db/w").publishBranch("audit", Some(3000L))
      assert(sE.sql("SELECT id FROM gwc.db.w ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    } finally {
      try sE.conf.unset("graft.wap.branch") catch { case _: Exception => () }
    }
  }
}
