package graft.table

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Warehouse transactions: multi-table staged commits publish
  * all-or-nothing. The matrix: atomic visibility (a reader between
  * stage and publish sees NEITHER table's change), crash injection at
  * every publish step (pointers → marker → swaps → cleanup) with
  * reader-side roll-forward, conflicts against single-table committers
  * and other transactions, rollback, recovery, and the staged-handle
  * guard rails (no metadata/ref DDL, no maintenance). */
class GraftTransactionSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private def ids(t: GraftTable): Seq[Long] =
    t.read(spark).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def freshWh(tag: String): (String, GraftCatalog) = {
    val wh = tmpDir(tag)
    val cat = new GraftCatalog(wh)
    (wh, cat)
  }

  private def seed(cat: GraftCatalog): (GraftTable, GraftTable) = {
    val corpus = cat.createTable("db.corpus", schema)
    corpus.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    val index = cat.createTable("db.index", schema)
    index.append(mkDf(10L -> "x"), Some(1000L))
    (corpus, index)
  }

  test("two-table transaction publishes atomically; pre-publish reads see neither") {
    val (wh, cat) = freshWh("txn_atomic")
    val (corpus, index) = seed(cat)
    val txn = cat.beginTransaction()
    val sc = txn.table("db.corpus")
    val si = txn.table("db.index")
    sc.append(mkDf(3L -> "c"), Some(2000L))
    si.append(mkDf(11L -> "y"), Some(2000L))
    // the transaction's own handles read their staged state…
    assert(ids(sc) == Seq(1L, 2L, 3L) && ids(si) == Seq(10L, 11L))
    // …but published readers see NEITHER staged commit
    assert(ids(corpus) == Seq(1L, 2L) && ids(index) == Seq(10L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L))
    txn.commit()
    // one visible event: both tables flipped
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L))
    // protocol state fully swept
    assert(!Files.exists(Paths.get(wh, "db", "corpus", ".txn-pending")))
    assert(!Files.exists(Paths.get(wh, "_txns", txn.id)))
    // claims released: ordinary commits proceed
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L, 4L))
  }

  test("transact block: success publishes, an exception rolls everything back") {
    val (wh, cat) = freshWh("txn_block")
    seed(cat)
    cat.transact { txn =>
      txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
      txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
    }
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L))
    intercept[RuntimeException] {
      cat.transact { txn =>
        txn.table("db.corpus").append(mkDf(9L -> "z"), Some(3000L))
        throw new RuntimeException("business rule failed")
      }
    }
    // nothing of the failed txn is visible, staged log gone, claim free
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    assert(scala.util.Using.resource(
      Files.list(Paths.get(wh, "db", "corpus"))) { st =>
      !st.iterator().asScala.exists(
        _.getFileName.toString.startsWith("snapshots.json.txn-"))
    })
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(4000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L, 4L))
  }

  test("staged DML: delete + append in one txn compose; rollback leaves orphans reclaimable") {
    val (wh, cat) = freshWh("txn_dml")
    val (corpus, _) = seed(cat)
    // stage a CoW delete plus an append, then roll back
    val txn = cat.beginTransaction()
    val sc = txn.table("db.corpus")
    sc.delete(spark, col("id") === 1L, Some(2000L))
    sc.append(mkDf(5L -> "e"), Some(3000L))
    assert(ids(sc) == Seq(2L, 5L))
    assert(ids(corpus) == Seq(1L, 2L))
    txn.rollback()
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L))
    // the rolled-back stage's data files are ordinary orphans now
    val orphans = GraftTable.load(s"$wh/db/corpus")
      .removeOrphanFiles(-60000L)
    assert(orphans.nonEmpty, "staged files should be reclaimed as orphans")
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L))
    // and the same staged DML COMMITTED applies exactly
    cat.transact { t2 =>
      val h = t2.table("db.corpus")
      h.delete(spark, col("id") === 1L, Some(4000L))
      h.append(mkDf(5L -> "e"), Some(5000L))
    }
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(2L, 5L))
  }

  test("conflicts: outside committers and second transactions fail loudly while enlisted") {
    val (wh, cat) = freshWh("txn_conflict")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    // a single-table committer races the held claim
    intercept[java.util.ConcurrentModificationException] {
      GraftTable.load(s"$wh/db/corpus").append(mkDf(9L -> "z"), Some(2500L))
    }
    // expire + orphan sweep are blocked too
    intercept[Exception] {
      GraftTable.load(s"$wh/db/corpus").expireSnapshots(Long.MaxValue, 1)
    }
    intercept[IllegalArgumentException] {
      GraftTable.load(s"$wh/db/corpus").removeOrphanFiles(-60000L)
    }
    // a second transaction cannot enlist the same table
    val txn2 = cat.beginTransaction()
    intercept[java.util.ConcurrentModificationException] {
      txn2.table("db.corpus")
    }
    txn2.rollback()
    txn.commit()
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    // claims released after publish
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L, 4L))
  }

  test("a commit landing between log read and enlist claim is detected") {
    val (wh, cat) = freshWh("txn_enlist_race")
    seed(cat)
    // simulate the race by pre-claiming the table's next id
    val marker = Paths.get(wh, "db", "corpus", "manifests", ".commit-00002")
    Files.createFile(marker)
    val txn = cat.beginTransaction()
    intercept[java.util.ConcurrentModificationException] {
      txn.table("db.corpus")
    }
    Files.deleteIfExists(marker)
    txn.rollback()
  }

  test("crash BEFORE the marker: nothing published, recovery rolls back") {
    for (step <- Seq("pointer:", "pre-commit")) {
      val (wh, cat) = freshWh(s"txn_crash_pre_${step.takeWhile(_ != ':')}")
      seed(cat)
      val txn = cat.beginTransaction()
      txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
      txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
      txn.crashAt = s => if (s.startsWith(step)) throw new RuntimeException("kill")
      intercept[RuntimeException] { txn.commit() }
      // readers see the OLD state of both tables (pointer w/o marker is inert)
      assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L))
      assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L))
      // recovery (dead-txn age 0) releases claims + stage; release()
      // simulates the publisher PROCESS dying (recover never rolls
      // back a transaction still open in this process)
      GraftTransaction.release(txn.id)
      val rec = GraftTransaction.recover(wh, olderThanMillis = 0L)
      assert(rec == Seq(txn.id))
      GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
      assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 4L))
      assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L))
    }
  }

  test("crash AFTER the marker: readers roll forward — all tables or none") {
    for (step <- Seq("post-commit", "swapped:", "cleaned")) {
      val (wh, cat) = freshWh(s"txn_crash_post_${step.takeWhile(_ != ':')}")
      seed(cat)
      val txn = cat.beginTransaction()
      txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
      txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
      txn.crashAt = s => if (s.startsWith(step)) throw new RuntimeException("kill")
      intercept[RuntimeException] { txn.commit() }
      // plain reads heal lazily: EVERY enlisted table serves the new
      // state — no read can observe the half-published cut
      assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L), step)
      assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L), step)
      // recovery sweeps the leftovers; committed txns finish idempotently
      GraftTransaction.recover(wh, olderThanMillis = 0L)
      assert(!Files.exists(Paths.get(wh, "_txns", txn.id)), step)
      // both tables writable again
      GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
      GraftTable.load(s"$wh/db/index").append(mkDf(12L -> "w"), Some(3000L))
      assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L, 4L), step)
      assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L, 12L), step)
    }
  }

  test("recover() finishes a committed crash WITHOUT any reader touching the tables") {
    val (wh, cat) = freshWh("txn_recover_only")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
    txn.crashAt = s => if (s == "post-commit") throw new RuntimeException("kill")
    intercept[RuntimeException] { txn.commit() }
    assert(GraftTransaction.recover(wh, olderThanMillis = 0L) == Seq(txn.id))
    // swapped + cleaned purely by recovery
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L))
    assert(!Files.exists(Paths.get(wh, "db", "corpus", ".txn-pending")))
    assert(!Files.exists(Paths.get(wh, "_txns", txn.id)))
  }

  test("recover() leaves young uncommitted transactions alone (in-flight, not dead)") {
    val (wh, cat) = freshWh("txn_recover_young")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    // default 60 s threshold: an open txn seconds old is NOT swept
    assert(GraftTransaction.recover(wh).isEmpty)
    assert(txn.isOpen)
    txn.commit()
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
  }

  test("staged handles refuse metadata/ref DDL and maintenance") {
    val (_, cat) = freshWh("txn_guards")
    seed(cat)
    val txn = cat.beginTransaction()
    val h = txn.table("db.corpus")
    intercept[IllegalArgumentException] { h.addColumn("extra", StringType) }
    intercept[IllegalArgumentException] { h.tag("v1", 1L) }
    intercept[IllegalArgumentException] { h.expireSnapshots(Long.MaxValue, 1) }
    intercept[IllegalArgumentException] { h.removeOrphanFiles(0L) }
    txn.rollback()
  }

  test("SQL surface: begin/commit procedures + __txn_ staged-table routing") {
    val wh = tmpDir("txn_sql")
    val cat = new GraftCatalog(wh)
    seed(cat)
    val sE = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .create()
    try {
      sE.conf.set("spark.sql.catalog.gtx", "graft.table.GraftSparkCatalog")
      sE.conf.set("spark.sql.catalog.gtx.warehouse", wh)
      assert(sE.sql("CALL gtx.system.begin_transaction('tx1')")
        .collect().length == 1)
      // duplicate name refused
      intercept[Exception] {
        sE.sql("CALL gtx.system.begin_transaction('tx1')").collect()
      }
      // stage through SQL: INSERT + UPDATE on the __txn_ names
      sE.sql("INSERT INTO gtx.db.corpus__txn_tx1 VALUES (3, 'c')")
      sE.sql("UPDATE gtx.db.index__txn_tx1 SET data = 'xx' WHERE id = 10")
      // the staged names see the transaction's state…
      assert(sE.sql("SELECT id FROM gtx.db.corpus__txn_tx1 ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      assert(sE.sql("SELECT data FROM gtx.db.index__txn_tx1 WHERE id = 10")
        .collect().map(_.getString(0)).toSeq == Seq("xx"))
      // …published names see NOTHING yet
      assert(sE.sql("SELECT id FROM gtx.db.corpus ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(sE.sql("SELECT data FROM gtx.db.index WHERE id = 10")
        .collect().map(_.getString(0)).toSeq == Seq("x"))
      // publish: both flips in one call
      val pub = sE.sql("CALL gtx.system.commit_transaction('tx1')").collect()
      assert(pub.head.getLong(1) == 2L, pub.mkString(","))
      assert(sE.sql("SELECT id FROM gtx.db.corpus ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      assert(sE.sql("SELECT data FROM gtx.db.index WHERE id = 10")
        .collect().map(_.getString(0)).toSeq == Seq("xx"))
      // name released; a fresh txn rolls back cleanly via SQL
      sE.sql("CALL gtx.system.begin_transaction('tx1')").collect()
      sE.sql("INSERT INTO gtx.db.corpus__txn_tx1 VALUES (9, 'z')")
      sE.sql("CALL gtx.system.rollback_transaction('tx1')").collect()
      assert(sE.sql("SELECT id FROM gtx.db.corpus ORDER BY id")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // accessing a staged name without an open txn fails loudly
      intercept[Exception] {
        sE.sql("SELECT * FROM gtx.db.corpus__txn_nope").collect()
      }
      // recovery sweep procedure is callable (nothing to recover)
      assert(sE.sql("CALL gtx.system.recover_transactions(0)")
        .collect().isEmpty)
    } finally {
      // never stop() a secondary session (shared SparkContext)
      GraftTransaction.findNamed(wh, "tx1").foreach(_.rollback())
    }
  }

  test("recover arbitration: a rolled-back publisher fails loudly, never a partial publish") {
    val (wh, cat) = freshWh("txn_race")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
    // a recovery sweep in "another process" deems the publisher dead
    // and rolls the transaction back (rename-first arbitration)
    GraftTransaction.release(txn.id)
    assert(GraftTransaction.recover(wh, olderThanMillis = 0L) == Seq(txn.id))
    // the publisher then tries to publish: the marker create finds the
    // txn dir gone and fails LOUDLY — swapStaged's missing-source
    // tolerance can no longer become a silent PARTIAL publish
    intercept[java.util.ConcurrentModificationException] { txn.commit() }
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L))
    // no protocol residue: pointers cleared, claims free for committers
    assert(!Files.exists(Paths.get(wh, "db", "corpus", ".txn-pending")))
    assert(!Files.exists(Paths.get(wh, "db", "index", ".txn-pending")))
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 4L))
  }

  test("recover never rolls back a transaction still open in this process, however old") {
    val (wh, cat) = freshWh("txn_live_old")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    // a named SQL transaction legitimately outlives the mtime gate
    Files.setLastModifiedTime(Paths.get(wh, "_txns", txn.id),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 86400000L))
    assert(GraftTransaction.recover(wh).isEmpty)
    txn.commit()
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
  }

  test("reader-side heal releases the claim of an enlistee with no staged commits") {
    val (wh, cat) = freshWh("txn_heal_claim")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    txn.table("db.index") // enlisted, NO staged commits: nextId unchanged
    txn.crashAt = s => if (s == "post-commit") throw new RuntimeException("kill")
    intercept[RuntimeException] { txn.commit() }
    // a plain read heals the pointer AND the commit claim — without the
    // claim release, index (whose nextId never advanced) would refuse
    // every later commit until a manual recover_transactions sweep
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L))
    assert(!Files.exists(Paths.get(wh, "db", "index", ".txn-pending")))
    GraftTable.load(s"$wh/db/index").append(mkDf(12L -> "w"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 12L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    GraftTransaction.recover(wh, olderThanMillis = 0L) // sweep the txn dir
  }

  test("a recover crashed mid-rollback (.rb dir) is resumed by the next sweep") {
    val (wh, cat) = freshWh("txn_rb_resume")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    GraftTransaction.release(txn.id)
    val d = Paths.get(wh, GraftTransaction.TxnsDir, txn.id)
    val rb = Paths.get(wh, GraftTransaction.TxnsDir, txn.id + ".rb")
    Files.move(d, rb) // the sweep won the rename, then died
    // resumed regardless of the age gate (the rename already arbitrated)
    assert(GraftTransaction.recover(wh,
      olderThanMillis = Long.MaxValue) == Seq(txn.id))
    assert(!Files.exists(rb))
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 4L))
  }

  test("a renamed-away txn dir that holds the commit marker rolls FORWARD") {
    // the publisher reached its atomicity point, then a racing recover
    // renamed the dir and died — the .rb dir carries the marker, so the
    // next sweep must finish the publish, never tear it down
    val (wh, cat) = freshWh("txn_rb_fwd")
    seed(cat)
    val txn = cat.beginTransaction()
    txn.table("db.corpus").append(mkDf(3L -> "c"), Some(2000L))
    txn.table("db.index").append(mkDf(11L -> "y"), Some(2000L))
    txn.crashAt = s => if (s == "post-commit") throw new RuntimeException("kill")
    intercept[RuntimeException] { txn.commit() }
    GraftTransaction.release(txn.id)
    val d = Paths.get(wh, GraftTransaction.TxnsDir, txn.id)
    val rb = Paths.get(wh, GraftTransaction.TxnsDir, txn.id + ".rb")
    Files.move(d, rb)
    assert(GraftTransaction.recover(wh,
      olderThanMillis = Long.MaxValue) == Seq(txn.id))
    // published, both tables, protocol state swept
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L))
    assert(ids(GraftTable.load(s"$wh/db/index")) == Seq(10L, 11L))
    assert(!Files.exists(rb))
    assert(!Files.exists(Paths.get(wh, "db", "corpus", ".txn-pending")))
    GraftTable.load(s"$wh/db/corpus").append(mkDf(4L -> "d"), Some(3000L))
    assert(ids(GraftTable.load(s"$wh/db/corpus")) == Seq(1L, 2L, 3L, 4L))
  }

  test("row-id bands stay monotone through a transaction (lineage across publish)") {
    val (wh, cat) = freshWh("txn_rowid")
    val corpus = cat.createTable("db.corpus", schema)
    corpus.append(mkDf(1L -> "a", 2L -> "b"), Some(1000L))
    cat.transact { txn =>
      txn.table("db.corpus").append(mkDf(3L -> "c", 4L -> "d"), Some(2000L))
    }
    val t = GraftTable.load(s"$wh/db/corpus")
    t.append(mkDf(5L -> "e"), Some(3000L))
    // watermark advanced through the staged commit: 2 + 2 + 1 rows
    assert(t.log.current.get.summary("next-row-id").toLong == 5L)
    val rid = t.readLineage(spark).select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rid.values.toSeq.sorted == Seq(0L, 1L, 2L, 3L, 4L))
  }
}
