package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** WAREHOUSE-LEVEL atomic transaction: stage commits on several tables,
  * publish them all-or-nothing. The one consistency primitive a
  * multi-table pipeline needs — a corpus append and its materialized
  * ANN/posting-list index refresh land as ONE visible event; a reader
  * between stage and publish sees NEITHER.
  *
  * This is the [[GraftTable]] commit discipline lifted one level
  * (the reference resolves exactly one table per query,
  * TableResolverUtil.java:59-91 — cross-table atomicity is beyond it):
  *
  *  1. ENLIST (`txn.table(...)`): take the table's O_EXCL commit claim
  *     (`.commit-<nextId>`, the same marker a single-table committer
  *     races on) and HOLD it for the transaction's lifetime — outside
  *     committers and expire/maintenance fail loudly meanwhile. Copy
  *     the published log to `snapshots.json.txn-<id>` and hand back a
  *     handle whose commits append THERE (data/segment files land in
  *     the table dir as usual — invisible until the log references
  *     them, the standing invariant).
  *  2. PUBLISH (`txn.commit()`): write a `.txn-pending` pointer into
  *     every enlisted table dir, then create the transaction's
  *     `commit` marker (O_EXCL — THE atomicity point), then swap each
  *     staged log over `snapshots.json` (atomic per-table rename),
  *     then clean pointers/claims/the txn dir.
  *
  * Crash recovery is two-sided:
  *  - readers: every [[GraftTable.log]] read checks `.txn-pending`
  *    (one stat call when absent). A pointer whose transaction HAS the
  *    commit marker is rolled FORWARD on the spot (finish the swap) —
  *    so after a mid-publish crash no reader can see table A swapped
  *    and table B not. A pointer without the marker is ignored: the
  *    published log stays authoritative (publisher still in flight, or
  *    dead pre-commit — either way nothing published).
  *  - [[GraftTransaction.recover]]: finishes committed-but-unswept
  *    transactions and rolls back dead uncommitted ones (staged logs,
  *    pointers, claims, txn dir). Physical artifacts staged by a
  *    rolled-back transaction become ordinary orphans —
  *    `removeOrphanFiles` reclaims them (and refuses to run while a
  *    stage is in flight, so it can never sweep a live transaction's
  *    files).
  *
  * Scale stance: everything here is O(metadata) — log copies and
  * renames of tiny JSON files; no data I/O at publish time, at any
  * table size. */
final class GraftTransaction private[table] (
    val warehouse: String,
    val id: String) {

  import GraftTransaction._

  private[table] val txnDir: Path = Paths.get(warehouse, TxnsDir, id)

  private final case class Enlisted(
      dir: String, staged: String, claimRel: String, handle: GraftTable)

  private val enlisted =
    scala.collection.mutable.LinkedHashMap[String, Enlisted]()
  private var state: String = "open"

  /** Test hook: crash injection at named publish steps (throw to
    * simulate a kill between two protocol actions). */
  private[table] var crashAt: String => Unit = _ => ()

  def isOpen: Boolean = state == "open"

  /** Directories enlisted so far (diagnostics / procedure results). */
  def enlistedDirs: Seq[String] = synchronized { enlisted.keys.toSeq }

  /** Enlist `db.table` (warehouse-resolved) and return its STAGED
    * handle: reads see the transaction's own commits, writes stage. */
  def table(identifier: String): GraftTable =
    tableAt(new GraftCatalog(warehouse).tableDir(identifier))

  /** Enlist a path-addressed table. */
  def tableAt(dir: String): GraftTable = synchronized {
    require(isOpen, s"transaction $id is $state")
    val norm = Paths.get(dir).normalize().toString
    enlisted.get(norm).map(_.handle).getOrElse {
      val base = GraftTable.load(norm) // heals any pending txn first
      val nextId = base.log.nextId
      val claimRel = f"manifests/.commit-$nextId%05d"
      val marker = Paths.get(norm, claimRel)
      Files.createDirectories(marker.getParent)
      try Files.createFile(marker)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"cannot enlist $norm in transaction $id: a committer (or " +
              "another transaction) holds its commit claim")
      }
      // the claim is only a claim if the id is still the next one
      // (same re-check as GraftTable.commit)
      if (base.log.nextId != nextId) {
        Files.deleteIfExists(marker)
        throw new java.util.ConcurrentModificationException(
          s"a commit landed on $norm while enlisting it in transaction $id")
      }
      val staged = s"${GraftTable.MainLog}.txn-$id"
      SnapshotLog.read(s"$norm/${GraftTable.MainLog}")
        .write(s"$norm/$staged")
      val e = Enlisted(norm, staged, claimRel,
        GraftTable.loadWithLog(norm, staged))
      enlisted(norm) = e
      writeTxnMeta()
      e.handle
    }
  }

  private def writeTxnMeta(): Unit =
    graft.util.Json.writeFileAtomic(txnDir.resolve("txn.json").toString,
      graft.util.Json.write(Map(
        "id" -> id,
        "tables" -> enlisted.values.toSeq.map(e => Map(
          "dir" -> e.dir, "staged" -> e.staged, "claim" -> e.claimRel)))))

  /** Publish every staged commit atomically. After this returns, all
    * enlisted tables serve their staged state; if the process dies
    * mid-way, readers + [[recover]] finish the job (all-or-nothing
    * around the txn `commit` marker). */
  def commit(): Unit = synchronized {
    require(isOpen, s"transaction $id is $state")
    // 1. pointers first, in EVERY table dir: once the commit marker
    //    exists, any reader of any enlisted table must be able to find
    //    the staged log (a marker before the pointers could strand a
    //    reader on one table's old log while another already swapped)
    enlisted.values.foreach { e =>
      crashAt(s"pointer:${e.dir}")
      graft.util.Json.writeFileAtomic(
        Paths.get(e.dir, PendingFile).toString,
        graft.util.Json.write(Map(
          "txn" -> txnDir.toString, "staged" -> e.staged,
          "claim" -> e.claimRel)))
    }
    crashAt("pre-commit")
    // 2. THE atomicity point. A racing [[recover]] arbitrates by
    //    atomically renaming the txn dir away BEFORE touching staged
    //    state — if it won, this create throws (no parent) and the
    //    transaction is reported failed, never partially published.
    try Files.createFile(txnDir.resolve("commit"))
    catch {
      case e @ (_: java.nio.file.NoSuchFileException |
                _: java.io.IOException) if !Files.exists(txnDir) =>
        // recovery rolled us back between pointer-write and marker:
        // sweep our pointers (recover may have missed ones written
        // after its pass) and fail loudly — nothing was published
        enlisted.values.foreach { en =>
          Files.deleteIfExists(Paths.get(en.dir, PendingFile))
          Files.deleteIfExists(Paths.get(en.dir, en.claimRel))
        }
        state = "rolled-back"
        GraftTransaction.release(id)
        throw new java.util.ConcurrentModificationException(
          s"transaction $id was rolled back by a recovery sweep before " +
            "its commit point; nothing was published", e)
    }
    crashAt("post-commit")
    // 3. swap each staged log over the published one
    enlisted.values.foreach { e =>
      swapStaged(e.dir, e.staged)
      crashAt(s"swapped:${e.dir}")
    }
    // 4. sweep pointers + claims
    enlisted.values.foreach { e =>
      Files.deleteIfExists(Paths.get(e.dir, PendingFile))
      Files.deleteIfExists(Paths.get(e.dir, e.claimRel))
    }
    crashAt("cleaned")
    GraftTable.deleteRecursively(txnDir)
    state = "committed"
    GraftTransaction.release(id)
  }

  /** Abandon the transaction: drop staged logs, release claims, remove
    * the txn dir. Data/segment files written by staged commits become
    * ordinary orphans (`removeOrphanFiles` reclaims them — the same
    * stance as a hard-crashed single-table committer).
    *
    * Past the atomicity point (the txn `commit` marker exists — e.g. a
    * publish that failed between marker and swaps), the transaction IS
    * committed: rollback rolls it FORWARD instead of tearing down
    * published state. */
  def rollback(): Unit = synchronized {
    if (!isOpen) return
    if (Files.exists(txnDir.resolve("commit"))) {
      enlisted.values.foreach { e =>
        swapStaged(e.dir, e.staged)
        Files.deleteIfExists(Paths.get(e.dir, PendingFile))
        Files.deleteIfExists(Paths.get(e.dir, e.claimRel))
      }
      GraftTable.deleteRecursively(txnDir)
      state = "committed"
      GraftTransaction.release(id)
      return
    }
    enlisted.values.foreach { e =>
      Files.deleteIfExists(Paths.get(e.dir, e.staged))
      // a publish that failed BEFORE the marker may have left pointers;
      // while our claim is held no other transaction can have enlisted
      // this table, so any pointer here is ours
      Files.deleteIfExists(Paths.get(e.dir, PendingFile))
      Files.deleteIfExists(Paths.get(e.dir, e.claimRel))
    }
    GraftTable.deleteRecursively(txnDir)
    state = "rolled-back"
    GraftTransaction.release(id)
  }
}

object GraftTransaction {

  /** Per-table pointer a publishing transaction leaves while swapping:
    * readers route through it (see [[GraftTable.log]]). */
  private[table] val PendingFile = ".txn-pending"

  /** Warehouse subdirectory holding in-flight transaction state. */
  private[table] val TxnsDir = "_txns"

  private val counter = new java.util.concurrent.atomic.AtomicLong()

  /** Ids of transactions OPEN in this process: recover() never rolls
    * these back regardless of dir age (named SQL transactions
    * legitimately outlive the mtime gate). Cross-process liveness is
    * handled by the rename arbitration, not this set. */
  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** NAMED transactions for the SQL surface (`CALL begin_transaction
    * ('tx1')` … DML on `db.t__txn_tx1` … `CALL commit_transaction
    * ('tx1')`): driver-side coordination state, keyed per warehouse.
    * Cross-process isolation still comes from the claim files — names
    * only scope the in-process handle. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), GraftTransaction]()

  def beginNamed(warehouse: String, name: String): GraftTransaction = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"transaction name '$name' must match [A-Za-z0-9_]+ (it becomes " +
        "part of the staged table identifier)")
    val txn = begin(warehouse)
    val prev = registry.putIfAbsent((warehouse, name), txn)
    if (prev != null) {
      txn.rollback()
      throw new IllegalArgumentException(
        s"transaction '$name' is already open on $warehouse")
    }
    txn
  }

  def findNamed(warehouse: String, name: String): Option[GraftTransaction] =
    Option(registry.get((warehouse, name)))

  /** Commit (or roll back) a named transaction and release its name. */
  def endNamed(warehouse: String, name: String, commit: Boolean): GraftTransaction = {
    val txn = Option(registry.remove((warehouse, name))).getOrElse(
      throw new IllegalArgumentException(
        s"no open transaction '$name' on $warehouse"))
    if (commit) txn.commit() else txn.rollback()
    txn
  }

  /** Open a transaction on a warehouse root. */
  def begin(warehouse: String): GraftTransaction = {
    val id = f"${System.currentTimeMillis()}%013d-${counter.incrementAndGet()}%04d-" +
      Integer.toHexString(scala.util.Random.nextInt(0x10000))
    val txn = new GraftTransaction(warehouse, id)
    Files.createDirectories(txn.txnDir)
    live.add(id)
    txn
  }

  private[table] def release(id: String): Unit = live.remove(id)

  /** Reader-side roll-forward: if `tableDir` carries a `.txn-pending`
    * pointer whose transaction reached its commit marker, finish the
    * staged-log swap (idempotent — racers tolerate each other's
    * renames). An uncommitted pointer is left alone: the publisher may
    * be mid-flight, and until its marker exists the published log is
    * authoritative. */
  private[table] def healIfPending(tableDir: String): Unit = {
    val ptr = Paths.get(tableDir, PendingFile)
    if (!Files.exists(ptr)) return
    val meta =
      try graft.util.Json.parseObject(Files.readString(ptr))
      catch { case _: Exception => return } // torn/foreign: ignore
    val txn = meta.get("txn").map(_.toString).getOrElse(return)
    val staged = meta.get("staged").map(_.toString).getOrElse(return)
    if (Files.exists(Paths.get(txn, "commit"))) {
      swapStaged(tableDir, staged)
      // release the publisher's commit claim too: for a table enlisted
      // without staged commits, nextId is unchanged and a leftover
      // claim would block every later committer until a recover sweep
      meta.get("claim").map(_.toString)
        .foreach(c => Files.deleteIfExists(Paths.get(tableDir, c)))
      Files.deleteIfExists(ptr)
    }
  }

  /** Tolerant atomic rename staged → published: a missing source means
    * a concurrent healer/publisher already finished — done either way. */
  private def swapStaged(tableDir: String, staged: String): Unit = {
    val src = Paths.get(tableDir, staged)
    if (!Files.exists(src)) return
    try Files.move(src, Paths.get(tableDir, GraftTable.MainLog),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.NoSuchFileException => () }
  }

  /** Warehouse-level recovery sweep: finish every COMMITTED transaction
    * (swap + clean), roll back every uncommitted one older than
    * `olderThanMillis` (a live publisher holds its state for
    * milliseconds — age separates dead from in-flight). Returns the
    * recovered transaction ids. */
  def recover(warehouse: String, olderThanMillis: Long = 60000L): Seq[String] = {
    val root = Paths.get(warehouse, TxnsDir)
    if (!Files.exists(root)) return Nil
    val dirs = scala.util.Using.resource(Files.list(root)) { st =>
      st.iterator().asScala.filter(Files.isDirectory(_)).toSeq
    }
    dirs.flatMap { d =>
      val metaP = d.resolve("txn.json")
      if (!Files.exists(metaP)) {
        // claim-only stub (crashed inside begin): age-gated delete
        if (ageMs(d) > olderThanMillis) { GraftTable.deleteRecursively(d); None }
        else None
      } else {
        val meta = graft.util.Json.parseObject(Files.readString(metaP))
        val tables = meta.getOrElse("tables", Seq.empty[Any])
          .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
        // pointers always record the ORIGINAL txn dir path (pre any
        // .rb rollback rename)
        val origTxn = d.toString.stripSuffix(".rb")
        def clearPointer(dir: String): Unit = {
          // only clear a pointer that references THIS transaction —
          // a fresh txn may already be publishing its own
          val ptr = Paths.get(dir, PendingFile)
          if (Files.exists(ptr) &&
              (try graft.util.Json.parseObject(Files.readString(ptr))
                .get("txn").exists(_.toString == origTxn)
              catch { case _: Exception => false }))
            Files.deleteIfExists(ptr)
        }
        def rollForward(at: Path): Unit = tables.foreach { t =>
          val dir = t("dir").toString
          swapStaged(dir, t("staged").toString)
          clearPointer(dir)
          Files.deleteIfExists(Paths.get(dir, t("claim").toString))
        }
        if (Files.exists(d.resolve("commit"))) {
          rollForward(d)
          GraftTable.deleteRecursively(d)
          Some(d.getFileName.toString.stripSuffix(".rb"))
        } else if (d.getFileName.toString.endsWith(".rb")) {
          // a recover crashed mid-rollback after winning the rename:
          // resume it (no age gate — the rename already arbitrated)
          tables.foreach { t =>
            val dir = t("dir").toString
            Files.deleteIfExists(Paths.get(dir, t("staged").toString))
            clearPointer(dir)
            Files.deleteIfExists(Paths.get(dir, t("claim").toString))
          }
          GraftTable.deleteRecursively(d)
          Some(d.getFileName.toString.stripSuffix(".rb"))
        } else if (ageMs(d) > olderThanMillis &&
            !live.contains(d.getFileName.toString)) {
          // UNCOMMITTED rollback. A live publisher (named SQL
          // transactions legitimately stay open for minutes) may be
          // racing toward its commit marker — deleting its staged logs
          // under it would turn swapStaged's missing-source tolerance
          // into a silent PARTIAL publish. Arbitrate atomically: rename
          // the txn dir away FIRST. After the rename the publisher's
          // marker create throws (parent gone) and its commit() fails
          // loudly having published nothing; if the marker is already
          // inside the renamed dir, the publisher won — finish its
          // publish instead of tearing it down.
          val trash = d.resolveSibling(d.getFileName.toString + ".rb")
          val moved =
            try { Files.move(d, trash, StandardCopyOption.ATOMIC_MOVE); true }
            catch { case _: Exception => false } // raced/finished: skip
          if (!moved) None
          else if (Files.exists(trash.resolve("commit"))) {
            rollForward(trash)
            GraftTable.deleteRecursively(trash)
            Some(d.getFileName.toString)
          } else {
            tables.foreach { t =>
              val dir = t("dir").toString
              Files.deleteIfExists(Paths.get(dir, t("staged").toString))
              clearPointer(dir)
              Files.deleteIfExists(Paths.get(dir, t("claim").toString))
            }
            GraftTable.deleteRecursively(trash)
            Some(d.getFileName.toString)
          }
        } else None
      }
    }
  }

  private def ageMs(d: Path): Long =
    try System.currentTimeMillis() - Files.getLastModifiedTime(d).toMillis
    catch { case _: java.io.IOException => 0L }
}
