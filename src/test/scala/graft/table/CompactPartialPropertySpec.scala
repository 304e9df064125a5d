package graft.table

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Property sweep for partial-progress compaction: across random file
  * layouts, random group caps, and randomly PLANTED failure groups (a
  * write constraint violated by rows in some files), the invariants are
  *
  *   - no row is ever lost or duplicated — the table reads the same
  *     multiset before and after, success or failure;
  *   - every group that did not hold a poisoned file commits its own
  *     replace snapshot and stays committed when later groups fail;
  *   - after the obstacle is removed, a re-run converges: everything
  *     compacts, and a further run is a no-op.
  *
  * This is the crash-robustness story the single-commit rewrite cannot
  * give at 100 TB — a failure loses one group's work, never the job.
  */
class CompactPartialPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("data", StringType, nullable = true)))

  private def mkDf(rows: Seq[(Long, String)]) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  test("random layouts x caps x planted failures: progress, no loss, convergence") {
    val rnd = new scala.util.Random(
      sys.env.getOrElse("GRAFT_FUZZ_SEED", "1207").toLong)
    for (trial <- 1 to 6) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-ppprop$trial").toString
      val t = GraftTable.create(s"$dir/t", schema)
      val nFiles = 3 + rnd.nextInt(5) // 3..7 single-file appends
      val poisonFiles = (0 until nFiles).filter(_ => rnd.nextBoolean()).toSet
      var nextId = 0L
      (0 until nFiles).foreach { i =>
        val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
          nextId += 1; nextId -> s"v$nextId"
        } ++ (if (poisonFiles(i)) { nextId += 1; Seq(nextId -> "bad") }
              else Nil)
        t.append(mkDf(rows), Some(1000L * (i + 1))): Unit
      }
      val want = GraftTable.load(s"$dir/t").read(spark)
        .select("id", "data").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

      // plant the obstacle AFTER the data: rewriting a poisoned file now
      // violates the check, exactly like a task-level failure would
      GraftTable.load(s"$dir/t").updateProperties(
        Map(s"${GraftTable.PropCheckPrefix}ok" -> "data <> 'bad'")): Unit
      val loaded = GraftTable.load(s"$dir/t")
      val manifest = Manifest.read(
        s"${loaded.dir}/${loaded.log.current.get.manifestList}")
      val cap = math.max(1L,
        manifest.files.map(_.fileSizeBytes).max * (1 + rnd.nextInt(3)))
      def content() = GraftTable.load(s"$dir/t").read(spark)
        .select("id", "data").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

      val snapsBefore = loaded.log.snapshots.size
      val attempt = scala.util.Try(loaded.compactPartial(spark,
        smallerThanBytes = Long.MaxValue, maxFileGroupBytes = cap,
        committedAt = Some(100000L)))
      val after = GraftTable.load(s"$dir/t")
      assert(content() == want,
        s"trial $trial: rows changed under a ${attempt.getClass.getSimpleName}")
      val live = Manifest.read(
        s"${after.dir}/${after.log.current.get.manifestList}")
        .files.map(_.path).toSet
      val poisonPaths = manifest.files.zipWithIndex.collect {
        case (f, i) if poisonFiles(i) => f.path
      }
      if (poisonFiles.isEmpty)
        assert(attempt.isSuccess, s"trial $trial: clean run failed: " +
          attempt.failed.map(_.getMessage).getOrElse(""))
      else {
        // a poisoned file either sat in a planned (>1-file or forced)
        // group — then that group failed and the run rethrew — or in a
        // skipped single-file group. EITHER WAY its file survives and
        // every clean planned group's commit stays on disk.
        if (attempt.isFailure) {
          val msg = attempt.failed.get.getMessage
          assert(msg.contains("compactPartial committed"), msg)
        }
        assert(poisonPaths.forall(live), s"trial $trial: lost a failed " +
          s"group's file (live=$live)")
      }
      assert(after.log.snapshots.drop(snapsBefore)
        .forall(_.operation == "replace"), s"trial $trial: non-replace")

      // remove the obstacle: re-runs CONVERGE to a fixpoint (nothing left
      // but unobligated single-file groups, which the planner skips) and
      // content never changes
      GraftTable.load(s"$dir/t").updateProperties(Map.empty,
        removals = Set(s"${GraftTable.PropCheckPrefix}ok")): Unit
      var rounds = 0
      var prev = -1
      while (rounds < 5 && prev != GraftTable.load(s"$dir/t")
          .log.snapshots.size) {
        prev = GraftTable.load(s"$dir/t").log.snapshots.size
        GraftTable.load(s"$dir/t").compactPartial(spark,
          smallerThanBytes = Long.MaxValue, maxFileGroupBytes = cap,
          committedAt = Some(300000L + rounds)): Unit
        rounds += 1
      }
      assert(content() == want, s"trial $trial: fixpoint changed rows")
      assert(rounds < 5, s"trial $trial: no fixpoint within 4 passes")
      // and the fixpoint is a genuine no-op
      val stable = GraftTable.load(s"$dir/t").log.snapshots.size
      GraftTable.load(s"$dir/t").compactPartial(spark,
        smallerThanBytes = Long.MaxValue, maxFileGroupBytes = cap,
        committedAt = Some(400000L)): Unit
      assert(GraftTable.load(s"$dir/t").log.snapshots.size == stable,
        s"trial $trial: fixpoint pass still committed")
      GraftTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
