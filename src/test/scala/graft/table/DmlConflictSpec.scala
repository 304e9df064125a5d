package graft.table

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Deterministic gates the racing DML's Spark job blocks on: the loser
  * starts planning against the pre-race log, parks inside its own
  * rewrite job while the winner commits, and only then reaches its own
  * commit — a real lost-update window, injected reproducibly. */
object DmlRaceGate {
  private val gates = new ConcurrentHashMap[String, CountDownLatch]()
  def arm(name: String): Unit = gates.put(name, new CountDownLatch(1))
  def open(name: String): Unit =
    Option(gates.get(name)).foreach(_.countDown())
  /** Await (first pass only — retries sail through) and return true. */
  def pass(name: String): Boolean = {
    Option(gates.get(name)).foreach(_.await(60, TimeUnit.SECONDS))
    true
  }
}

/** CONCURRENT-DML CONFLICT MATRIX. The engine's stance, validated race
  * by race: every DML statement is planned+committed as one unit; the
  * single serial snapshot chain (O_EXCL claim + nextId re-check) makes
  * a lost update impossible, and the loser either
  *   - RE-PLANS IN FULL against the winner's state (default
  *     `graft.dml.isolation = replan`): outcome serializable with the
  *     loser ordered last, including rows the winner just wrote; or
  *   - FAILS LOUDLY (`strict`): nothing re-executes against state the
  *     caller never saw (Iceberg validateNoConflicting* stance).
  */
class DmlConflictSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = true)))

  private def mkDf(rows: (Long, String)*) = {
    val rdd = spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1)
    spark.createDataFrame(rdd, schema)
  }

  private val gateUdf = udf((n: String) => DmlRaceGate.pass(n))

  private def rowsOf(t: GraftTable): Seq[(Long, String)] =
    t.read(spark).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  /** Run `loser` on a background thread blocked at `gate`, commit
    * `winner` on this thread, open the gate, join. */
  private def race[T](gate: String)(loser: => T)(winner: => Unit): T = {
    DmlRaceGate.arm(gate)
    var out: Either[Throwable, T] = null
    val th = new Thread(() => {
      out = try Right(loser) catch { case e: Throwable => Left(e) }
    })
    th.start()
    winner
    DmlRaceGate.open(gate)
    th.join(120000)
    assert(!th.isAlive, "raced DML never finished")
    out.fold(throw _, identity)
  }

  test("delete ∥ append: the delete re-plans and applies to the racing append's rows too") {
    val dir = tmpDir("race-del-app")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "keep", 2L -> "drop"), Some(1000L))
    race("g1") {
      t.withDmlRetry() {
        t.delete(spark, col("v") === "drop" && gateUdf(lit("g1")), Some(3000L))
      }
    } {
      t.append(mkDf(3L -> "drop", 4L -> "keep"), Some(2000L))
    }
    // serial order append → delete: BOTH "drop" rows gone, both commits
    // in the log (append = 2, delete rewrote = 3)
    assert(rowsOf(t) == Seq(1L -> "keep", 4L -> "keep"), rowsOf(t).toString)
    assert(t.log.snapshots.map(_.snapshotId) == Seq(1L, 2L, 3L))
    assert(t.log.snapshots.map(_.operation) == Seq("append", "append", "delete"))
  }

  test("update ∥ update OVERLAPPING rows: last-writer-wins serially, both commits land") {
    val dir = tmpDir("race-upd-upd")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> "x"), Some(1000L))
    race("g2") {
      t.withDmlRetry() {
        t.update(spark, col("id") === 1L && gateUdf(lit("g2")),
          Map("v" -> lit("loser-ran-last")), Some(3000L))
      }
    } {
      t.update(spark, col("id") === 1L, Map("v" -> lit("winner")), Some(2000L))
    }
    // the loser re-planned against the winner's state: its assignment
    // applied OVER the winner's — serial winner → loser, no lost update
    assert(rowsOf(t) == Seq(1L -> "loser-ran-last", 2L -> "x"))
    assert(t.log.snapshots.size == 3)
  }

  test("update ∥ update DISJOINT rows: both effects land") {
    val dir = tmpDir("race-upd-disj")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "x", 2L -> "x"), Some(1000L))
    race("g3") {
      t.withDmlRetry() {
        t.update(spark, col("id") === 1L && gateUdf(lit("g3")),
          Map("v" -> lit("a")), Some(3000L))
      }
    } {
      t.update(spark, col("id") === 2L, Map("v" -> lit("b")), Some(2000L))
    }
    assert(rowsOf(t) == Seq(1L -> "a", 2L -> "b"))
    assert(t.log.snapshots.size == 3)
  }

  test("merge ∥ equality-delete: the merge re-plans over the delete — upsert wins serially") {
    val dir = tmpDir("race-merge-eq")
    val t = GraftTable.create(s"$dir/t", schema)
    t.append(mkDf(1L -> "old", 2L -> "old"), Some(1000L))
    import spark.implicits._
    val src = Seq((1L, "merged"), (9L, "new")).toDF("id", "v")
      .filter(gateUdf(lit("g4")))
    race("g4") {
      t.withDmlRetry() { t.merge(spark, src, "id", Some(3000L)) }
    } {
      // the racing equality delete removes id=1 (MoR pending entry)
      t.deleteEquality(spark, Seq(1L).toDF("id"), Seq("id"), Some(2000L))
    }
    // serial delete → merge: id=1 deleted, then the merge re-inserts it
    assert(rowsOf(t) == Seq(1L -> "merged", 2L -> "old", 9L -> "new"))
  }

  test("strict isolation: the losing statement fails loudly instead of re-planning") {
    val dir = tmpDir("race-strict")
    val t = GraftTable.create(s"$dir/t", schema,
      Map(GraftTable.PropDmlIsolation -> "strict"))
    t.append(mkDf(1L -> "keep", 2L -> "drop"), Some(1000L))
    val e = intercept[java.util.ConcurrentModificationException] {
      race("g5") {
        t.withDmlRetry() {
          t.delete(spark, col("v") === "drop" && gateUdf(lit("g5")),
            Some(3000L))
        }
      } {
        t.append(mkDf(3L -> "drop"), Some(2000L))
      }
    }
    assert(e.getMessage.contains("strict"), e.getMessage)
    // nothing of the loser landed; the winner's append is intact
    assert(rowsOf(t) == Seq(1L -> "keep", 2L -> "drop", 3L -> "drop"))
    assert(t.log.snapshots.size == 2)
    // no orphaned junk the loser failed to clean: commit's failure path
    // deletes its data files
    val orphans = t.removeOrphanFiles(-60000L)
    assert(orphans.isEmpty, orphans.toString)
    // and the same statement retried BY THE CALLER (fresh read) lands
    t.withDmlRetry() { t.delete(spark, col("v") === "drop", Some(4000L)) }
    assert(rowsOf(t) == Seq(1L -> "keep"))
  }

  test("isolation property is validated at create and writeMeta") {
    val dir = tmpDir("race-prop")
    intercept[IllegalArgumentException] {
      GraftTable.create(s"$dir/bad", schema,
        Map(GraftTable.PropDmlIsolation -> "optimistic"))
    }
    val t = GraftTable.create(s"$dir/ok", schema)
    intercept[IllegalArgumentException] {
      t.updateProperties(Map(GraftTable.PropDmlIsolation -> "nope"))
    }
    t.updateProperties(Map(GraftTable.PropDmlIsolation -> "strict"))
    assert(GraftTable.load(s"$dir/ok").properties(
      GraftTable.PropDmlIsolation) == "strict")
  }
}
