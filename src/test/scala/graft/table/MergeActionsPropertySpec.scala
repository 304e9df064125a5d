package graft.table

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Property sweep for the general conditional MERGE
  * ([[GraftTable.mergeActions]]) — the round's CDC-apply centerpiece:
  * random tables × sources × action lists are executed through the real
  * commit path and compared row-for-row against an independent
  * row-level REFERENCE evaluator implementing the SQL MERGE contract
  * (per row, first action in listed order whose condition holds
  * applies; unmatched-by-any-action rows keep / skip; matched rows pair
  * with their unique source row, by-source rows see no source, inserts
  * see no target; unassigned insert columns are NULL). Conditions and
  * assignments are drawn from pools carrying BOTH a Column form and a
  * Scala lambda form, so the reference shares no code with the engine.
  */
class MergeActionsPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", LongType, nullable = false),
    StructField("w", LongType, nullable = false)))

  private val P = GraftTable.MergeSrcPrefix
  private def s_(c: String) = col(P + c)

  // a row is (k, v, w); None key never matches (SQL equality)
  private type R = (Option[Long], Long, Long)

  private def df(rows: Seq[R]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows.map(r =>
      Row(r._1.map(Long.box).orNull, r._2, r._3)), 2), schema)

  // ---- condition pools: (Column over the joined frame, semantic) ----
  private val matchedConds: Seq[(Option[Column], (R, R) => Boolean)] = Seq(
    (None, (_, _) => true),
    (Some(s_("v") % 2 === 0), (_, s) => s._2 % 2 == 0),
    (Some(col("v") < s_("v")), (t, s) => t._2 < s._2),
    (Some(col("w") % 3 === 0 && s_("w") % 2 === 1),
      (t, s) => t._3 % 3 == 0 && s._3 % 2 == 1))

  private val matchedAssigns: Seq[(Map[String, Column], (R, R) => R)] = Seq(
    (Map("v" -> (s_("v") + 100L)), (t, s) => (t._1, s._2 + 100L, t._3)),
    (Map("v" -> (col("v") + s_("w")), "w" -> (col("w") * 2L)),
      (t, s) => (t._1, t._2 + s._3, t._3 * 2L)),
    (Map("w" -> s_("w")), (t, s) => (t._1, t._2, s._3)))

  private val insertConds: Seq[(Option[Column], R => Boolean)] = Seq(
    (None, _ => true),
    (Some(s_("v") % 2 === 1), s => s._2 % 2 == 1))

  // insert values reference SOURCE columns only; unassigned → NULL,
  // which this schema's non-null v/w cannot hold — assign all three
  private val insertVals: Seq[(Map[String, Column], R => R)] = Seq(
    (Map("k" -> s_("k"), "v" -> s_("v"), "w" -> s_("w")), s => s),
    (Map("k" -> s_("k"), "v" -> (s_("v") + 1000L), "w" -> lit(7L)),
      s => (s._1, s._2 + 1000L, 7L)))

  private val bySourceConds: Seq[(Option[Column], R => Boolean)] = Seq(
    (None, _ => true),
    (Some(col("v") % 2 === 0), t => t._2 % 2 == 0))

  private val bySourceAssigns: Seq[(Map[String, Column], R => R)] = Seq(
    (Map("w" -> (col("w") + 5L)), t => (t._1, t._2, t._3 + 5L)))

  test("mergeActions matches the row-level SQL MERGE reference") {
    val rnd = new scala.util.Random(
      sys.env.getOrElse("GRAFT_FUZZ_SEED", "42").toLong)

    for (trial <- 1 to 10) {
      // target: distinct keys (plus maybe a null-key row); source:
      // distinct keys overlapping roughly half the target
      val nT = 3 + rnd.nextInt(6)
      val target: Seq[R] = (0 until nT).map(i =>
        (Some(i * 2L), rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)) ++
        (if (rnd.nextBoolean()) Seq((None, 99L, 99L)) else Nil)
      val nS = 2 + rnd.nextInt(6)
      val source: Seq[R] = (0 until nS).map(i =>
        (Some(i * 3L), rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)) ++
        (if (rnd.nextBoolean()) Seq((None, 77L, 77L)) else Nil)

      // random action lists (semantic twins built alongside)
      def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
      val nM = rnd.nextInt(3)
      val matched = (0 until nM).map { _ =>
        val (c, cf) = pick(matchedConds)
        if (rnd.nextBoolean()) {
          val (a, af) = pick(matchedAssigns)
          (MergeUpdate(c, a): MergeMatchedAction,
            (cf, Left(af): Either[(R, R) => R, Unit]))
        } else (MergeDelete(c): MergeMatchedAction, (cf, Right(())))
      }
      val nI = rnd.nextInt(3)
      val inserts = (0 until nI).map { _ =>
        val (c, cf) = pick(insertConds)
        val (v, vf) = pick(insertVals)
        (MergeInsert(c, v), (cf, vf))
      }
      val nB = rnd.nextInt(2)
      val bySource = (0 until nB).map { _ =>
        val (c, cf) = pick(bySourceConds)
        if (rnd.nextBoolean()) {
          val (a, af) = pick(bySourceAssigns)
          (MergeUpdate(c, a): MergeMatchedAction,
            (cf, Left(af): Either[R => R, Unit]))
        } else (MergeDelete(c): MergeMatchedAction, (cf, Right(())))
      }
      // duplicate source keys are legal exactly when no action joins
      // target rows to the source (insert-only merges)
      val src2 =
        if (nM + nB == 0 && source.nonEmpty && rnd.nextBoolean())
          source ++ source.take(2)
        else source
      if (nM + nI + nB == 0) () // mergeActions requires an action
      else {
        // ---- reference evaluation ----
        val srcByKey = src2.collect { case s @ (Some(k), _, _) => k -> s }.toMap
        val kept = target.flatMap { t =>
          t._1.flatMap(srcByKey.get) match {
            case Some(s) =>
              matched.find { case (_, (cf, _)) => cf(t, s) } match {
                case Some((_, (_, Left(af)))) => Some(af(t, s))
                case Some((_, (_, Right(_)))) => None // delete
                case None => Some(t)
              }
            case None =>
              bySource.find { case (_, (cf, _)) => cf(t) } match {
                case Some((_, (_, Left(af)))) => Some(af(t))
                case Some((_, (_, Right(_)))) => None
                case None => Some(t)
              }
          }
        }
        val tgtKeys = target.flatMap(_._1).toSet
        val ins = src2
          .filter(s => !s._1.exists(tgtKeys.contains))
          .flatMap { s =>
            inserts.find { case (_, (cf, _)) => cf(s) }
              .map { case (_, (_, vf)) => vf(s) }
          }
        val expected = (kept ++ ins)
          .map(r => (r._1, r._2, r._3)).sorted(Ordering.by(
            (x: R) => (x._1.getOrElse(Long.MinValue), x._2, x._3)))

        // ---- engine evaluation through the real commit path ----
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-maprop$trial").toString
        val tb = GraftTable.create(s"$dir/t", schema)
        tb.append(df(target), Some(1000L))
        tb.mergeActions(spark, df(src2), Seq(("k", "k")),
          matched.map(_._1), inserts.map(_._1), bySource.map(_._1),
          Some(2000L))
        val got = tb.read(spark).select("k", "v", "w").collect()
          .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
            r.getLong(1), r.getLong(2)))
          .toSeq.sorted(Ordering.by(
            (x: R) => (x._1.getOrElse(Long.MinValue), x._2, x._3)))

        assert(got == expected,
          s"trial $trial diverged\n  matched=$matched\n  inserts=$inserts\n" +
            s"  bySource=$bySource\n  target=$target\n  source=$source\n" +
            s"  got=$got\n  expected=$expected")
      }
    }
  }
}
