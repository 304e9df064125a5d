package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** AS-OF and RANGE join operators vs a brute-force local reference, plus
  * the plan property that makes them scale: no nested-loop join.
  */
class JoinsSpec extends SparkSpecBase {

  import spark.implicits._

  test("asofJoin matches brute-force latest-at-or-before semantics") {
    val rng = new scala.util.Random(1)
    val left = Seq.tabulate(200)(i =>
      (i.toLong, rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
      .toDF("id", "k", "ts")
    val rightRows = Seq.fill(300)((rng.nextInt(5).toLong, rng.nextInt(1000).toLong))
    val right = rightRows.toDF("k", "rts")

    val got = Joins.asofJoin(left, right, "k", "ts", "rts", "asof_ts")
      .select("id", "asof_ts").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    val byKey = rightRows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    left.collect().foreach { r =>
      val (id, k, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = byKey.getOrElse(k, Nil).filter(_ <= ts)
        .reduceOption(_ max _)
      assert(got(id) == expect, s"id=$id k=$k ts=$ts")
    }
  }

  test("asofJoin: equal timestamps are inclusive; missing keys yield null") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 99L, 100L))
      .toDF("id", "k", "ts")
    val right = Seq((10L, 100L), (10L, 60L)).toDF("k", "rts")
    val got = Joins.asofJoin(left, right, "k", "ts", "rts")
      .select("id", "asof_ts").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L).contains(100L)) // equal ts matches
    assert(got(2L).isEmpty)        // nothing at or before 50
    assert(got(3L).isEmpty)        // key absent on the right
  }

  test("rangeJoin matches brute force and emits each pair exactly once") {
    val rng = new scala.util.Random(2)
    val pts = Seq.tabulate(300)(i => (i.toLong, rng.nextInt(10000).toLong))
    val ivs = Seq.tabulate(50) { i =>
      val s = rng.nextInt(9000).toLong
      (i.toLong, s, s + rng.nextInt(2000).toLong)
    }
    val points = pts.toDF("pid", "pt")
    val intervals = ivs.toDF("iid", "lo", "hi")

    // width smaller than, comparable to, and larger than typical intervals
    for (width <- Seq(100L, 1000L, 50000L)) {
      val got = Joins.rangeJoin(points, intervals, "pt", "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val expect = for {
        (pid, pt) <- pts
        (iid, lo, hi) <- ivs
        if pt >= lo && pt <= hi
      } yield (pid, iid)
      assert(got.sorted.toSeq == expect.sorted, s"width=$width")
      assert(got.length == got.distinct.length, s"duplicate pairs at width=$width")
    }
  }

  test("plan property: neither operator plans a nested-loop join") {
    val left = Seq((1L, 1L, 1L)).toDF("id", "k", "ts")
    val right = Seq((1L, 1L)).toDF("k", "rts")
    val asofPlan = Joins.asofJoin(left, right, "k", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("NestedLoop"), asofPlan)

    val points = Seq((1L, 5L)).toDF("pid", "pt")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val rangePlan = Joins.rangeJoin(points, ivs, "pt", "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("NestedLoop"), rangePlan)
  }
}
