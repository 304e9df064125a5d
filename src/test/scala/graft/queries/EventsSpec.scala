package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Structural invariants of the sessionization output that the value-level
  * oracle can't express: sessions of one user never overlap, consecutive
  * sessions are separated by more than the 30-minute gap, and every
  * session's span is consistent with its event count.
  */
class EventsSpec extends SparkSpecBase {

  private val d = "/root/testdata/sf0.001"

  test("sessions are disjoint and separated by more than the gap") {
    val sessions = Events.queries("e04_sessionize")(spark, d)
      .orderBy("user_id", "session_seq")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("session_end")))

    assert(sessions.nonEmpty)
    val gapUs = 1800L * 1000000L
    sessions.groupBy(_._1).foreach { case (user, ss) =>
      ss.foreach { case (_, start, end) =>
        assert(start <= end, s"user $user: inverted session [$start, $end]")
      }
      ss.sliding(2).foreach {
        case Array((_, _, prevEnd), (_, nextStart, _)) =>
          assert(nextStart - prevEnd > gapUs,
            s"user $user: sessions closer than the gap " +
              s"(${nextStart - prevEnd} us)")
        case _ =>
      }
    }
  }

  test("windowed counts conserve the total event count") {
    val total = spark.read.parquet(s"$d/events.parquet").count()
    val windowed = Events.queries("e01_tumbling_hour")(spark, d)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(windowed == total, s"windowed $windowed != total $total")
    // sliding 1h-every-30min double-counts each event exactly once
    val sliding = Events.queries("e02_sliding")(spark, d)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(sliding == 2 * total, s"sliding $sliding != 2*$total")
  }
}
