package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, SessionEvent, SessionState}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000000L

  test("foldEvents: gap splits sessions, totals accumulate") {
    val ev = Seq(
      SessionEvent(1, 10, 0L, 5.0),
      SessionEvent(1, 11, 60 * us, 7.0),     // same session (gap 60s)
      SessionEvent(1, 12, 4000 * us, 1.0))   // > 1800s gap -> new session
    val (closed, open) = StatefulSessions.foldEvents(ev, None, 1800 * us)
    assert(closed.length == 1)
    assert(closed.head.n_events == 2)
    assert(math.abs(closed.head.sum_value - 12.0) < 1e-12)
    assert(closed.head.closed_by == "gap")
    assert(open.contains(SessionState(4000 * us, 4000 * us, 1, 1.0)))
  }

  test("foldEvents: resumes open state across batches") {
    val open = Some(SessionState(0L, 100 * us, 3, 9.0))
    val (closed, next) = StatefulSessions.foldEvents(
      Seq(SessionEvent(1, 20, 200 * us, 1.0)), open, 1800 * us)
    assert(closed.isEmpty)
    assert(next.contains(SessionState(0L, 200 * us, 4, 10.0)))
  }

  test("foldEvents: out-of-order within a batch is sorted by event time") {
    val ev = Seq(
      SessionEvent(1, 2, 120 * us, 1.0),
      SessionEvent(1, 1, 0L, 1.0))
    val (closed, open) = StatefulSessions.foldEvents(ev, None, 1800 * us)
    assert(closed.isEmpty)
    assert(open.get.startUs == 0L && open.get.lastUs == 120 * us)
  }

  test("streaming: closed sessions emitted across micro-batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = StatefulSessions.sessionize(stream.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(
        SessionEvent(7, 1, 0L, 2.0),
        SessionEvent(7, 2, 30 * us, 3.0),
        SessionEvent(8, 3, 0L, 1.0))
      q.processAllAvailable()
      // nothing closed yet (all sessions open)
      assert(spark.table("sessions_out").count() == 0)
      // a far-future event for user 7 closes the first session
      stream.addData(SessionEvent(7, 4, 10000 * us, 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7)
      assert(closed.head.n_events == 2)
      assert(math.abs(closed.head.sum_value - 5.0) < 1e-12)
    } finally q.stop()
  }

  test("batch sessionization agrees with the SQL window formulation") {
    val flat = Tables.load(spark, sfDir, "events")
    val ds = StatefulSessions.fromFlatEvents(spark, flat)
    // batch mode: run the same fold per user over the full history
    val folded = ds.collect().groupBy(_.user_id).map { case (u, evs) =>
      val (closed, open) = StatefulSessions.foldEvents(
        evs.toSeq, None, 1800L * us)
      u -> (closed.length + open.size)
    }
    val sqlCounts = graft.operators.EventAnalytics
      .queries("events_sessions")(spark, sfDir)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    folded.foreach { case (u, n) =>
      assert(sqlCounts(u) == n.toLong, s"user $u: fold=$n sql=${sqlCounts(u)}")
    }
  }
}
