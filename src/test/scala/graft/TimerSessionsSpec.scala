package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TimerSessions
import graft.streaming.StatefulSessions.ClosedSession

class TimerSessionsSpec extends SparkSpec {
  import spark.implicits._

  case class TimerEv(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  private def at(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("event-time timers close idle sessions when the watermark " +
      "passes last_ts + gap — users who never return still flush, " +
      "deterministically") {
    implicit val sc = spark.sqlContext
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[TimerEv]
      val q = TimerSessions.sessionize(stream.toDF(),
          gapSeconds = 1800, watermark = "10 minutes")
        .writeStream.format("memory").queryName("timer_sessions")
        .outputMode("append").start()
      try {
        // two users, then silence from both
        stream.addData(
          TimerEv(7, 1, at(0), 2.0),
          TimerEv(7, 2, at(30), 3.0),
          TimerEv(8, 3, at(0), 1.0))
        q.processAllAvailable()
        assert(spark.table("timer_sessions").count() == 0,
          "open sessions must not emit")
        // an unrelated user's event drives the watermark to
        // 4000 - 600 = 3400s, past both timers (1830s, 1800s) ...
        stream.addData(TimerEv(9, 4, at(4000), 5.0))
        q.processAllAvailable()
        // ... which fire on the NEXT batch (watermark advances at
        // batch end)
        stream.addData(TimerEv(9, 5, at(4100), 1.0))
        q.processAllAvailable()
        val closed = spark.table("timer_sessions").as[ClosedSession]
          .collect().map(c => c.user_id -> c).toMap
        assert(closed.keySet == Set(7L, 8L),
          s"users 7+8 must flush by timer, got ${closed.keySet}")
        assert(closed(7L).n_events == 2 && closed(7L).closed_by == "timer")
        assert(closed(7L).end_us == 30000000L)
        assert(closed(8L).n_events == 1 && closed(8L).closed_by == "timer")
        // user 9's session is still open (watermark has not passed
        // 4100 + 1800); a far-future event closes it by GAP instead,
        // proving input-driven and timer-driven closure coexist
        stream.addData(TimerEv(9, 6, at(50000), 1.0))
        q.processAllAvailable()
        val nine = spark.table("timer_sessions").as[ClosedSession]
          .collect().filter(_.user_id == 9L)
        assert(nine.length == 1 && nine.head.closed_by == "gap" &&
          nine.head.n_events == 2)
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
