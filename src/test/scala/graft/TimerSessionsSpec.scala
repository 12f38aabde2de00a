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

  test("timer sessionizer agrees with the batch events_sessions twin " +
      "on the fixture: once every timer fires, per-user session counts " +
      "match the oracled SQL-window formulation exactly") {
    implicit val sc = spark.sqlContext
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      import org.apache.spark.sql.functions._
      val fixture = Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          coalesce(col("value"), lit(0.0)).as("value"))
        .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSeq
        .map { case (u, e, t, v) => TimerEv(u, e, t, v) }
      val maxTs = fixture.map(_.ts.getTime / 1000L).max
      val stream = MemoryStream[TimerEv]
      val q = TimerSessions.sessionize(stream.toDF(),
          gapSeconds = 1800, watermark = "10 minutes")
        .writeStream.format("memory").queryName("timer_agree")
        .outputMode("append").start()
      try {
        stream.addData(fixture)
        q.processAllAvailable()
        // sentinel user -1 drives the watermark past every
        // last_ts + gap (+ the 10-minute delay); timers fire on the
        // batch AFTER the watermark advances, hence two sentinels
        stream.addData(TimerEv(-1L, -1L, at(maxTs + 3600), 0.0))
        q.processAllAvailable()
        stream.addData(TimerEv(-1L, -2L, at(maxTs + 7200), 0.0))
        q.processAllAvailable()
        val streamed = spark.table("timer_agree").as[ClosedSession]
          .collect().filter(_.user_id >= 0)
          .groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
        val batch = graft.operators.EventAnalytics
          .queries("events_sessions")(spark, sfDir)
          .select("user_id", "n_sessions").as[(Long, Long)]
          .collect().toMap
        assert(streamed.keySet == batch.keySet,
          s"user coverage differs: ${batch.keySet -- streamed.keySet}")
        streamed.foreach { case (u, n) =>
          assert(batch(u) == n,
            s"user $u: timer=$n batch=${batch(u)}")
        }
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
