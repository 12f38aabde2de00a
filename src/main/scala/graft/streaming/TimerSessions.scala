package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.streaming.StatefulSessions.{ClosedSession, SessionEvent,
  SessionState, foldEvents}

/** Timer-driven sessionization on the `transformWithState` API — the
  * Spark-4 successor of `[flat]mapGroupsWithState` (typed per-key state
  * variables, first-class timers, state TTL; requires the RocksDB state
  * store provider).
  *
  * What it adds over [[StatefulSessions.sessionize]]: the
  * flatMapGroupsWithState form can only close an idle session when (a) a
  * later event for the SAME user arrives past the gap, or (b) a
  * processing-time timeout fires — wall-clock, hence nondeterministic
  * under replay. Here every event (re)arms an EVENT-TIME timer at
  * `last_ts + gap`; when the WATERMARK — global progress, driven by all
  * users' events — passes that point, `handleExpiredTimer` closes the
  * session. A user who never returns still closes deterministically, at
  * the same watermark in every replay: exactly the replay-stable flush
  * that processing-time timeouts cannot give.
  *
  * Scale notes: state is one SessionState + at most one registered timer
  * per ACTIVE user (timers for a key are re-armed, not accumulated),
  * sharded by group key like every keyed op; RocksDB keeps it off-heap.
  */
object TimerSessions {

  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    // CEILING to ms: flooring would let the timer fire up to ~2 ms
    // before last_ts + gap, wrongly closing a session that an in-gap
    // (non-late) event could still extend
    private def timerMsFor(st: SessionState): Long =
      (st.lastUs + gapUs + 999L) / 1000L

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: TimerValues): Iterator[ClosedSession] = {
      val open = if (session.exists()) Some(session.get()) else None
      // disarm the previous timer before folding — the fold may close or
      // extend the session and the timer must track its NEW end
      open.foreach(st => getHandle.deleteTimer(timerMsFor(st)))
      val (closed, next) = foldEvents(rows.toSeq, open, gapUs)
      next match {
        case Some(st) =>
          session.update(st)
          getHandle.registerTimer(timerMsFor(st))
        case None => session.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // the watermark passed last_ts + gap: no in-order event can extend
      // this session any more — close and evict
      if (!session.exists()) Iterator.empty
      else {
        val st = session.get()
        session.clear()
        Iterator.single(ClosedSession(user, st.startUs, st.lastUs,
          st.nEvents, st.sumValue, "timer"))
      }
    }
  }

  /** Sessionize a flattened event frame (ts TimestampType). The
    * watermark both bounds reordering AND drives the timers. */
  def sessionize(flat: DataFrame, gapSeconds: Long = 1800L,
      watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = flat.sparkSession
    import spark.implicits._
    flat.withWatermark("ts", watermark)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us",
        "value")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
