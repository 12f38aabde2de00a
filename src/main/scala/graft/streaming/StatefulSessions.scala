package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionization via
  * `flatMapGroupsWithState` (SURVEY.md §2.6 extension; the reference's
  * stream is stateless map/filter only).
  *
  * Semantics: per-user sessions close after `gapSeconds` of event-time
  * inactivity OR on processing-time state timeout (events arriving out
  * of order within a batch are sorted by event time before folding —
  * cross-batch reordering is bounded by the upstream watermark).
  *
  * Scale notes: state is one small [[SessionState]] per ACTIVE user key
  * (not per event), partitioned by the group key across executors and
  * backed by the state store (RocksDB on a real cluster); timeouts
  * guarantee state is evicted for idle users, so state size tracks
  * concurrent-active users, not history.
  */
object StatefulSessions {

  case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long,
      value: Double)

  case class SessionState(startUs: Long, lastUs: Long, nEvents: Long,
      sumValue: Double)

  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double, closed_by: String)

  /** Fold a batch of events for one user into (closed sessions, open
    * state). Pure — the unit the spec exercises directly. */
  def foldEvents(events: Seq[SessionEvent], open: Option[SessionState],
      gapUs: Long): (Seq[ClosedSession], Option[SessionState]) = {
    val sorted = events.sortBy(e => (e.ts_us, e.event_id))
    var state = open
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      state = state match {
        case Some(st) if e.ts_us - st.lastUs <= gapUs =>
          Some(st.copy(lastUs = e.ts_us, nEvents = st.nEvents + 1,
            sumValue = st.sumValue + e.value))
        case Some(st) =>
          closed += ClosedSession(e.user_id, st.startUs, st.lastUs,
            st.nEvents, st.sumValue, "gap")
          Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    (closed.result(), state)
  }

  /** Streaming sessionizer: emits a row per CLOSED session.
    *
    * `timeout` defaults to NoTimeout (sessions close only when a later
    * event arrives past the gap) — deterministic and what the specs
    * exercise. Production deployments that must flush sessions for
    * users who never return pass `ProcessingTimeTimeout`; note that
    * processing-time timeouts make the engine schedule continuous
    * timeout-check micro-batches (an idle stream still burns batches —
    * pair it with a processing-time trigger). */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long = 1800L,
      stateTimeout: String = "30 minutes",
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
  : Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val useTimeout = timeout != GroupStateTimeout.NoTimeout

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeout) {
        (user: Long, it: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(ClosedSession(user, st.startUs, st.lastUs,
              st.nEvents, st.sumValue, "timeout"))
          } else {
            val (closed, open) =
              foldEvents(it.toSeq, state.getOption, gapUs)
            open match {
              case Some(st) =>
                state.update(st)
                if (useTimeout) state.setTimeoutDuration(stateTimeout)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }

  /** Adapter from the flattened event frame (ts TimestampType). */
  def fromFlatEvents(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame): Dataset[SessionEvent] = {
    import spark.implicits._
    df.selectExpr("user_id", "event_id",
      "unix_micros(ts) AS ts_us", "value").as[SessionEvent]
  }
}
