package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import StatefulSessions.{GapMicros, OpenSession, SEvent, SessionOut, UserSessions}

/** The THIRD independent implementation of the 30-minute-gap session
  * contract (after st02's built-in `session_window` and st03's
  * `flatMapGroupsWithState`), through Spark 4's `transformWithState`
  * arbitrary-state API — the operator Spark positions as the successor
  * to [flat]mapGroupsWithState: typed per-key state handles
  * (ValueState/ListState/MapState), explicit timers instead of a
  * single timeout slot, and a RocksDB-only state backend. All three
  * implementations answer to the same DuckDB oracle, which is the
  * point: the session semantics live in the CONTRACT, not in whichever
  * state API a Spark version favors.
  *
  * Reuses [[StatefulSessions.merge]] (the gap-merge over open
  * sessions) and the scaled-integer value accumulation verbatim, so
  * any divergence between st03 and st16 isolates to the state/timer
  * plumbing — exactly what a migration to the new API needs checked.
  */
object TwsSessions {

  /** Per-key session state machine: open-session list in a ValueState,
    * one event-time timer parked at the earliest possible close. */
  class SessionProcessor extends StatefulProcessor[Long, SEvent, SessionOut] {
    @transient private var sessions: ValueState[UserSessions] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sessions = getHandle.getValueState[UserSessions](
        "sessions", Encoders.product[UserSessions], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SEvent],
                                 tv: TimerValues): Iterator[SessionOut] = {
      val open =
        if (sessions.exists()) sessions.get().sessions else Seq.empty
      emitAndPark(key, StatefulSessions.merge(open, rows.toSeq),
        tv.getCurrentWatermarkInMs())
    }

    /** The watermark moved past a parked close time: close what is now
      * closable and re-park for the remainder. A stale timer (state
      * already emptied by a later input batch) is a no-op. */
    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      val open =
        if (sessions.exists()) sessions.get().sessions else Seq.empty
      emitAndPark(key, open, tv.getCurrentWatermarkInMs())
    }

    private def emitAndPark(key: Long, merged: Seq[OpenSession],
                            wmMs: Long): Iterator[SessionOut] = {
      val wmMicros = wmMs * 1000L
      val (closed, stillOpen) =
        merged.partition(s => s.last + GapMicros <= wmMicros)
      if (stillOpen.isEmpty) sessions.clear()
      else {
        sessions.update(UserSessions(stillOpen))
        // Park strictly beyond the current watermark (a timer at or
        // before it would never fire). Superseded timers from earlier
        // batches fire as no-ops — cheaper than tracking them for
        // deleteTimer, and bounded by batches-per-open-session.
        getHandle.registerTimer(math.max(
          stillOpen.map(s => (s.last + GapMicros) / 1000L).min, wmMs + 1))
      }
      closed.iterator.map(s => StatefulSessions.toOut(key, s))
    }
  }

  /** events (user_id, ts with watermark applied, value) → append stream
    * of closed sessions — same signature and contract as
    * [[StatefulSessions.sessions]]. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .as[SEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(),
        TimeMode.EventTime(), OutputMode.Append(),
        implicitly[Encoder[SessionOut]])
  }
}
