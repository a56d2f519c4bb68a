package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming (previous event type → event type) transition emission per
  * user — the stateful half of the Markov clickstream model (batch
  * twin: Relational.q65). State per user is ONE row (the latest event's
  * time/id/type), the minimal cross-batch carry: each micro-batch sorts
  * its own events by (event time, event_id) — the same total order the
  * batch window uses — chains them onto the carried last event, and
  * emits one transition per event that has a predecessor.
  *
  * Contract: transitions are exact when each user's events arrive
  * time-ordered ACROSS micro-batches (within a batch any arrival order
  * is fine — the group sorts). That is the file-source-per-day /
  * AvailableNow replay shape; a source that interleaves event time
  * across batches needs st02/st03's watermark-buffered sessionization
  * instead, by design — a last-event state row cannot reorder history
  * it already emitted.
  */
object StreamTransitions {
  case class TEvent(user_id: Long, ts: Timestamp, event_id: Long,
                    event_type: String) {
    def tsm: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class LastEvent(tsm: Long, eventId: Long, etype: String)
  case class Transition(prev_type: String, event_type: String)

  private def step(userId: Long, it: Iterator[TEvent],
                   state: GroupState[LastEvent]): Iterator[Transition] = {
    val evs = it.toSeq.sortBy(e => (e.tsm, e.event_id))
    var prev = state.getOption
    val out = Seq.newBuilder[Transition]
    evs.foreach { e =>
      prev.foreach(p => out += Transition(p.etype, e.event_type))
      prev = Some(LastEvent(e.tsm, e.event_id, e.event_type))
    }
    prev.foreach(state.update)
    out.result().iterator
  }

  def transitions(events: DataFrame): Dataset[Transition] = {
    val ss = events.sparkSession
    import ss.implicits._
    events.selectExpr("user_id", "ts", "event_id", "event_type")
      .as[TEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
