package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset stateful API (SURVEY.md §2.8), implementing
  * the same declared semantics as the built-in `session_window` path
  * (st02): 30-minute gap sessions, emitted in append mode once the
  * event-time watermark passes `last_event + gap`, still-open sessions
  * withheld in state with an event-time timeout.
  *
  * State per user is the open-session list only — bounded by active
  * sessions, not event history — and event values accumulate as
  * scaled-by-10⁴ longs so the session sum is exact and
  * partitioning-independent, matching the decimal-quantized batch
  * aggregate (graft.queries.Num) bit-for-bit.
  */
object StatefulSessions {
  val GapMicros: Long = 30L * 60 * 1000000

  // Carries the watermarked `ts` column itself (projecting it away
  // before flatMapGroupsWithState would strip the event-time watermark
  // the EventTimeTimeout needs).
  case class SEvent(user_id: Long, ts: Timestamp, value: Double) {
    def tsm: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class OpenSession(start: Long, last: Long, n: Long, sumScaled: Long)
  case class UserSessions(sessions: Seq[OpenSession])
  case class SessionOut(session_start: Timestamp, session_end: Timestamp,
                        user_id: Long, n_events: Long, session_value: Double)

  private def scaled4(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def tsOf(micros: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      micros / 1000000L, (micros % 1000000L) * 1000L))

  /** Merge a batch of events into the open-session list (gap merge over
    * the sorted union — linear in events + open sessions). */
  private[streaming] def merge(open: Seq[OpenSession],
                               events: Seq[SEvent]): Seq[OpenSession] = {
    val pts = (open ++
      events.map(e => OpenSession(e.tsm, e.tsm, 1, scaled4(e.value))))
      .sortBy(s => (s.start, s.last))
    pts.foldLeft(List.empty[OpenSession]) { (acc, s) =>
      acc match {
        case head :: tail if s.start <= head.last + GapMicros =>
          OpenSession(head.start, math.max(head.last, s.last),
            head.n + s.n, head.sumScaled + s.sumScaled) :: tail
        case _ => s :: acc
      }
    }.reverse
  }

  /** Closed-session output row — shared with the transformWithState
    * restatement ([[TwsSessions]]) so both emit identically. */
  private[streaming] def toOut(userId: Long, s: OpenSession): SessionOut =
    SessionOut(tsOf(s.start), tsOf(s.last + GapMicros), userId, s.n,
      new java.math.BigDecimal(java.math.BigInteger.valueOf(s.sumScaled), 4)
        .doubleValue())

  private def step(userId: Long, it: Iterator[SEvent],
                   state: GroupState[UserSessions]): Iterator[SessionOut] = {
    val open = state.getOption.map(_.sessions).getOrElse(Seq.empty)
    val merged = merge(open, it.toSeq)
    val wmMicros = state.getCurrentWatermarkMs() * 1000L
    val (closed, stillOpen) =
      merged.partition(s => s.last + GapMicros <= wmMicros)
    if (stillOpen.isEmpty) state.remove()
    else {
      state.update(UserSessions(stillOpen))
      // Wake this group when the watermark can close its earliest
      // session (timeout must sit strictly beyond the current watermark).
      val wakeMs = math.max(
        stillOpen.map(s => (s.last + GapMicros) / 1000L).min,
        state.getCurrentWatermarkMs() + 1)
      state.setTimeoutTimestamp(wakeMs)
    }
    closed.iterator.map(s => toOut(userId, s))
  }

  /** events (user_id, ts timestamp with watermark applied, value) →
    * append stream of closed sessions. */
  def sessions(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("value"))
      .as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)
  }
}
