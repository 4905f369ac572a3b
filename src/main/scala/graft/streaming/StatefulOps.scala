package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming via `flatMapGroupsWithState` — arbitrary
  * per-key state machines, beyond what windows/session_window express
  * (the prompt's "custom state" path; the reference has no stateful
  * processing at all). The example operator is gap-based
  * sessionization with per-session aggregates: sessions close either
  * when a later event exceeds the gap, or when the event-time
  * watermark passes `last + gap` (timeout).
  *
  * Scale: state lives in the state store, partitioned by key — one
  * shuffle on the grouping key, state size O(active keys), bounded by
  * the watermark.
  */
object StatefulOps {

  final case class Evt(user_id: Long, ets: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long,
      sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private def emit(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.last),
      s.n, s.sum)

  def sessionizeFn(gapMs: Long)(userId: Long, events: Iterator[Evt],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ets.getTime)
    val closed = scala.collection.mutable.Buffer[Session]()
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ets.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(SessionState(s.start, math.max(s.last, t),
            s.n + 1, s.sum + e.value))
        case Some(s) => // gap exceeded → close and start fresh
          closed += emit(userId, s)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      case None => ()
    }
    closed.iterator
  }

  /** Sessionize a (watermarked) typed event stream. Input MUST carry a
    * watermark on `ets` when streaming (EventTimeTimeout contract). */
  def sessionize(ds: Dataset[Evt], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionizeFn(gapMs))
  }
}
