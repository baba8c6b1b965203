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
  * Events are processed in event-time order within a batch; across
  * batches, a LATE event that lands inside (or within `gapMs` of) the
  * open session MERGES into it — bounds expand monotonically — and an
  * event older than `start − gapMs` is emitted as its own
  * already-closed session (it can no longer extend anything). A
  * forward event beyond the gap closes the open session and starts a
  * new one. Only CLOSED sessions are emitted; the open tail stays in
  * state by design (unbounded streams have no end — run with a
  * watermark + event-time timeout to flush and GC state at scale).
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
        case Some(s) if e.ts_ms > s.last + gapMs => // gap: close, start new
          closed ::= Session(user, s.start, s.last, s.n, s.sum)
          cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
        case Some(s) if e.ts_ms < s.start - gapMs => // too-late: own session
          closed ::= Session(user, e.ts_ms, e.ts_ms, 1, e.value)
        case Some(s) => // in or adjacent (possibly late): merge, bounds
          // expand monotonically — a late cross-batch event must never
          // drag `last` backwards
          cur = Some(SessionState(math.min(s.start, e.ts_ms),
            math.max(s.last, e.ts_ms), s.n + 1, s.sum + e.value))
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
