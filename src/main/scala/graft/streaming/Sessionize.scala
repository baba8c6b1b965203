package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionizer —
  * `flatMapGroupsWithState` over a user-keyed event stream (SURVEY
  * §2.D / the "custom state" row of the extension table; this is the
  * mechanism the engine offers where the reference has only barrier
  * semantics, §2.A A7).
  *
  * State per user = the open session (start, last-seen, count, sum)
  * plus at most ONE open "late" session buffering events that arrived
  * older than `start − gapMs`. Events are processed in event-time
  * order within a batch; across batches, a LATE event that lands
  * inside (or within `gapMs` of) the open session MERGES into it —
  * bounds expand monotonically. Too-late events (older than
  * `start − gapMs`) accumulate in the late session: consecutive
  * too-late events within `gapMs` of each other merge instead of each
  * emitting a singleton, and the late session merges into the main one
  * if growth makes them gap-adjacent. A too-late event beyond the gap
  * of the buffered late session closes the OLDER of the two as final
  * (its gap can provably never be bridged). A forward event beyond the
  * gap closes both open sessions and starts a new one. Only CLOSED
  * sessions are emitted; the open tail stays in state by design
  * (unbounded streams have no end — run with a watermark + event-time
  * timeout to flush and GC state at scale).
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class Open(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionState(main: Open, late: Option[Open])
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  def update(gapMs: Long)(
      user: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    var closed = List.empty[Session]
    var main: Option[Open] = state.getOption.map(_.main)
    var late: Option[Open] = state.getOption.flatMap(_.late)
    def emit(s: Open): Unit = closed ::= Session(user, s.start, s.last, s.n, s.sum)
    def absorb(s: Open, ts: Long, v: Double): Open =
      Open(math.min(s.start, ts), math.max(s.last, ts), s.n + 1, s.sum + v)
    // merge the late buffer into main once their gap has been bridged
    def tryCoalesce(): Unit = (main, late) match {
      case (Some(m), Some(l)) if l.last + gapMs >= m.start && l.start <= m.last + gapMs =>
        main = Some(Open(math.min(m.start, l.start), math.max(m.last, l.last),
          m.n + l.n, m.sum + l.sum))
        late = None
      case _ => ()
    }
    events.toSeq.sortBy(_.ts_ms).foreach { e =>
      main match {
        case Some(m) if e.ts_ms > m.last + gapMs => // forward gap: close, start new
          // the late buffer is older still — it can never reach the new
          // session, so it is final too (emit oldest-first)
          late.foreach(emit); late = None
          emit(m)
          main = Some(Open(e.ts_ms, e.ts_ms, 1, e.value))
        case Some(m) if e.ts_ms < m.start - gapMs => // too-late: buffer/merge
          late match {
            case Some(l) if e.ts_ms >= l.start - gapMs && e.ts_ms <= l.last + gapMs =>
              late = Some(absorb(l, e.ts_ms, e.value))
            case Some(l) => // disjoint from the buffered late session:
              // close the OLDER one — nothing can bridge its gap anymore
              // (events within this batch only grow more recent)
              if (e.ts_ms > l.last) { emit(l); late = Some(Open(e.ts_ms, e.ts_ms, 1, e.value)) }
              else emit(Open(e.ts_ms, e.ts_ms, 1, e.value))
            case None =>
              late = Some(Open(e.ts_ms, e.ts_ms, 1, e.value))
          }
          tryCoalesce()
        case Some(m) => // in or adjacent (possibly late): merge; bounds
          // expand monotonically — a late cross-batch event must never
          // drag `last` backwards
          main = Some(absorb(m, e.ts_ms, e.value))
          tryCoalesce()
        case None =>
          main = Some(Open(e.ts_ms, e.ts_ms, 1, e.value))
          tryCoalesce()
      }
    }
    main.foreach(m => state.update(SessionState(m, late)))
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
