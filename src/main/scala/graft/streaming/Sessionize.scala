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
  * plus a BOUNDED list (≤ [[MaxLateIslands]]) of open "late" islands
  * buffering events that arrived older than `start − gapMs`. Events
  * are processed in event-time order within a batch; across batches,
  * a LATE event that lands inside (or within `gapMs` of) the open
  * session MERGES into it — bounds expand monotonically. Too-late
  * events accumulate in whichever island they fall within `gapMs` of
  * (islands merge when growth bridges them, and the newest island
  * merges into the main session once gap-adjacent) — so consecutive
  * too-late events never fragment into singletons. Only when the
  * island list overflows is the OLDEST island emitted as a
  * best-effort final session (bridging it needs ever-older data, the
  * least likely arrival). A forward event beyond the gap closes every
  * open session and starts a new one. Only CLOSED sessions are
  * emitted; the open tail stays in state by design (unbounded streams
  * have no end — run with a watermark + event-time timeout to flush
  * and GC state at scale).
  */
object Sessionize {

  /** UNIT NOTE: `ts_ms` (and `gapMs`, `Session.start_ms/end_ms`) are
    * the CALLER's tick unit — the machinery is pure integer
    * arithmetic. The protocol specs drive it in milliseconds; the
    * `st_sessionize` gate drives it in MICROSECONDS (gap
    * 1 800 000 000 µs = 30 min). Never copy a gap constant across
    * callers without checking the tick unit.
    */
  final case class Event(user_id: Long, ts_ms: Long, value: Double)
  final case class Open(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionState(main: Open, late: List[Open])

  /** state-size bound on buffered late islands per user */
  val MaxLateIslands = 4
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  def update(gapMs: Long)(
      user: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    var closed = List.empty[Session]
    var main: Option[Open] = state.getOption.map(_.main)
    // late islands, kept sorted ascending by start
    var late: List[Open] = state.getOption.map(_.late).getOrElse(Nil)
    def emit(s: Open): Unit = closed ::= Session(user, s.start, s.last, s.n, s.sum)
    def absorb(s: Open, ts: Long, v: Double): Open =
      Open(math.min(s.start, ts), math.max(s.last, ts), s.n + 1, s.sum + v)
    def merged(a: Open, b: Open): Open =
      Open(math.min(a.start, b.start), math.max(a.last, b.last), a.n + b.n, a.sum + b.sum)
    // re-normalize the island list: merge islands that have grown
    // gap-adjacent, then fold the newest into main once bridged
    def normalize(): Unit = {
      late = late.sortBy(_.start).foldLeft(List.empty[Open]) {
        case (acc @ (prev :: rest), cur) if cur.start <= prev.last + gapMs =>
          merged(prev, cur) :: rest
        case (acc, cur) => cur :: acc
      }.reverse
      main match {
        case Some(m) =>
          val (bridged, rest) = late.partition(l =>
            l.last + gapMs >= m.start && l.start <= m.last + gapMs)
          if (bridged.nonEmpty) {
            main = Some(bridged.foldLeft(m)(merged))
            late = rest
          }
        case None => ()
      }
      if (late.size > MaxLateIslands) { // bound the state: emit oldest
        emit(late.head)
        late = late.tail
      }
    }
    events.toSeq.sortBy(_.ts_ms).foreach { e =>
      main match {
        case Some(m) if e.ts_ms > m.last + gapMs => // forward gap: close, start new
          // every late island is older still — none can reach the new
          // session, so they are final too (emit oldest-first)
          late.sortBy(_.start).foreach(emit); late = Nil
          emit(m)
          main = Some(Open(e.ts_ms, e.ts_ms, 1, e.value))
        case Some(m) if e.ts_ms < m.start - gapMs => // too-late: island merge
          late.indexWhere(l =>
            e.ts_ms >= l.start - gapMs && e.ts_ms <= l.last + gapMs) match {
            case -1 => late = (Open(e.ts_ms, e.ts_ms, 1, e.value) :: late).sortBy(_.start)
            case i => late = late.updated(i, absorb(late(i), e.ts_ms, e.value))
          }
          normalize()
        case Some(m) => // in or adjacent (possibly late): merge; bounds
          // expand monotonically — a late cross-batch event must never
          // drag `last` backwards
          main = Some(absorb(m, e.ts_ms, e.value))
          normalize()
        case None =>
          main = Some(Open(e.ts_ms, e.ts_ms, 1, e.value))
          normalize()
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
