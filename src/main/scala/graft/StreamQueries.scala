package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.StreamOps
import Queries.Q

/** Streaming registry entries: a REAL Structured Streaming query
  * (file source → watermark + tumbling window → memory sink) whose
  * final answer is batch-checkable, and session windows with a
  * gaps-and-islands oracle.
  */
object StreamQueries {

  val all: Seq[Q] = Seq(

    Q("st_stream_window", (s, dir) => StreamOps.hourlyCountsStreaming(s, dir),
      Some("""
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             count(*) AS n, round(sum(value),2) AS sum_value
      FROM events GROUP BY 1, 2""")),

    Q("st_session_window", (s, dir) =>
      StreamOps.sessionWindows(Tables(s, dir, "events")),
      // Spark session_window: a session breaks when the event-time gap
      // is >= the 30-min inactivity gap (window end = last + gap,
      // end-exclusive) — mirrored as a gaps-and-islands computation.
      Some("""
      WITH e AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM e)
      SELECT user_id, min(ts) AS session_start,
             count(*)::BIGINT AS n_events, round(sum(value),2) AS sum_value
      FROM s GROUP BY user_id, sid""")),

    Q("st_stream_dedup", (s, dir) => StreamOps.streamDedupCounts(s, dir),
      Some("""
      SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
      FROM events GROUP BY 1""")),

    // daily HLL distinct-user registers maintained in-stream: state =
    // days x 256 small ints (bounded by the calendar, never by keys);
    // the oracle is the batch register build — same integer ladder as
    // t_hll_registers / w_rolling_hll
    Q("st_hll_daily", (s, dir) => StreamOps.hllDailyStreaming(s, dir),
      Some(s"""
      WITH hh AS (SELECT CAST(ts AS DATE) AS day,
                         ${graft.ext.Sketches.hllMixSql(Queries.duckPhFor("user_id::VARCHAR"))} AS h
                  FROM events),
      rr AS (SELECT day, (h & 255)::INT AS bucket, (h >> 8) AS r FROM hh)
      SELECT CAST(day AS VARCHAR) AS day, bucket,
             max(CASE WHEN r = 0 THEN ${graft.ext.Sketches.HllSuffixBits + 1}
                      ELSE ${graft.ext.Sketches.HllSuffixBits}
                           - (${graft.ext.Sketches.floorLog2Sql("r")}) END)::INT AS rho
      FROM rr GROUP BY 1, 2""")),

    // streaming IVF ingest (r15): arriving embeddings assign to the
    // broadcast offline-trained quantizer (zero shuffle per vector)
    // and the per-cell counts — the recall-drift monitor — are
    // maintained in-stream; state = 16 longs, bounded by the index.
    // The oracle replays the batch assignment (shared quantizer CTEs)
    Q("st_ivf_assign", (s, dir) => StreamOps.ivfAssignStreaming(s, dir),
      Some(s"""
      WITH ${Queries.duckIvfAssignCtes}
      SELECT cid::BIGINT AS cell, count(*)::BIGINT AS n
      FROM assigned GROUP BY 1""")),

    // CDC latest-value-per-key upsert view: one max-struct per entity,
    // state O(#keys); the oracle is the batch argmax with the same
    // (ts, event_id) tie order
    Q("st_latest_upsert", (s, dir) => StreamOps.latestPerKey(s, dir),
      Some("""
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             event_type AS last_type, value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1""")),

    // CDC upsert view WITH TOMBSTONES (r15): every seventh event is a
    // delete marker; a key whose latest op is a delete is absent, a
    // later upsert revives it. Tombstones stay in state (O(#keys) —
    // what makes revives replay-correct); the filter at the sink is
    // the upsert-capable store's delete
    Q("st_cdc_deletes", (s, dir) => StreamOps.cdcDeletesStreaming(s, dir),
      Some("""
      SELECT user_id, ts AS last_ts, event_id AS last_event_id,
             value AS last_value
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn,
                   CASE WHEN event_id % 7 = 0 THEN 'delete'
                        ELSE 'upsert' END AS op
            FROM events)
      WHERE rn = 1 AND op = 'upsert'""")),

    // online changepoint statistic in the stream (r14): per event
    // type, each CLOSED hour emits (count, running index rk, running
    // prefix pc, excess_scaled = rk·c − pc) — the all-integer
    // Page-test increment, state = four longs per type. The oracle
    // is the batch window over hourly counts restricted to hours
    // with a successor (the open tail stays in state by design, the
    // st_scd2_versions replay-equivalence pattern)
    Q("st_changepoint", (s, dir) => StreamOps.rateDriftStreaming(s, dir),
      Some("""
      WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                        count(*)::BIGINT AS c
                 FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, hour, c,
               row_number() OVER w AS rk,
               (sum(c) OVER w)::BIGINT AS pc,
               lead(hour) OVER w AS nxt
             FROM h
             WINDOW w AS (PARTITION BY event_type ORDER BY hour ASC))
      SELECT event_type, hour, c, rk::BIGINT AS rk, pc,
             (rk*c - pc)::BIGINT AS excess_scaled
      FROM st WHERE nxt IS NOT NULL""")),

    // keyed reservoir sample in the stream (r16): per event type the
    // k=8 highest-hash-priority events — a deterministic, replayable
    // fixed-size uniform sample; state O(k·#strata). The oracle is the
    // batch top-k by the same scrambled polynomial priority
    Q("st_reservoir_sample", (s, dir) => StreamOps.reservoirStreaming(s, dir),
      Some(s"""
      SELECT event_type, rk::BIGINT AS rk, event_id, prio FROM (
        SELECT event_type, event_id::BIGINT AS event_id, prio,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY prio DESC, event_id ASC) AS rk
        FROM (SELECT event_type, event_id,
                     (${Queries.duckPhFor("CAST(event_id AS VARCHAR)")}
                      * 2654435761) % 1000000007 AS prio
              FROM events))
      WHERE rk <= 8""")),

    // WEIGHTED streaming reservoir (r17): per event type the k=8
    // smallest exponential keys −ln(u)/w — Efraimidis–Spirakis
    // weighted sampling in min-key form, the batch t_weighted_sample
    // key over the stream; only the priority expression differs from
    // st_reservoir_sample (the r16 contract's promised one-swap)
    Q("st_weighted_sample", (s, dir) =>
      StreamOps.weightedReservoirStreaming(s, dir),
      Some(s"""
      SELECT event_type, rk::BIGINT AS rk, event_id, key_micro FROM (
        SELECT event_type, event_id::BIGINT AS event_id, key_micro,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY key_micro ASC, event_id ASC) AS rk
        FROM (SELECT event_type, event_id,
                     CAST(round(-ln(u) * 1000000.0 / w) AS BIGINT) AS key_micro
              FROM (SELECT event_type, event_id,
                      greatest(1, CAST(round(abs(value)*100.0) AS BIGINT)) AS w,
                      (((${Queries.duckPhFor("'aes:' || CAST(event_id AS VARCHAR)")}
                         * 2654435761 % 1000000007) + 1000000007)
                        % 1000000007 + 1)::DOUBLE / 1000000008.0 AS u
                    FROM events)))
      WHERE rk <= 8""")),

    // streaming per-group KMV registers (r17): the k smallest distinct
    // user-id hashes per event type — min-k of a union is
    // order-independent, so the drained state equals the batch build
    // row-for-row; state ≤ k longs per stratum
    Q("st_kmv_group", (s, dir) => StreamOps.kmvStreaming(s, dir),
      Some(s"""
      SELECT event_type, rk::BIGINT AS rk, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h ASC) AS rk
        FROM (SELECT DISTINCT event_type,
                ${Queries.duckPhFor("CAST(user_id AS VARCHAR)")} AS h
              FROM events))
      WHERE rk <= 64""")),

    // streaming heavy hitters (r17): per-hash-bucket Misra-Gries
    // candidate state in the stream (O(buckets·k), prefix-correct
    // across micro-batches) + exact batch recount of the drained
    // candidate superset — exact counts under the strict threshold,
    // so the oracle is the plain frequency HAVING
    Q("st_heavy_users", (s, dir) => StreamOps.heavyUsersStreaming(s, dir),
      Some("""
      WITH ev AS (SELECT CASE WHEN user_id % 4 = 0 THEN 'heavy'
                              WHEN user_id % 4 = 1 THEN 'warm'
                              ELSE 'u' || user_id::VARCHAR END AS hkey
                  FROM events),
      tot AS (SELECT count(*)::BIGINT AS n FROM ev)
      SELECT hkey, count(*)::BIGINT AS cnt FROM ev, tot
      GROUP BY hkey, n HAVING count(*) * 10 > n""")),

    // streaming quantile-sketch registers (r17): per event type the
    // hash-sampled register store of the mergeable quantile sketch —
    // state (level, n, ≤8·cap registers) per stratum; the level rises
    // as the stratum grows and the registers re-filter in place
    // (nesting predicates), so the drained state equals the batch
    // per-group register build row-for-row. The oracle replays the
    // q_sketch_group level/register construction over events.
    Q("st_sketch_quantiles", (s, dir) => StreamOps.sketchStreaming(s, dir),
      Some(s"""
      WITH ev AS MATERIALIZED (
        SELECT event_type AS g, CAST(event_id AS VARCHAR) AS k,
               CAST(round(value * 100.0) AS BIGINT) AS v
        FROM events),
      ng AS MATERIALIZED (SELECT g, count(*)::BIGINT AS n FROM ev GROUP BY 1),
      lg AS MATERIALIZED (
        SELECT g, n, CASE WHEN n <= 64 THEN 0
                          ELSE (${graft.ext.Sketches.floorLog2Sql("n // 65")}) + 1
                     END AS lvl FROM ng)
      SELECT e.g AS event_type, lg.lvl::BIGINT AS lvl, lg.n AS n_group,
             e.k, e.v AS v_cents
      FROM ev e JOIN lg ON lg.g = e.g
      WHERE (${Queries.duckPhFor("k", 31)} * 1000000007
             + ${Queries.duckPhFor("k", 131)})
            % (1::BIGINT << lvl) = 0""")),

    // streaming SESSIONIZATION under the oracle (r16): the
    // flatMapGroupsWithState sessionizer (open-session + bounded
    // late-island state, cross-batch protocol in StreamingSpec since
    // r5) over the events stream, 30-min gap in µs ticks. CLOSED
    // sessions only — the oracle is the batch w_sessionize
    // construction minus each user's LAST (open) session
    Q("st_sessionize", (s, dir) => StreamOps.sessionizeStreaming(s, dir),
      Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      g AS (
        SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                            OR ts_us - lag(ts_us) OVER w > 1800000000
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                   ROWS UNBOUNDED PRECEDING)::BIGINT AS sid
        FROM g),
      agg AS (
        SELECT user_id, sid, min(ts_us)::BIGINT AS start_us,
               max(ts_us)::BIGINT AS end_us, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM s GROUP BY 1, 2),
      mx AS (SELECT user_id, max(sid) AS msid FROM agg GROUP BY 1)
      SELECT agg.user_id, start_us, end_us, n_events, sum_value
      FROM agg JOIN mx USING (user_id) WHERE sid < msid""")),

    // SCD-2 versions maintained IN THE STREAM (r14): custom
    // flatMapGroupsWithState machine, one open version per user
    // (state O(#users)); each event closes the previous version.
    // Emits CLOSED versions only — the oracle is the batch SCD-2
    // build restricted to rows with a successor (lead IS NOT NULL),
    // the same replay-equivalence pattern as st_hll_daily
    Q("st_scd2_versions", (s, dir) => StreamOps.scd2Streaming(s, dir),
      Some("""
      SELECT * FROM (
        SELECT user_id::BIGINT AS user_id, event_id::BIGINT AS event_id,
               event_type, epoch_us(ts) * 1000 AS from_ns,
               lead(epoch_us(ts) * 1000) OVER w AS to_ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      WHERE to_ns IS NOT NULL""")),

    // stream-stream interval join (attribution shape): inner matches
    // emit as both rows arrive, so the answer is batch-checkable
    Q("st_stream_join", (s, dir) => StreamOps.streamStreamJoin(s, dir),
      Some("""
      SELECT v.event_id AS view_id, b.event_id AS buy_id, v.user_id
      FROM events v JOIN events b
        ON b.user_id = v.user_id AND b.event_type = 'purchase'
       AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR
      WHERE v.event_type = 'view' AND v.user_id < 50""")),

    // LEFT OUTER attribution: every view emits — unmatched ones only
    // after the min-across-inputs watermark proves no purchase can
    // still land in their window (bounded join state); the oracle is
    // the batch left join
    Q("st_stream_outer_join", (s, dir) => StreamOps.streamStreamOuterJoin(s, dir),
      Some("""
      SELECT v.event_id AS view_id, b.event_id AS buy_id, v.user_id
      FROM events v LEFT JOIN events b
        ON b.user_id = v.user_id AND b.event_type = 'purchase'
       AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR
      WHERE v.event_type = 'view' AND v.user_id < 50""")),

    // negative attribution: views with NO purchase by the same user
    // within the following hour — stream-stream LEFT ANTI composed as
    // the watermark-bounded outer join + sink-side IS NULL filter
    // (Structured Streaming has no native stream-stream anti join);
    // the oracle is the batch NOT EXISTS
    Q("st_stream_anti_join", (s, dir) => StreamOps.streamStreamAntiJoin(s, dir),
      Some("""
      SELECT v.event_id AS view_id, v.user_id
      FROM events v
      WHERE v.event_type = 'view' AND v.user_id < 50
        AND NOT EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = v.user_id AND b.event_type = 'purchase'
            AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR)""")),

    // the complete attribution picture, NATIVE stream-stream FULL
    // OUTER interval join: conversions, abandoned views AND walk-in
    // purchases each emit exactly once; unmatched rows surface when
    // their own side's watermark passes the join window
    Q("st_stream_full_join", (s, dir) => StreamOps.streamStreamFullJoin(s, dir),
      Some("""
      SELECT v.event_id AS view_id, b.event_id AS buy_id,
             coalesce(v.user_id, b.user_id) AS user_id
      FROM (SELECT * FROM events WHERE event_type='view' AND user_id < 50) v
      FULL JOIN (SELECT * FROM events WHERE event_type='purchase' AND user_id < 50) b
        ON b.user_id = v.user_id
       AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR""")),

    // positive attribution, NATIVE stream-stream left SEMI join:
    // views that converted within the hour, emitted at most once,
    // match state watermark-bounded on both sides; the oracle is the
    // batch EXISTS
    Q("st_stream_semi_join", (s, dir) => StreamOps.streamStreamSemiJoin(s, dir),
      Some("""
      SELECT v.event_id AS view_id, v.user_id
      FROM events v
      WHERE v.event_type = 'view' AND v.user_id < 50
        AND EXISTS (
          SELECT 1 FROM events b
          WHERE b.user_id = v.user_id AND b.event_type = 'purchase'
            AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR)""")),

    // stream-static enrichment: each micro-batch broadcast-joins the
    // batch dimension table, then aggregates per tier
    Q("st_stream_static_join", (s, dir) => StreamOps.streamStaticJoin(s, dir),
      Some("""
      SELECT (user_id % 3)::INT AS tier, count(*) AS n,
             round(sum(value),2) AS sum_value
      FROM events GROUP BY 1""")),

    // append-mode watermark semantics: the stale half of the slice
    // arrives after the watermark passed it → dropped; the oracle is
    // the aggregation of the surviving (recent) half alone
    // trending top-k per hour: watermark-bounded (window, type) counts
    // in the stream, rank at the sink — ranking inside the stream
    // would need unboundable global state
    Q("st_windowed_topk", (s, dir) => StreamOps.windowedTopK(s, dir, 3),
      Some("""
      WITH c AS (
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT hour_start, event_type, n, rk FROM (
        SELECT *, row_number() OVER (PARTITION BY hour_start
                    ORDER BY n DESC, event_type ASC) AS rk
        FROM c)
      WHERE rk <= 3""")),

    Q("st_watermark_drop", (s, dir) => StreamOps.watermarkedHourlyCounts(s, dir),
      Some("""
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
             count(*)::BIGINT AS n, round(sum(value),2) AS sum_value
      FROM events
      WHERE user_id < 30 AND ts >= TIMESTAMP '2024-01-15 00:00:00'
      GROUP BY 1, 2"""))
  )
}
