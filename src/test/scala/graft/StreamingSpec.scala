package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{Sessionize, StreamOps}
import Sessionize.{Event, Session}

/** Structured Streaming specs: stateful sessionization over a
  * MemoryStream with controlled batch boundaries, and the streaming
  * windowed-aggregation entry vs its batch equivalent.
  */
class StreamingSpec extends GraftSuite {

  test("flatMapGroupsWithState sessionizer: gap closes sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 — two events 10s apart (one session, stays open)
      mem.addData(Event(1, 1000, 1.0), Event(1, 11000, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0, "open session must not emit")

      // batch 2: event 10 min later → closes first session, opens second
      mem.addData(Event(1, 611000, 5.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Session].collect()
      assert(closed.length == 1)
      assert(closed.head == Session(1, 1000, 11000, 2, 3.0))

      // batch 3: second user interleaved; state is per-key
      mem.addData(Event(2, 1000, 7.0), Event(1, 2000000, 1.0))
      q.processAllAvailable()
      val all2 = spark.table("sessions_out").as[Session].collect()
      assert(all2.length == 2)
      assert(all2.exists(s => s.user_id == 1 && s.start_ms == 611000 && s.n_events == 1))
    } finally q.stop()
  }

  test("streaming reservoir: cross-batch state keeps exactly the global top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{ResEv, ResRow}
    // two strata, 40 events, priorities a permutation of 1..101 range;
    // batch 1 = first 20 events, batch 2 = the rest
    val evs = (1L to 40L).map(id =>
      ResEv(if (id % 2 == 0) "a" else "b", id, (id * 37) % 101))
    def topk(slice: Seq[ResEv]): Set[ResRow] =
      slice.groupBy(_.event_type).flatMap { case (t, es) =>
        es.sortBy(e => (-e.prio, e.event_id)).take(3).zipWithIndex
          .map { case (e, i) => ResRow(t, i + 1L, e.event_id, e.prio) }
      }.toSet
    val mem = MemoryStream[ResEv]
    val q = StreamOps.reservoirTopK(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("res_out")
      .outputMode("update").start()
    try {
      mem.addData(evs.take(20): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(20): _*)
      q.processAllAvailable()
      // update mode re-emits each updated stratum's current reservoir:
      // the table is exactly batch-1's top-k ∪ the FINAL top-k — the
      // final sample equals the single-batch answer (state carried)
      val got = spark.table("res_out").as[ResRow].collect().toSet
      assert(got == topk(evs.take(20)) ++ topk(evs))
    } finally q.stop()
  }

  test("streaming sketch registers: cross-batch state equals the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{SkEv, SkReg}
    // 300 rows in one stratum with cap=64 force TWO level raises
    // mid-stream (lvl 0 → 2); hashes are the real wide polynomial so
    // the streaming filter matches the batch predicate bit-for-bit
    val hashOf: Long => Long = {
      val df = spark.range(1, 301)
        .select(col("id"), graft.ext.TextAnalysis.polyHashWide(
          col("id").cast("string")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      df
    }
    val evs = (1L to 300L).map(id => SkEv("a", id.toString, id * 10, hashOf(id)))
    def batchRegs(slice: Seq[SkEv]): Set[SkReg] = {
      val n = slice.length.toLong
      val lvl = graft.ext.Sketches.sketchLevel(n, 64)
      slice.filter(e => e.h % (1L << lvl) == 0)
        .map(e => SkReg("a", lvl.toLong, n, e.k, e.v)).toSet
    }
    val mem = MemoryStream[SkEv]
    val q = StreamOps.sketchRegStreaming(mem.toDS(), cap = 64)
      .writeStream.format("memory").queryName("sk_out")
      .outputMode("update").start()
    try {
      mem.addData(evs.take(100): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(100): _*)
      q.processAllAvailable()
      // update mode re-emits the stratum's current register set per
      // batch: the table is batch-1's registers ∪ the FINAL set, and
      // the final set equals the single-batch build (level raises
      // re-filtered in place — the nesting property)
      val got = spark.table("sk_out").as[SkReg].collect().toSet
      assert(got == batchRegs(evs.take(100)) ++ batchRegs(evs))
      assert(batchRegs(evs).nonEmpty, "vacuous fixture: no registers")
    } finally q.stop()
  }

  test("streaming KMV registers: cross-batch min-k equals the batch build (r17)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{KmvEv, KmvRow}
    // 40 hashes with duplicates, k=5: min-k of a union is
    // order-independent, so the fold across the batch boundary equals
    // the single-batch build
    val evs = (1L to 40L).map(i => KmvEv("a", (i * 37) % 23))
    def regs(slice: Seq[KmvEv]): Set[KmvRow] =
      slice.map(_.h).distinct.sorted.take(5).zipWithIndex
        .map { case (h, i) => KmvRow("a", i + 1L, h) }.toSet
    val mem = MemoryStream[KmvEv]
    val q = StreamOps.kmvRegStreaming(mem.toDS(), k = 5)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    try {
      mem.addData(evs.take(20): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(20): _*)
      q.processAllAvailable()
      // update-mode table = batch-1's emission ∪ the FINAL registers,
      // and the final set equals the single-batch min-k
      val got = spark.table("kmv_out").as[KmvRow].collect().toSet
      assert(got == regs(evs.take(20)) ++ regs(evs))
    } finally q.stop()
  }

  test("streaming heavy-hitter candidates: MG guarantee holds across batches (r17)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{HhEv, HhRow}
    // one bucket, k=4: "hot" holds 30 of 90 rows (1/3 > n/k = 1/4), so
    // the Misra-Gries guarantee (count error < n/k) forces it to
    // survive ANY arrival order — including the state fold across the
    // batch boundary; 60 distinct fillers churn decrement-all eviction
    val evs = (0 until 90).map { i =>
      HhEv(0, if (i % 3 == 0) "hot" else s"f$i")
    }
    val mem = MemoryStream[HhEv]
    val q = StreamOps.heavyKeysStreaming(mem.toDS(), k = 4)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      mem.addData(evs.take(45): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(45): _*)
      q.processAllAvailable()
      val got = spark.table("hh_out").as[HhRow].collect()
      val keys = got.map(_.hkey).toSet
      assert(keys.contains("hot"),
        s"guaranteed hitter evicted — MG invariant broken: $keys")
      // update mode appends each batch's emission; ≤ k survivors per
      // batch emission → ≤ 2k rows total for one bucket
      assert(got.length <= 8, s"state exceeded the k-counter bound: ${got.length}")
      assert(keys.subsetOf(evs.map(_.hkey).toSet))
    } finally q.stop()
  }

  test("streaming SCD-2: closes versions across batches, one open per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{ScdEv, ScdVersion}
    val mem = MemoryStream[ScdEv]
    val q = StreamOps.scd2Versions(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // batch 1: two events for user 1 (first version closes), one
      // opener for user 2 (nothing closes)
      mem.addData(ScdEv(1, 1000, 10, "a"), ScdEv(1, 2000, 11, "b"),
        ScdEv(2, 1500, 20, "x"))
      q.processAllAvailable()
      val b1 = spark.table("scd2_out").as[ScdVersion].collect().toSet
      assert(b1 == Set(ScdVersion(1, 10, "a", 1000, 2000)))
      // batch 2: the carried-open tails close exactly as one batch
      // would have closed them (state = ONE open version per user)
      mem.addData(ScdEv(1, 9000, 12, "c"), ScdEv(2, 8000, 21, "y"))
      q.processAllAvailable()
      val b2 = spark.table("scd2_out").as[ScdVersion].collect().toSet
      assert(b2 == Set(
        ScdVersion(1, 10, "a", 1000, 2000),
        ScdVersion(1, 11, "b", 2000, 9000),
        ScdVersion(2, 20, "x", 1500, 8000)))
    } finally q.stop()
  }

  test("streaming SCD-2: bot-user history split across three batches equals one batch") {
    // the PER-BATCH MEMORY BOUND contract (StreamOps.scd2Versions):
    // the in-group sort holds one user's slice of ONE micro-batch, so
    // a bot user's history arriving in bounded trigger slices (the
    // maxFilesPerTrigger deployment shape) must close exactly the
    // versions a single unbounded batch would have closed
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{ScdEv, ScdVersion}
    val bot = (1 to 90).map(i => ScdEv(7, i * 1000L, 100L + i, s"t${i % 3}"))
    val mem = MemoryStream[ScdEv]
    val q = StreamOps.scd2Versions(mem.toDS())
      .writeStream.format("memory").queryName("scd2_bot_out")
      .outputMode("append").start()
    try {
      bot.grouped(30).foreach { slice =>
        mem.addData(slice: _*)
        q.processAllAvailable()
      }
      val got = spark.table("scd2_bot_out").as[ScdVersion].collect().toSet
      val want = (1 until 90).map(i =>
        ScdVersion(7, 100L + i, s"t${i % 3}", i * 1000L, (i + 1) * 1000L)).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming SCD-2 replay equals the batch build's closed rows") {
    import spark.implicits._
    val got = StreamOps.scd2Streaming(spark, sf)
      .as[StreamOps.ScdVersion].collect().toSet
    val want = graft.ext.EventWindows
      .scd2Intervals(graft.core.Tables(spark, sf, "events"))
      .filter(col("to_ns").isNotNull)
      .select("user_id", "event_id", "event_type", "from_ns", "to_ns")
      .as[StreamOps.ScdVersion].collect().toSet
    assert(want.nonEmpty && got == want)
  }

  test("streaming IVF assign: replay equals the batch assignment, state bounded by cells") {
    val got = StreamOps.ivfAssignStreaming(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.core.Tables(spark, sf, "embeddings")
    val want = graft.ext.Similarity.ivfIndex(e)._2
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
    // complete-mode aggregation state = one row per cell, never
    // stream-length shaped
    assert(got.size <= 16)
  }

  test("streaming changepoint: hours close across batches with exact running stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourNs = 3600L * 1000000000L
    val mem = MemoryStream[StreamOps.RateEv]
    val q = StreamOps.rateDrift(mem.toDS())
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      // batch 1: type a — 3 events in hour 0, 1 in hour 1 (closes h0)
      mem.addData(StreamOps.RateEv("a", 10L), StreamOps.RateEv("a", 20L),
        StreamOps.RateEv("a", hourNs - 1), StreamOps.RateEv("a", hourNs + 5))
      q.processAllAvailable()
      val b1 = spark.table("drift_out").as[StreamOps.RateDrift].collect()
      assert(b1.length == 1)
      // closed h0: c=3, rk=1, pc=3, excess = 1·3 − 3 = 0
      assert(b1.head.c == 3 && b1.head.rk == 1 && b1.head.pc == 3 &&
        b1.head.excess_scaled == 0)

      // batch 2: hour 3 arrives → closes the carried hour 1 (c=1):
      // rk=2, pc=4, excess = 2·1 − 4 = −2; a second type is
      // independent state and emits nothing (its first hour is open)
      mem.addData(StreamOps.RateEv("a", 3 * hourNs + 7),
        StreamOps.RateEv("b", 42L))
      q.processAllAvailable()
      val b2 = spark.table("drift_out").as[StreamOps.RateDrift].collect()
      assert(b2.length == 2)
      val h1 = b2.find(_.rk == 2).get
      assert(h1.event_type == "a" && h1.c == 1 && h1.pc == 4 &&
        h1.excess_scaled == -2)
    } finally q.stop()
  }

  test("streaming changepoint: an out-of-order batch fails loud, never corrupts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourNs = 3600L * 1000000000L
    val mem = MemoryStream[StreamOps.RateEv]
    val q = StreamOps.rateDrift(mem.toDS())
      .writeStream.format("memory").queryName("drift_ooo")
      .outputMode("append").start()
    try {
      mem.addData(StreamOps.RateEv("a", 2 * hourNs))
      q.processAllAvailable()
      // batch 2 regresses to an earlier hour: the contract violation
      // must surface as a query failure, not duplicate hour rows
      mem.addData(StreamOps.RateEv("a", 5L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("rateDrift") ||
        Option(e.getCause).exists(_.getMessage.contains("rateDrift")))
    } finally q.stop()
  }

  test("streaming changepoint replay equals the batch window build's closed rows") {
    import spark.implicits._
    val got = StreamOps.rateDriftStreaming(spark, sf)
      .select("event_type", "hour", "c", "rk", "pc", "excess_scaled")
      .collect().toSet
    val h = graft.core.Tables(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("hour")
    val want = h.select(col("event_type"), col("hour"), col("c"),
        row_number().over(w).cast("long").as("rk"),
        sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).as("pc"),
        lead("hour", 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .select(col("event_type"), col("hour"), col("c"), col("rk"), col("pc"),
        (col("rk") * col("c") - col("pc")).as("excess_scaled"))
      .collect().toSet
    assert(want.nonEmpty && got == want)
  }

  test("sessionizer: a late cross-batch event merges without corrupting bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, 100000, 1.0))
      q.processAllAvailable()
      // late event from an earlier point, still within the gap: merge
      mem.addData(Event(1, 40000, 2.0))
      q.processAllAvailable()
      // far-future event closes the merged session
      mem.addData(Event(1, 500000, 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_late").as[Session].collect()
      assert(closed.length == 1)
      // bounds expanded monotonically: start=40000, end=100000 (not
      // end-before-start as the pre-fix state would produce)
      assert(closed.head == Session(1, 40000, 100000, 2, 3.0))
    } finally q.stop()
  }

  test("sessionizer: a cluster of too-late events closes as ONE session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(mem.toDS(), gapMs = 10000)
      .writeStream.format("memory").queryName("sessions_late_cluster")
      .outputMode("append").start()
    try {
      // open session at 200s plus a buffered late island at 150s
      mem.addData(Event(1, 200000, 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, 150000, 1.0))
      q.processAllAvailable()
      // an even-older cluster arrives: 50s, 55s, 58s — must buffer and
      // MERGE, not fragment into three singleton sessions
      mem.addData(Event(1, 50000, 1.0), Event(1, 55000, 1.0), Event(1, 58000, 1.0))
      q.processAllAvailable()
      // forward gap closes everything, oldest first
      mem.addData(Event(1, 500000, 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_late_cluster").as[Session].collect()
        .sortBy(_.start_ms)
      assert(closed.length == 3, s"expected 3 closed sessions, got: ${closed.toSeq}")
      assert(closed(0) == Session(1, 50000, 58000, 3, 3.0)) // merged cluster
      assert(closed(1) == Session(1, 150000, 150000, 1, 1.0))
      assert(closed(2) == Session(1, 200000, 200000, 1, 1.0))
    } finally q.stop()
  }

  test("streaming hourly counts equal the batch answer") {
    val streamed = StreamOps.hourlyCountsStreaming(spark, sf)
      .orderBy("hour_start", "event_type").collect()
    val batch = Queries.queries("w_tumbling_hour")(spark, sf)
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.get(0) == b.get(0) && a.get(1) == b.get(1) && a.getLong(2) == b.getLong(2))
    }
  }

  test("latestPerKey upsert view equals the batch argmax per entity") {
    import org.apache.spark.sql.functions._
    val streamed = StreamOps.latestPerKey(spark, sf)
      .orderBy("user_id").collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.core.Tables(spark, sf, "events")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .orderBy("user_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) =>
      assert((0 to 4).forall(i => a.get(i) == b.get(i)),
        s"mismatch: $a vs $b")
    }
  }

  test("append-mode windowed top-k equals the batch rank") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the stream aggregates in APPEND mode (watermark evicts closed
    // windows); flush sentinels finalize the tail — the result must
    // still be exactly the batch top-k over the same events
    val streamed = StreamOps.windowedTopK(spark, sf, 3)
      .orderBy("hour_start", "rk").collect()
    val w = Window.partitionBy("hour_start")
      .orderBy(col("n").desc, col("event_type").asc)
    val batch = graft.core.Tables(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .orderBy("hour_start", "rk").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("foreachBatch micro-batch ingestion into the quad store (SURVEY §3.2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new graft.ingest.QuadStore(spark,
      java.nio.file.Files.createTempDirectory("qs_stream").toString)
    val mem = MemoryStream[String]
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        // protocol updates are human-scale strings; parse+append per batch
        batch.collect().foreach(store.insertData)
      }
      .start()
    try {
      mem.addData("""INSERT DATA { GRAPH <g:a> { <s:1> <p:x> "v1" . } }""")
      q.processAllAvailable()
      val snap = store.snapshot()
      assert(snap.count() == 1)
      mem.addData("""INSERT DATA { GRAPH <g:a> { <s:2> <p:x> "v2" . <s:3> <p:x> "v3" . } }""")
      q.processAllAvailable()
      assert(snap.count() == 1, "earlier snapshot stays pinned")
      assert(store.snapshot().count() == 3)
    } finally q.stop()
  }

  test("session_window groups events by inactivity gap") {
    val df = StreamOps.sessionWindows(graft.core.Tables(spark, sf, "events"))
    val total = df.agg(sum("n_events")).head.getLong(0)
    val events = graft.core.Tables(spark, sf, "events").count()
    assert(total == events, "session windows must partition the events")
  }
}
