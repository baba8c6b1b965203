package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe per-user ordered event analytics.
  *
  * The natural formulations — `Window.partitionBy(user_id)` for
  * sessionization, row numbering, lag, and moving sums — funnel each
  * user's whole history through ONE task: fine for human-scale users,
  * a scale-killer the moment one bot emits 10⁸ events (the same
  * hot-key class the per-source curation ops eliminated with
  * range-partition + prefix-count passes, `TextAnalysis.scala`).
  *
  * Both operators here use the range-partition + BOUNDARY-MERGE shape
  * instead:
  *
  *  1. `repartitionByRange(user_id, ts, event_id)` +
  *     `sortWithinPartitions` — every partition holds a contiguous
  *     sorted run of the global (user, time) order, so a mega-user
  *     SPLITS across partitions and no task holds more than O(n/P)
  *     rows;
  *  2. a summary pass collects O(1) per partition (its first/last
  *     user, boundary timestamps, and the run statistics a successor
  *     needs) — the driver walks the P summaries in partition order
  *     and resolves each partition's carry-in (the only rows whose
  *     per-user state depends on another partition are the ones
  *     touching its boundary, and sorted contiguity means that is a
  *     single user per boundary);
  *  3. a map-only pass over the SAME checkpointed layout applies the
  *     broadcast carry-ins and computes the per-row results locally.
  *
  * Output is exactly the window formulation's (the oracle gates pin
  * it); the driver holds P tuples, never per-user state.
  */
object EventWindows {

  /** Batch sessionization (gaps-and-islands): a session breaks on a
    * silence longer than `gapUs`; `sid` is the running count of breaks
    * per user; output is the per-session rollup. The boundary carry is
    * `(row0Break, sidOffset)`: whether the partition's first row opens
    * a new session (decided by the previous partition's last timestamp
    * of the same user), and how many sessions that user already opened
    * in earlier partitions.
    *
    * Input needs `user_id`, `event_id`, `ts_ns`, `value`.
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val parts = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        expr("ts_ns div 1000").as("ts_us"), col("value").cast("double"))
      .repartitionByRange(col("user_id"), col("ts_us"), col("event_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .localCheckpoint(true)
      .as[(Long, Long, Long, Double)]

    // pass 1: per-partition boundary summary (one row per partition)
    val summaries = parts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (u0, _, t0, _) = it.next()
        var prevUser = u0; var prevTs = t0
        var breaksFirstAfter0 = 0L // gap-breaks inside the FIRST user's run
        var breaksLast = 0L // complete break count of the LAST user's run,
        // valid only when that run STARTS in this partition (lu != u0)
        var lastUser = u0; var lastTs = t0
        while (it.hasNext) {
          val (u, _, ts, _) = it.next()
          if (u == prevUser) {
            if (ts - prevTs > gapUs) {
              if (u == u0) breaksFirstAfter0 += 1
              breaksLast += 1
            }
          } else breaksLast = 1 // run starts here: its first row is a break
          prevUser = u; prevTs = ts; lastUser = u; lastTs = ts
        }
        Iterator.single((pid, u0, t0, lastUser, lastTs,
          breaksFirstAfter0, breaksLast))
      }
    }.collect().sortBy(_._1)

    // driver boundary walk: O(P) state, no per-user map
    var havePrev = false; var prevUser = 0L; var prevTs = 0L
    var prevBreaks = 0L // total sessions of prevUser opened so far
    val ctrl = Map.newBuilder[Int, (Int, Long)]
    for ((pid, fu, fts, lu, lts, bfa0, bl) <- summaries) {
      val cont = havePrev && prevUser == fu
      val row0Break = if (cont && fts - prevTs <= gapUs) 0 else 1
      val offset = if (cont) prevBreaks else 0L
      ctrl += pid -> (row0Break, offset)
      prevBreaks =
        if (lu == fu) offset + row0Break + bfa0 // whole partition = one run
        else bl // last run started in-partition: its count is complete
      havePrev = true; prevUser = lu; prevTs = lts
    }
    val bc = spark.sparkContext.broadcast(ctrl.result())

    // pass 2: map-only sid assignment over the same frozen layout
    parts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (row0Break, offset) = bc.value(pid)
        var first = true; var curUser = 0L; var sid = 0L; var prevTs = 0L
        it.map { case (u, _, ts, v) =>
          if (first) { first = false; curUser = u; sid = offset + row0Break }
          else if (u != curUser) { curUser = u; sid = 1L }
          else if (ts - prevTs > gapUs) sid += 1
          prevTs = ts
          (u, sid, ts, v)
        }
      }
    }.toDF("user_id", "sid", "ts_us", "value")
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        round(sum("value"), 2).as("sum_value"))
  }

  /** Markov transition counts over per-user event sequences:
    * (from_type → to_type) frequencies + row-normalized probabilities
    * — the behavioral-model / next-event-prediction feature pass. The
    * lag is realized with the same boundary-merge shape as
    * [[sessionize]]: adjacent pairs INSIDE a partition are a map-only
    * scan of the frozen sorted layout (combinable count — the shuffle
    * carries only the tiny type×type matrix), and the one pair that
    * spans each partition boundary (sorted contiguity ⇒ at most one
    * user per boundary) comes from the O(P) driver walk. A
    * 10⁸-event bot never funnels through one task.
    *
    * Input needs `user_id`, `event_id`, `ts_ns`, `event_type`.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val parts = events
      .select(col("user_id").cast("long"), col("ts_ns").cast("long"),
        col("event_id").cast("long"), col("event_type").cast("string"))
      .repartitionByRange(col("user_id"), col("ts_ns"), col("event_id"))
      .sortWithinPartitions("user_id", "ts_ns", "event_id")
      .localCheckpoint(true)
      .as[(Long, Long, Long, String)]

    // boundary summary: each partition's first/last (user, type)
    val summaries = parts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (u0, _, _, t0) = it.next()
        var lu = u0; var lt = t0
        while (it.hasNext) { val (u, _, _, t) = it.next(); lu = u; lt = t }
        Iterator.single((pid, u0, t0, lu, lt))
      }
    }.collect().sortBy(_._1)

    // driver walk: the pair spanning each boundary (same user only)
    val boundary = scala.collection.mutable.Map.empty[(String, String), Long]
    var havePrev = false; var prevUser = 0L; var prevType = ""
    for ((_, fu, ft, lu, lt) <- summaries) {
      if (havePrev && prevUser == fu)
        boundary((prevType, ft)) = boundary.getOrElse((prevType, ft), 0L) + 1
      havePrev = true; prevUser = lu; prevType = lt
    }

    // interior pairs: map-only over the same frozen layout
    val interior = parts.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        var (cu, _, _, ct) = it.next()
        it.map { case (u, _, _, t) =>
          val pair = if (u == cu) Some((ct, t)) else None
          cu = u; ct = t
          pair
        }.flatten
      }
    }.toDF("from_type", "to_type")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val extra = boundary.toSeq.map { case ((f, tt), n) => (f, tt, n) }
    // NOTE: parts stays persisted — `interior` reads its checkpointed
    // blocks lazily at the caller's action (unpersisting here would
    // drop an unrecomputable lineage root)
    val all =
      if (extra.isEmpty) interior
      else interior.unionByName(extra.toDF("from_type", "to_type", "n"))
        .groupBy("from_type", "to_type").agg(sum("n").as("n"))
    val totals = all.groupBy("from_type").agg(sum("n").as("n_from"))
    all.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"),
        (round(col("n").cast("double") * lit(1e6) / col("n_from"), 0)
          .cast("long").cast("double") / lit(1e6)).as("prob"))
  }

  /** Per-user row number, lag(1), and 3-row moving sum — the per-row
    * ordered-window family over `(user_id, ts_ns, event_id)` order.
    * The boundary carry is `(rnOffset, seed)`: how many rows of the
    * boundary user precede this partition, and that user's last ≤2
    * values (oldest→newest) to seed lag and the moving frame. Sums add
    * in ascending frame order — the same order `WindowExec` feeds its
    * aggregate — so doubles match the window formulation bit-for-bit;
    * rounding stays in Spark `round` (not scala) for the same reason.
    */
  def rowNumberLag(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val parts = events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_ns").cast("long"), col("value").cast("double"))
      .repartitionByRange(col("user_id"), col("ts_ns"), col("event_id"))
      .sortWithinPartitions("user_id", "ts_ns", "event_id")
      .localCheckpoint(true)
      .as[(Long, Long, Long, Double)]

    // pass 1: boundary summary — first/last user, their in-partition
    // run lengths, and the last run's tail values (≤2)
    val summaries = parts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (u0, _, _, v0) = it.next()
        var nFirst = 1L // rows of the first user's run
        var nLast = 1L // rows of the last user's run
        var lastUser = u0
        var tail1 = v0 // most recent value of the last run
        var tail2 = Double.NaN; var hasTail2 = false
        while (it.hasNext) {
          val (u, _, _, v) = it.next()
          if (u == lastUser) {
            nLast += 1
            if (u == u0) nFirst += 1
            tail2 = tail1; hasTail2 = true; tail1 = v
          } else {
            lastUser = u; nLast = 1L
            tail1 = v; tail2 = Double.NaN; hasTail2 = false
          }
        }
        Iterator.single((pid, u0, lastUser, nFirst, nLast,
          tail1, tail2, hasTail2))
      }
    }.collect().sortBy(_._1)

    var havePrev = false; var prevUser = 0L
    var prevCount = 0L; var prevVals = Vector.empty[Double] // oldest→newest, ≤2
    val ctrl = Map.newBuilder[Int, (Long, Vector[Double])]
    for ((pid, fu, lu, nFirst, nLast, t1, t2, hasT2) <- summaries) {
      val cont = havePrev && prevUser == fu
      val rnOffset = if (cont) prevCount else 0L
      val seed = if (cont) prevVals else Vector.empty[Double]
      ctrl += pid -> (rnOffset, seed)
      val partTail = (if (hasT2) Vector(t2, t1) else Vector(t1))
      if (lu == fu) {
        prevCount = rnOffset + nFirst
        prevVals = (seed ++ partTail).takeRight(2)
      } else {
        prevCount = nLast
        prevVals = partTail
      }
      havePrev = true; prevUser = lu
    }
    val bc = spark.sparkContext.broadcast(ctrl.result())

    // pass 2: map-only per-row computation with the seeded state
    parts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val (rnOffset, seed) = bc.value(pid)
        var first = true; var curUser = 0L; var rn = 0L
        var p1 = Option.empty[Double]; var p2 = Option.empty[Double]
        it.map { case (u, eid, _, v) =>
          if (first) {
            first = false; curUser = u; rn = rnOffset + 1
            p1 = seed.lastOption
            p2 = if (seed.length >= 2) Some(seed(seed.length - 2)) else None
          } else if (u != curUser) {
            curUser = u; rn = 1; p1 = None; p2 = None
          } else rn += 1
          // ascending frame order, like WindowExec: ((old + mid) + new)
          val ms = (p2, p1) match {
            case (Some(a), Some(b)) => (a + b) + v
            case (None, Some(b)) => b + v
            case _ => v
          }
          val out = (eid, u, rn, p1, ms)
          p2 = p1; p1 = Some(v)
          out
        }
      }
    }.toDF("event_id", "user_id", "rn", "prev_value", "moving_sum3")
      .select(col("event_id"), col("user_id"), col("rn"),
        round(col("prev_value"), 2).as("prev_value"),
        round(col("moving_sum3"), 2).as("moving_sum3"))
  }

  /** Interval-overlap self-join via time-bucket binning — the general
    * range-join pattern (concurrency detection, meeting conflicts,
    * co-session attribution). A naive self-join on the overlap
    * predicate is a cross join (no equi conjunct); instead each
    * interval explodes to the `bucketUs`-wide bins it spans, the join
    * runs as an EQUI join on the bin, the overlap predicate filters
    * within bins, and `distinct` folds pairs that co-occur in several
    * bins. Fan-out is interval-length/bucket (bounded when intervals
    * are); a hot bin is ordinary join skew (AQE-splittable), never a
    * cross join. Output: distinct (a_key, b_key) with a_key < b_key
    * and [a.s, a.e] ∩ [b.s, b.e] ≠ ∅ (closed-interval touch counts).
    *
    * Input columns: `iv_key` (unique interval id), `s`, `e`
    * (timestamps, s ≤ e).
    */
  def intervalOverlapPairs(iv: DataFrame,
      bucketUs: Long = 3600000000L, dedup: Boolean = true): DataFrame = {
    // dedup=false is only sound when EVERY interval fits one bucket
    // (otherwise a multi-bin interval silently duplicates its pairs) —
    // under that contract the bin IS `su div bucketUs`, so the guarded
    // path computes it directly (no explode) and raise_error's loudly
    // on the first violating row instead of corrupting downstream
    // counts after a caller or session-timezone change
    val binned =
      if (dedup)
        iv.select(col("iv_key"),
            unix_micros(col("s")).as("su"), unix_micros(col("e")).as("eu"))
          .select(col("iv_key"), col("su"), col("eu"),
            explode(sequence(
              expr(s"su div $bucketUs"), expr(s"eu div $bucketUs"))).as("bin"))
      else
        iv.select(col("iv_key"),
            unix_micros(col("s")).as("su"), unix_micros(col("e")).as("eu"))
          .select(col("iv_key"), col("su"), col("eu"),
            when(expr(s"su div $bucketUs") === expr(s"eu div $bucketUs"),
              expr(s"su div $bucketUs"))
              .otherwise(raise_error(concat(
                lit("intervalOverlapPairs(dedup=false): interval "),
                col("iv_key").cast("string"),
                lit(s" spans more than one $bucketUs-us bucket")))
                .cast("long")).as("bin"))
    // r19: the bin-keyed self-join is the op's hot stage and its
    // compute-per-byte is quadratic in bin population while its bytes
    // are tiny — AQE's byte-based coalescing (1 MB floor) folds a
    // KB-scale binned frame into ONE post-shuffle task and serializes
    // the pair generation on a single core (measured r18: 3.8 s in
    // one task vs 0.25 s across 32). Request the fan-out HERE with an
    // explicit partition count (AQE never coalesces a user-specified
    // count): both join sides derive from the one repartitioned frame,
    // so the self-join shares the single exchange. defaultParallelism
    // = the session's core budget locally and executors × cores on a
    // cluster — scale-adaptive, not a local[32] constant.
    val fan = binned.repartition(
      iv.sparkSession.sparkContext.defaultParallelism, col("bin"))
    val a = fan.select(col("bin"), col("iv_key").as("a_key"),
      col("su").as("a_su"), col("eu").as("a_eu"))
    val b = fan.select(col("bin"), col("iv_key").as("b_key"),
      col("su").as("b_su"), col("eu").as("b_eu"))
    val pairs = a.join(b, Seq("bin"))
      .where(col("a_key") < col("b_key")
        && col("a_su") <= col("b_eu") && col("b_su") <= col("a_eu"))
      .select("a_key", "b_key")
    // a pair appears once PER SHARED BIN: the distinct folds the
    // multi-bin copies. When every interval provably fits one bin
    // (e.g. day-confined intervals with day buckets) the caller passes
    // dedup = false and the pair stream feeds its consumer pipelined —
    // downstream combinable aggregates then never shuffle the pairs
    // at all (the distinct was the dominant cost of the overlap gate:
    // an O(pairs) wide exchange for provably-unique rows)
    if (dedup) pairs.distinct() else pairs
  }

  /** SCD-2 validity intervals from an event/CDC stream: per key in
    * event order, each row's state is valid from its own timestamp
    * until the NEXT row's (`to_ns` NULL ⇒ current). The lead comes
    * from [[Ranks.keyedRowIndex]] (boundary-merge rank — no physical
    * Window, bot-user-proof) followed by a self-join on
    * (key, rank+1): the join keys are UNIQUE per row, so even a key
    * holding half the table produces no hot join bucket — the classic
    * dimension-build shape at 100 TB.
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id").cast("long"),
      col("event_id").cast("long"), col("event_type"),
      col("ts_ns").cast("long"))
    val ranked = Ranks.keyedRowIndex(base, Seq("user_id"),
      Seq(col("ts_ns").asc, col("event_id").asc), "__r", "__n")
    val next = ranked.select(col("user_id").as("__u2"),
      (col("__r") - 1).as("__r2"), col("ts_ns").as("to_ns"))
    ranked.join(next,
        col("user_id") === col("__u2") && col("__r") === col("__r2"),
        "left_outer")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_ns").as("from_ns"), col("to_ns"),
        col("to_ns").isNull.as("is_current"))
  }

  /** Time-series RESAMPLE + FORWARD FILL (r14): the per-user daily
    * event-count series, gap-filled over each user's
    * [first active day, last active day] — every missing day carries
    * the LAST OBSERVED count forward (the feature-store
    * "latest known value" resample).
    *
    * Scale shape — NO per-user window: the carry is ONE packed long
    * per row, `user·2³⁷ | day·2²⁰ | n`, whose prefix-MAX in global
    * (user, day) order is exactly the last same-user observation. An
    * earlier user's pack can never win (its user field is strictly
    * smaller and day|n occupy only the low 37 bits), and a user's
    * FIRST grid day is observed by construction, so the carry never
    * leaks across a user boundary. The prefix-max runs through
    * [[Ranks.prefixMinLong]] on the negated pack — range partition +
    * one boundary long per partition — so a bot user splits across
    * tasks like any other rows. Grid generation is a map-side
    * `sequence`/`explode` per user. Packing bounds (ASSERTED — a
    * violation fails the job, never corrupts a carry): user_id < 2²⁵,
    * epoch day < 2¹⁷ (through year 2328), daily count < 2²⁰.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val daily = events
      .groupBy(col("user_id").cast("long").as("user_id"),
        datediff(col("ts").cast("date"), epoch).cast("long").as("day"))
      .agg(count(lit(1)).as("n"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col("user_id"),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    // packing bounds FAIL LOUD (the prefix-primitive discipline): a
    // silent overflow of any field would corrupt carries for
    // unrelated rows. The error IS the violating row's pack value
    // (when/otherwise), and prefixMinLong's pass 1 reads every row's
    // __neg, so a violation cannot slip through any plan shape
    val boundsOk = col("user_id") >= 0 && col("user_id") < (1L << 25) &&
      col("day") >= 0 && col("day") < (1L << 17) &&
      (col("n").isNull || col("n") < (1L << 20))
    val packed = grid.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"), col("n"),
        when(boundsOk,
          -(col("user_id") * lit(1L << 37) +
            when(col("n").isNotNull,
              col("day") * lit(1L << 20) + col("n")).otherwise(lit(0L))))
          .otherwise(raise_error(
            lit("gapFillDaily: packing bounds exceeded " +
              "(user_id < 2^25, epoch day < 2^17, daily count < 2^20)"))
            .cast("long"))
          .as("__neg"))
    val pref = Ranks.prefixMinLong(packed,
      Seq(col("user_id").asc, col("day").asc), "__neg", "__pm")
    // the day ships as a midnight TIMESTAMP (not DATE): parquet date32
    // and DuckDB DATE land in different pandas dtypes at the compare
    pref.select(col("user_id"),
      date_add(epoch, col("day").cast("int")).cast("timestamp").as("day"),
      expr("greatest(coalesce(-__pm, -__neg), -__neg) & 1048575")
        .as("n_filled"),
      col("n").isNotNull.as("is_observed"))
  }
}
