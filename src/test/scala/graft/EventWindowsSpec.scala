package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.EventWindows

/** The range-partition + boundary-merge rewrites must reproduce the
  * per-user window formulations EXACTLY — including across partition
  * boundaries, which is where all the carry logic lives. The fixtures
  * force many boundary crossings by running with few rows per
  * partition and a mega-user that spans several.
  */
class EventWindowsSpec extends GraftSuite {

  private def events = graft.core.Tables(spark, sf, "events")

  private def windowSessionize(gapUs: Long) = {
    val e = events.withColumn("ts_us", expr("ts_ns div 1000"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    e.withColumn("new_s",
        when(lag("ts_us", 1).over(w).isNull ||
          col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sid",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        round(sum("value"), 2).as("sum_value"))
  }

  test("sessionize equals the window formulation (default gap)") {
    val got = EventWindows.sessionize(events)
      .orderBy("user_id", "sid").collect().toSeq
    val want = windowSessionize(1800000000L)
      .orderBy("user_id", "sid").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("sessionize equals the window formulation (tiny gap → many sessions)") {
    // a 10-second gap makes nearly every event its own session —
    // maximal break density stresses every carry branch
    val got = EventWindows.sessionize(events, gapUs = 10000000L)
      .orderBy("user_id", "sid").collect().toSeq
    val want = windowSessionize(10000000L)
      .orderBy("user_id", "sid").collect().toSeq
    assert(got.size > windowSessionize(1800000000L).count() && got == want)
  }

  test("sessionize: a mega-user spanning many partitions carries sids across") {
    import spark.implicits._
    // one user with a long alternating gap pattern + a few small users;
    // 1-row-average partitions force boundary crossings mid-run
    val gap = 100L
    val rows = (0L until 500L).map { i =>
      // every 7th step exceeds the gap → a break
      (1L, i, i * (if (i % 7 == 0) gap + 1 else gap / 2), i.toDouble)
    } ++ Seq((0L, 9000L, 0L, 1.0), (2L, 9001L, 5L, 2.0), (2L, 9002L, 10000L, 3.0))
    val df = rows.toDF("user_id", "event_id", "ts_us_raw", "value")
      .select(col("user_id"), col("event_id"),
        (col("ts_us_raw") * 1000).as("ts_ns"), col("value"))
    val got = EventWindows.sessionize(df, gapUs = gap)
      .orderBy("user_id", "sid").collect().toSeq
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val want = df.withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("new_s",
        when(lag("ts_us", 1).over(w).isNull ||
          col("ts_us") - lag("ts_us", 1).over(w) > gap, 1).otherwise(0))
      .withColumn("sid",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long"))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "sid").collect().toSeq
    assert(got == want)
    // the mega-user genuinely split: more sessions than partitions is
    // not the point — the point is equality; sanity-check break count
    assert(got.count(_.getLong(0) == 1L) > 10)
  }

  test("eventTransitions equals the window-lag formulation across boundaries") {
    import spark.implicits._
    // a mega-user cycling through 3 types over 400 rows (split across
    // many range partitions ⇒ boundary pairs exercised) + small users
    val types = Array("view", "click", "buy")
    val rows = (0L until 400L).map { i =>
      (1L, i, i * 1000L, types((i % 5 % 3).toInt))
    } ++ Seq((2L, 900L, 0L, "view"), (2L, 901L, 5000L, "buy"),
      (3L, 950L, 0L, "click"))
    val df = rows.toDF("user_id", "event_id", "ts_us", "event_type")
      .select(col("user_id"), col("event_id"),
        (col("ts_us") * 1000).as("ts_ns"), col("event_type"))
    val got = EventWindows.eventTransitions(df)
      .orderBy("from_type", "to_type").collect().toSeq
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val want = df
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wantTot = want.groupBy("from_type").agg(sum("n").as("n_from"))
    val wantFull = want.join(wantTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("n_from"), 6).as("prob"))
      .orderBy("from_type", "to_type").collect().toSeq
    assert(got.nonEmpty && got == wantFull)
    // total transition mass: every non-first row contributes exactly one
    assert(got.map(_.getLong(2)).sum == 399L + 1L)
  }

  test("rowNumberLag equals the window formulation") {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val want = events.select(
        col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("rn"),
        round(lag("value", 1).over(w), 2).as("prev_value"),
        round(sum("value").over(w.rowsBetween(-2, 0)), 2).as("moving_sum3"))
      .orderBy("user_id", "rn").collect().toSeq
    val got = EventWindows.rowNumberLag(events)
      .orderBy("user_id", "rn").collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("rowNumberLag: seeded lag/moving-sum across partition boundaries") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (1L, i, i * 10L, (i % 13).toDouble)) ++
      (0L until 5L).map(i => (7L, 1000L + i, i * 10L, i * 1.5))
    val df = rows.toDF("user_id", "event_id", "ts_ns", "value")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").asc, col("event_id").asc)
    val want = df.select(
        col("event_id"), col("user_id"),
        row_number().over(w).cast("long").as("rn"),
        round(lag("value", 1).over(w), 2).as("prev_value"),
        round(sum("value").over(w.rowsBetween(-2, 0)), 2).as("moving_sum3"))
      .orderBy("user_id", "rn").collect().toSeq
    val got = EventWindows.rowNumberLag(df)
      .orderBy("user_id", "rn").collect().toSeq
    assert(got == want)
  }

  test("intervalOverlapPairs: boundary touch, multi-bin dedup, same-bin miss") {
    import spark.implicits._
    val h = 3600L // seconds per bucket at the default bucketUs
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val iv = Seq(
      // A spans 3 buckets; B overlaps A only in the middle bucket —
      // the pair must appear ONCE despite sharing 2 bins
      ("A", ts(0), ts(3 * h - 1)),
      ("B", ts(h), ts(2 * h + 10)),
      // C touches A exactly at A's end instant (closed intervals meet)
      ("C", ts(3 * h - 1), ts(4 * h)),
      // D shares a bin with C but misses it by one second
      ("D", ts(4 * h + 1), ts(4 * h + 2)),
      // E is far away entirely
      ("E", ts(10 * h), ts(10 * h + 5))).toDF("iv_key", "s", "e")
    val got = EventWindows.intervalOverlapPairs(iv)
      .as[(String, String)].collect().toSet
    assert(got == Set(("A", "B"), ("A", "C")))
  }

  test("gapFillDaily: hand fixture — gaps carry, user boundaries don't leak") {
    import spark.implicits._
    def ts(day: Int, hour: Int) =
      new java.sql.Timestamp((day * 86400L + hour * 3600L) * 1000L)
    // user 1: days 10 and 13 (2 events on 10) — days 11/12 must carry
    // n=2; user 2: single day 11 with 1 event. User 2's first grid day
    // must NOT inherit user 1's carry.
    val ev = Seq(
      (1L, ts(10, 1)), (1L, ts(10, 5)), (1L, ts(13, 2)),
      (2L, ts(11, 3))).toDF("user_id", "ts")
    val got = EventWindows.gapFillDaily(ev)
      .select(col("user_id"), datediff(col("day"),
        lit("1970-01-01").cast("date")).as("d"), col("n_filled"),
        col("is_observed"))
      .orderBy("user_id", "d")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      (1L, 10, 2L, true), (1L, 11, 2L, false), (1L, 12, 2L, false),
      (1L, 13, 1L, true), (2L, 11, 1L, true)))
  }

  test("gapFillDaily: a packing-bound violation fails loud, never corrupts") {
    import spark.implicits._
    // user_id ≥ 2^25 would silently overflow into the carry's user
    // field — the assert must surface instead
    val ev = Seq((40000000L, new java.sql.Timestamp(86400L * 1000L)))
      .toDF("user_id", "ts")
    val e = intercept[Throwable] {
      EventWindows.gapFillDaily(ev).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("packing bounds")), msgs(e).mkString("|"))
  }

  test("gapFillDaily equals the per-user window formulation on the fixture") {
    val daily = events.groupBy(col("user_id").cast("long").as("user_id"),
        col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = grid.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day").cast("timestamp").as("day"),
        last("n", ignoreNulls = true).over(w).as("n_filled"),
        col("n").isNotNull.as("is_observed"))
      .orderBy("user_id", "day").collect().toSeq
    val got = EventWindows.gapFillDaily(events)
      .orderBy("user_id", "day").collect().toSeq
    assert(got.nonEmpty && got == want)
  }
}
