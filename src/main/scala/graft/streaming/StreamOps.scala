package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` table (SURVEY
  * §2.D: the harness reintroduces event-time processing that the
  * reference's message-driven micro-batch ingestion lacks, §2.A
  * A1/A11).
  *
  * [[hourlyCountsStreaming]] runs a REAL streaming query — parquet
  * file source → event-time tumbling window + watermark → memory
  * sink — to completion with `processAllAvailable`, then returns the
  * result for the correctness gate. Complete output mode keeps the
  * final answer independent of file→micro-batch slicing (append mode
  * would make emitted-window timing depend on watermark advancement
  * across nondeterministic batch boundaries).
  *
  * At scale the same plan runs unbounded: swap the sink for
  * kafka/delta, keep the watermark for state GC; the aggregation
  * state store is keyed by (window, event_type), so state size is
  * bounded by active windows, not stream length.
  */
object StreamOps {

  /** micros timestamp view of events for streaming (nanos → micros,
    * same rule as [[graft.core.Tables]])
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the harness table is a single parquet FILE; the streaming file
    // source wants a directory, so scan the SF dir with a glob filter
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def hourlyCountsStreaming(spark: SparkSession, dir: String): DataFrame = {
    val counts = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val name = s"st_hourly_${System.nanoTime()}"
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Streaming exact deduplication: drop duplicate (user_id,
    * event_type) pairs across the stream — state store keyed by the
    * pair, the canonical streaming-dedup shape (at unbounded scale,
    * `dropDuplicatesWithinWatermark` bounds the state by event time) —
    * then count distinct users per event type. The answer is
    * independent of arrival order and micro-batch slicing, so it is
    * batch-checkable.
    */
  def streamDedupCounts(spark: SparkSession, dir: String): DataFrame = {
    val dedup = eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val name = s"st_dedup_${System.nanoTime()}"
    val q = dedup.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Batch `session_window` sessionization (30-min inactivity gap):
    * identical semantics in batch and streaming — the streaming
    * variant only adds a watermark. Session start = first event,
    * session end = last event + gap (Spark session_window contract).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))
}
