package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided deterministic parquet tables
  * (`TESTDATA.md`): TPC-H-ish star schema + `events`/`documents`/
  * `embeddings` extension tables. All queries take the scale-factor
  * directory as a parameter so the same code runs sf0.001 → 100 TB.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  /** Plain columnar scan. Filters/projections push down to parquet.
    *
    * `events.ts` varies by harness generation: parquet TIMESTAMP(NANOS)
    * (which Spark 4 only reads as a long via the legacy conf) or a
    * plain microsecond TIMESTAMP / TIMESTAMP_NTZ. Whatever the file
    * carries, the view surfaces BOTH `ts_ns` (exact epoch-nanos long —
    * the deterministic sort key) and `ts` (session-zoned microsecond
    * timestamp for window/date functions). Every graft session runs
    * with session timeZone UTC, so the NTZ wall-clock reading matches
    * the oracle's naive-timestamp epoch arithmetic exactly.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer `div`, NOT `/`: float division of epoch-nanos longs
          // (~1.7e18) loses the low microsecond digit in double precision
          raw.withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _: org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
            .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        case _: org.apache.spark.sql.types.TimestampType =>
          raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        case other => throw new IllegalStateException(
          s"unsupported events.ts parquet type: $other")
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
