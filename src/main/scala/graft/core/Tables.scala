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
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively; it is surfaced as BOTH `ts_ns` (exact
    * epoch-nanos long — the deterministic sort key) and `ts`
    * (microsecond timestamp for window/date functions).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer `div`, NOT `/`: float division of epoch-nanos longs
      // (~1.7e18) loses the low microsecond digit in double precision
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
