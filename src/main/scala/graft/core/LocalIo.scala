package graft.core

import org.apache.spark.sql.SparkSession

/** Session configs that route local-mode file I/O away from Hadoop's
  * forking permission paths (see [[graft.hadoop.BareLocalFileSystem]]
  * and [[graft.streaming.NioCheckpointFileManager]] for the why).
  * Applied by every graft-owned session builder (Bench, Verify,
  * tests); a production cluster session would keep the defaults for
  * HDFS/S3 and never hit the local-permission code at all.
  */
object LocalIo {
  val configs: Seq[(String, String)] = Seq(
    "spark.hadoop.fs.file.impl" -> "graft.hadoop.BareLocalFileSystem",
    "spark.sql.streaming.checkpointFileManagerClass" ->
      "graft.streaming.NioCheckpointFileManager",
    // Every graft session reads the TIMESTAMP_NTZ event data under the
    // UTC invariant core.Tables documents — pin it here so diagnostic
    // mains can't drift from Verify/Bench/tests on a non-UTC host.
    "spark.sql.session.timeZone" -> "UTC",
    // r18 (optimization guide §2.2/§2.5): AQE's coalescing floor is
    // BYTE-based (default 1 MB) — a shuffle totalling a few hundred KB
    // coalesces to ONE post-shuffle partition even when the stage it
    // feeds has massive compute-per-byte fan-out (pair self-joins,
    // candidate verifies, per-round graph joins), serializing it on a
    // single core while the rest idle (measured: the interval-overlap
    // pair join ran 3.8 s in one task; 0.25 s across 32). A 16 KB
    // floor keeps `parallelismFirst` meaningful for KB-scale shuffles
    // while remaining invisible at cluster scale, where partitions are
    // advisory-sized (64 MB+) long before the floor binds. Scale-
    // adaptive by construction: task count still tracks bytes/16 KB
    // and is capped by spark.sql.shuffle.partitions (= the session's
    // core budget), so the driver's lower-core bench runs coalesce
    // proportionally. Env-overridable (SPARK_GRAFT_AQE_MIN_PART) so a
    // deployment — or an A/B measurement — can retune without a code
    // edit; Spark's own default is "1mb".
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PART", "16kb"))

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    configs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
