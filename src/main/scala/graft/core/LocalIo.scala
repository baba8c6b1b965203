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
    "spark.sql.session.timeZone" -> "UTC")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    configs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
