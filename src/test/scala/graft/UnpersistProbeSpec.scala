package graft

/** Pins the checkpoint-release mechanics the engine's memory
  * discipline rides on (r16 review finding): on this Spark build,
  * `Dataset.unpersist` does NOT release a localCheckpoint's blocks
  * (it only uncaches CacheManager-registered plans) — the LogicalRDD
  * leaf's own `rdd.unpersist` ([[graft.ext.Ranks.sealLeavesRelease]])
  * is the mechanism that actually frees them. If a Spark upgrade ever
  * changes either half, this spec flags it so the release discipline
  * can be revisited.
  */
class UnpersistProbeSpec extends GraftSuite {
  test("Dataset.unpersist is a no-op for localCheckpoint blocks; " +
      "sealLeavesRelease frees them") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Seq(1, 2, 3).toDF("v").localCheckpoint()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint must register a persistent RDD")
    df.unpersist(blocking = true)
    val afterNoop = spark.sparkContext.getPersistentRDDs.keySet
    assert((added -- afterNoop).isEmpty,
      "Dataset.unpersist RELEASED checkpoint blocks — the no-op " +
        "assumption changed with this Spark build; revisit every " +
        "sealLeavesRelease call site")
    graft.ext.Ranks.sealLeavesRelease(df)
    val afterReal = spark.sparkContext.getPersistentRDDs.keySet
    assert((added -- afterReal) == added,
      s"sealLeavesRelease failed to release: ${added.intersect(afterReal)}")
  }
}
