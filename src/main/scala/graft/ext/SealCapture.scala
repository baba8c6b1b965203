package graft.ext

/** Test hook: pre-seal finalized QueryExecutions recorded by
  * [[Ranks.seal]]. PlanQualitySpec enables capture around a gate
  * build so its plan-shape contracts (broadcast joins, partial
  * window-group-limits, no-cartesian pins) keep asserting the REAL
  * join/aggregate shapes of operators whose results are sealed by a
  * terminal localCheckpoint — without it the executed plan of the
  * returned frame is a bare `Scan ExistingRDD` and every assertion
  * is vacuous (the r18 verdict's PlanQualitySpec breakage). Disabled
  * (one volatile read per terminal seal) outside tests.
  */
object SealCapture {
  @volatile private[graft] var enabled = false
  // Per-THREAD buffer: suites share one session and run in parallel,
  // and a gate's seals all happen synchronously on the thread that
  // constructs it — a global buffer would let one suite's seals leak
  // into another's plan assertions.
  private val buf = new ThreadLocal[
      scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.execution.QueryExecution]] {
    override def initialValue() =
      scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.execution.QueryExecution]
  }
  private[graft] def clear(): Unit = buf.get().clear()
  /** Executed-plan strings of every seal on THIS thread since clear(). */
  private[graft] def plans(): Seq[String] =
    buf.get().toVector.map(_.executedPlan.toString)
  private[ext] def add(
      qe: org.apache.spark.sql.execution.QueryExecution): Unit =
    if (enabled) buf.get() += qe
}
