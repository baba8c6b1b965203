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
  private val buf =
    scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.QueryExecution]
  private[graft] def clear(): Unit = buf.synchronized { buf.clear() }
  /** Executed-plan strings of every seal since the last clear(). */
  private[graft] def plans(): Seq[String] =
    buf.synchronized { buf.toVector }.map(_.executedPlan.toString)
  private[ext] def add(
      qe: org.apache.spark.sql.execution.QueryExecution): Unit =
    if (enabled) buf.synchronized { buf += qe }
}
