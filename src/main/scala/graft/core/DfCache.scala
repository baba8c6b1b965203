package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache for shared intermediate DataFrames (the quads
  * view, the OWL-Horst materialization, minhash pair sets, predicate
  * stats). Mirrors the reference's load-time artifacts: computed once
  * per (session, dataset), reused by every query.
  *
  * Keys are `applicationId:sessionUUID:dir:name` — a stable unique
  * session identity, not `SparkSession.hashCode` (which can collide
  * across sessions and outlives stopped ones). Entries are evicted
  * when their application ends, so stopped-session DataFrames never
  * leak or get handed to a different session.
  */
object DfCache {

  private val entries = new ConcurrentHashMap[String, AnyRef]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  // Reference-identity-keyed session UUIDs: two distinct live sessions
  // can never share a key (unlike hashCode), and dead sessions are
  // GC'd out of the weak map.
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  private def sessionKey(s: SparkSession): String = {
    val uuid = sessionIds.computeIfAbsent(
      s, _ => java.util.UUID.randomUUID().toString)
    s.sparkContext.applicationId + ":" + uuid
  }

  /** Drop every cached entry belonging to `appId` once its context
    * ends — the backing blocks die with the executors, so the
    * DataFrames are unusable anyway.
    */
  private def hookEviction(s: SparkSession): Unit = {
    val app = s.sparkContext.applicationId
    if (hooked.add(app)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          hooked.remove(app)
          val it = entries.keySet.iterator
          while (it.hasNext) if (it.next().startsWith(app + ":")) it.remove()
        }
      })
    }
  }

  /** Compute-once persisted DataFrame shared across queries of one
    * session+dataset. `persist=false` for inputs that are already
    * materialized leaves (e.g. localCheckpoint results).
    */
  def df(s: SparkSession, dir: String, name: String, persist: Boolean = true)(
      f: => DataFrame): DataFrame = {
    hookEviction(s)
    entries.computeIfAbsent(sessionKey(s) + ":" + dir + ":" + name, _ => {
      val d = f
      val out = if (persist) d.persist(StorageLevel.MEMORY_AND_DISK) else d
      out.count()
      out
    }).asInstanceOf[DataFrame]
  }

  /** Compute-once plain value (e.g. collected statistics). */
  def value[T <: AnyRef](s: SparkSession, dir: String, name: String)(f: => T): T = {
    hookEviction(s)
    entries.computeIfAbsent(sessionKey(s) + ":" + dir + ":" + name, _ => f)
      .asInstanceOf[T]
  }
}
