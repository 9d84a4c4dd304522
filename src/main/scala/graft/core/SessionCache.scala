package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-JVM memo for shared-stage artifacts that are BOUND to a
  * SparkSession — cached DataFrames (especially lazily-materialized
  * `localCheckpoint` handles) hold RDD lineage owned by the session and
  * executors that created them, so a second SparkSession in the same JVM
  * must rebuild rather than receive a dead or stale handle.
  *
  * Keys compare by session IDENTITY (SparkSession doesn't override
  * equals — exact and collision-proof, unlike an identityHashCode int
  * which two sessions can share; ADVICE r9). Eviction is EXPLICIT, not
  * GC-driven: the r10 WeakHashMap variant could never self-evict because
  * every cached value (DataFrame, fitted index, TrieMap of handles)
  * strongly references its session key through QueryExecution —
  * WeakHashMap's documented value→key caveat (ADVICE r10). Instead each
  * access sweeps entries whose underlying SparkContext has stopped; a
  * handle bound to a stopped context is unusable anyway, so dead-session
  * state lives only until the next cache access of any kind.
  *
  * Plain-value caches (fitted weights, merge tables, offsets) are NOT
  * session-bound and stay keyed by corpus alone.
  */
final class SessionCache[V] {
  // ConcurrentHashMap with reference-equality keys in practice (no
  // equals override on SparkSession); values strongly held while the
  // session's context is alive, swept once it stops
  private val perSession =
    new ConcurrentHashMap[SparkSession, TrieMap[String, V]]

  private def sweepStopped(): Unit = {
    val it = perSession.keySet.iterator
    while (it.hasNext) {
      if (it.next().sparkContext.isStopped) it.remove()
    }
  }

  def getOrElseUpdate(s: SparkSession, key: String, build: => V): V = {
    sweepStopped()
    val m = perSession.computeIfAbsent(s, _ => TrieMap.empty[String, V])
    // cached artifacts OUTLIVE the query that builds them, so any
    // checkpoints created by `build` must be exempt from the caller's
    // Ckpt collection scope (a scope release would unpersist blocks the
    // cache hands to every later query — unrecomputable after the
    // lineage cut)
    m.getOrElseUpdate(key, Ckpt.retained(build))
  }
}
