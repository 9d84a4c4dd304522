package graft.core

import java.util.WeakHashMap

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-JVM memo for shared-stage artifacts that are BOUND to a
  * SparkSession — cached DataFrames (especially lazily-materialized
  * `localCheckpoint` handles) hold RDD lineage owned by the session and
  * executors that created them, so a second SparkSession in the same JVM
  * must rebuild rather than receive a dead or stale handle. Keying by
  * session IDENTITY (a WeakHashMap keyed on the session object — exact,
  * collision-proof, unlike an identityHashCode int which two sessions can
  * share; ADVICE r9) makes the cache self-evicting on session turnover:
  * a stopped session's map becomes unreachable with the session and is
  * collected, so dead-session entries cannot accumulate or be handed out.
  *
  * Plain-value caches (fitted weights, merge tables, offsets) are NOT
  * session-bound and stay keyed by corpus alone.
  */
final class SessionCache[V] {
  // WeakHashMap: reference-identity keys (SparkSession doesn't override
  // equals), weakly held so entries die with their session
  private val perSession = new WeakHashMap[SparkSession, TrieMap[String, V]]

  def getOrElseUpdate(s: SparkSession, key: String, build: => V): V = {
    val m = perSession.synchronized {
      var inner = perSession.get(s)
      if (inner == null) { inner = TrieMap.empty[String, V]; perSession.put(s, inner) }
      inner
    }
    m.getOrElseUpdate(key, build)
  }
}
