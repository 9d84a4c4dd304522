package graft.core

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Per-JVM memo for shared-stage artifacts that are BOUND to a
  * SparkSession — cached DataFrames (especially lazily-materialized
  * `localCheckpoint` handles) hold RDD lineage owned by the session and
  * executors that created them, so a second SparkSession in the same JVM
  * must rebuild rather than receive a dead or stale handle. Keying by
  * (session identity, logical key) makes the cache self-evicting on
  * session turnover: entries of a stopped session are simply never hit
  * again (bounded garbage — a handful of plan handles, no row data on
  * the driver).
  *
  * Plain-value caches (fitted weights, merge tables, offsets) are NOT
  * session-bound and stay keyed by corpus alone.
  */
final class SessionCache[V] {
  private val m = TrieMap.empty[(Int, String), V]

  def getOrElseUpdate(s: SparkSession, key: String, build: => V): V =
    m.getOrElseUpdate((System.identityHashCode(s), key), build)
}
