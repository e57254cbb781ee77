package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Persist-once DataFrame cache with an sfDir-scoped LIFECYCLE: one
  * shared implementation for the CF and dedup intermediate chains.
  *
  * Motivation for caching at all: Catalyst does not deduplicate
  * repeated logical subtrees, so a shared intermediate (normalized
  * ratings, the shingle inverted index) would otherwise recompute per
  * referencing subtree — up to 6× within ONE plan. Values are
  * decimal-exact, so caching cannot change bytes. MEMORY_AND_DISK:
  * at cluster scale the intermediate may exceed executor memory —
  * spill, don't OOM.
  *
  * Lifecycle: entries are keyed by (application|sfDir) scope. When a
  * build for a NEW scope arrives, every entry belonging to a
  * DIFFERENT scope is evicted and unpersisted — a long-lived session
  * sweeping many scale-factor directories holds at most ONE scale
  * factor's intermediates in executor storage instead of accumulating
  * all of them forever (the harness never interleaves sfDirs, so
  * eviction never thrashes; an interleaving caller just re-persists,
  * which is correct, only slower). Unpersist is non-blocking: block
  * eviction on nothing, let the executors free storage asynchronously. */
final class DfCache {
  private val m =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String)(
      build: => DataFrame): DataFrame = {
    val scope = s"${spark.sparkContext.applicationId}|$sfDir"
    m.keys.filter(_._1 != scope).foreach { k =>
      m.remove(k).foreach(_.unpersist(blocking = false))
    }
    m.getOrElseUpdate((scope, name),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Test hook: the live (scope, name) keys and their DataFrames. */
  private[graft] def snapshot: Map[(String, String), DataFrame] = m.toMap
}
