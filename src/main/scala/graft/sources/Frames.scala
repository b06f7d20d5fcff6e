package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Process-wide memo for derived DataFrames shared by several registered
  * queries — the analogue of [[Tables]]' plan memo, but for frames worth
  * PERSISTING because (a) multiple queries consume the identical frame and
  * (b) recomputing it repeats the expensive part of a whole query family
  * (e.g. the dedup block's shingle-explode + MinHash aggregate).
  *
  * Persisting also truncates lineage: a consumer's plan starts from the
  * cached blocks, so a transient host stall inside the shared stage can
  * hit at most the first query to touch it, not every consumer (r11 lost
  * `dedup_minhash_pairs` to exactly such a stall). This mirrors the
  * production shape — at 100 TB the signature store is persisted state
  * (a table), not something each consumer re-derives from raw text.
  *
  * Keyed on the SparkSession REFERENCE plus a caller-chosen string (which
  * must encode the data dir and any parameters). Entries bound to a
  * stopped session are evicted lazily, same as [[Tables]].
  */
object Frames {
  private val frames = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def shared(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    // Stopped-session entries are only dropped, not unpersist()ed: their
    // cached blocks died with the context, and calling unpersist through a
    // stopped session throws — removal here is garbage collection, the
    // symmetric release path for a LIVE session is [[drop]]/[[clear]].
    frames.keySet.removeIf(_._1.sparkContext.isStopped)
    // get-then-putIfAbsent, NOT computeIfAbsent: shared frames NEST (the
    // cluster-label frame builds from the signature frame), and a mapping
    // function that re-enters the same ConcurrentHashMap throws
    // "Recursive update" whenever the two keys land in one bin. The race
    // this opens is benign — a losing concurrent builder unpersists its
    // (lazy, never-materialized) duplicate and adopts the winner's.
    val k = (spark, key)
    val existing = frames.get(k)
    if (existing != null) existing
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = frames.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(); prev } else built
    }
  }

  /** Unpersist and forget one shared frame (a dir's data was replaced, or
    * its query family is done). Entries are otherwise held for the
    * session's lifetime — fine for the bounded catalog usage here (a few
    * frames per data dir), but a long-lived session cycling through many
    * dirs should release retired ones explicitly.
    */
  def drop(spark: SparkSession, key: String): Unit = {
    val df = frames.remove((spark, key))
    if (df != null) df.unpersist()
  }

  /** Unpersist and forget every shared frame of one session. */
  def clear(spark: SparkSession): Unit =
    frames.keySet.forEach { k =>
      if (k._1 eq spark) drop(spark, k._2)
    }
}
