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
  // One memoizing holder per key. The CHM mapping function only ALLOCATES
  // the holder (trivial, never re-enters the map — safe even though shared
  // frames nest: the cluster-label frame builds from the signature frame,
  // which would throw "Recursive update" if the build itself ran inside
  // computeIfAbsent). The build runs at most once, under the holder's own
  // monitor (Scala lazy val), outside the CHM bin lock. This closes the
  // race the previous get-then-putIfAbsent pattern had: two concurrent
  // builders of the SAME key produced two plan-identical frames, the
  // loser's persist() was a CacheManager no-op but its unpersist() evicted
  // the winner's entry — leaving the shared frame silently uncached for
  // the whole session (and, for eager builds that run actions while
  // iterating, duplicating the full build). With the holder, the loser
  // just blocks on the lazy and adopts the winner's frame.
  private final class Holder(build: () => DataFrame) {
    @volatile private var persisted: DataFrame = null
    @volatile var lastUsed: Long = 0L
    lazy val frame: DataFrame = {
      val f = build().persist(StorageLevel.MEMORY_AND_DISK)
      persisted = f
      f
    }
    /** Unpersist only if the build actually completed (a holder whose
      * build threw, or is still in flight on another thread, has nothing
      * cached to release).
      */
    def release(): Unit = {
      val f = persisted
      if (f != null) f.unpersist()
    }
    /** Evictable = the build finished (an in-flight holder has no blocks
      * to free, and removing it would leak the blocks it is about to
      * persist — its builder thread keeps a reference and nobody would
      * release it).
      */
    def completed: Boolean = persisted != null
  }
  private val frames = new ConcurrentHashMap[(SparkSession, String), Holder]()
  private val ticks = new java.util.concurrent.atomic.AtomicLong()

  /** LRU cap on shared frames PER SESSION. A long-lived session cycling
    * through many data dirs (the 100-TB shape: one signature store per
    * corpus snapshot) must not pin every retired dir's MEMORY_AND_DISK
    * blocks forever — beyond the cap, the least-recently-USED completed
    * frame is unpersisted and forgotten. Eviction is safe mid-consumer:
    * unpersist never breaks a running plan (Spark recomputes evicted
    * blocks from lineage); it only costs the recompute. The default is
    * sized for the bench catalog (~20 shared frames per dir, 2 dirs hot);
    * override via -Dgraft.frames.maxShared=N.
    */
  private def maxShared: Int =
    Integer.getInteger("graft.frames.maxShared", 64).intValue()

  def shared(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    sharedWithCap(spark, key, maxShared)(build)

  /** [[shared]] with an explicit LRU cap — the test surface: specs
    * exercise eviction at a tiny cap WITHOUT mutating the global
    * `graft.frames.maxShared` property (which parallel-running suites
    * would observe, nondeterministically evicting each other's frames).
    */
  private[graft] def sharedWithCap(spark: SparkSession, key: String,
      cap: Int)(build: => DataFrame): DataFrame = {
    // Stopped-session entries are only dropped, not unpersist()ed: their
    // cached blocks died with the context, and calling unpersist through a
    // stopped session throws — removal here is garbage collection, the
    // symmetric release path for a LIVE session is [[drop]]/[[clear]].
    frames.keySet.removeIf(_._1.sparkContext.isStopped)
    val h = frames.computeIfAbsent((spark, key), _ => new Holder(() => build))
    h.lastUsed = ticks.incrementAndGet()
    val f = h.frame
    evictBeyondCap(spark, keep = key, cap = cap)
    f
  }

  /** A shared frame whose BYTES also live in [[BuildCache]] (cross-JVM
    * reuse): the first JVM at a given (code digest, dir) computes the
    * frame and publishes parquet; later JVMs — each bench pass and the
    * driver's round run on whatever host window it lands — persist-READ
    * it. `extraPrefixes` must cover every class that computes the
    * frame's CONTENT, so a code edit rebuilds instead of serving stale
    * bytes. (This helper itself is NOT digest-covered — it only
    * orchestrates publish/read; do not move content-shaping logic in
    * here.)
    */
  def sharedParquet(spark: SparkSession, kind: String, d: String,
      spec: String, extraPrefixes: Seq[String])(
      build: => DataFrame): DataFrame =
    shared(spark, s"$kind:$d") {
      val dir = BuildCache.dir(kind, d, spec, extraPrefixes) {
        p => build.write.parquet(p)
      }
      spark.read.parquet(dir)
    }

  /** Evict least-recently-used COMPLETED frames of `spark` until the
    * session is back under `cap`. `keep` (the key just served) is
    * never evicted. Races with a concurrent `shared` touch are benign:
    * worst case a just-touched frame is evicted and recomputes once.
    */
  private def evictBeyondCap(spark: SparkSession, keep: String,
      cap: Int): Unit = {
    var done = false
    while (!done) {
      val mine = new java.util.ArrayList[(String, Holder)]()
      frames.forEach { (k, h) =>
        if ((k._1 eq spark) && k._2 != keep && h.completed)
          mine.add((k._2, h))
      }
      // sessionSize counts every entry (in-flight too) — the cap bounds
      // the map, evictability only gates WHICH entries can go
      var sessionSize = 0
      frames.keySet.forEach(k => if (k._1 eq spark) sessionSize += 1)
      if (sessionSize <= cap || mine.isEmpty) done = true
      else {
        var oldest: (String, Holder) = null
        mine.forEach { e =>
          if (oldest == null || e._2.lastUsed < oldest._2.lastUsed) oldest = e
        }
        drop(spark, oldest._1)
      }
    }
  }

  /** Whether a shared frame is currently registered (test/introspection
    * surface for the LRU behavior).
    */
  def contains(spark: SparkSession, key: String): Boolean =
    frames.containsKey((spark, key))

  /** Unpersist and forget one shared frame (a dir's data was replaced, or
    * its query family is done). Entries are otherwise held for the
    * session's lifetime — fine for the bounded catalog usage here (a few
    * frames per data dir), but a long-lived session cycling through many
    * dirs should release retired ones explicitly.
    */
  def drop(spark: SparkSession, key: String): Unit = {
    val h = frames.remove((spark, key))
    if (h != null) h.release()
  }

  /** Unpersist and forget every shared frame of one session. */
  def clear(spark: SparkSession): Unit =
    frames.keySet.forEach { k =>
      if (k._1 eq spark) drop(spark, k._2)
    }
}
