package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed EXTERNAL tables — Spark's native co-located-join layout.
  *
  * A table written with `bucketBy(n, key)` carries its partitioning in
  * catalog metadata: every file name encodes its bucket id, and a scan
  * reports `HashPartitioning(key, n)` to the planner. Two tables bucketed
  * on their join key with the same bucket count therefore sort-merge-join
  * with NO shuffle on either side — the join is pre-co-located on disk.
  * At the 100 TB design point this is the difference between a fact⋈fact
  * join that moves both tables across the cluster every run and one that
  * moves nothing: the shuffle is paid ONCE at write time (and amortized
  * over every subsequent join), which is the standard warehouse layout
  * for repeatedly-joined big tables (the same trade the year-partitioned
  * fact makes for time predicates, applied to join keys).
  *
  * Tables are memoized per (session, key): the write happens once per
  * JVM — the production shape, where bucketed tables are standing layout,
  * not per-query scratch. `sortBy` on the bucket column additionally
  * orders each bucket file so a sort-merge join can skip its sort when
  * each bucket lands in one file.
  */
object Bucketed {
  // Memoizing holder, same pattern as [[Frames.shared]]: the CHM mapping
  // function only allocates the holder, and the (minutes-long at scale)
  // bucketed WRITE runs under the holder's lazy-val monitor, outside the
  // CHM bin lock. Running the write inside computeIfAbsent had two
  // hazards: any future build that re-enters Bucketed.table throws
  // "Recursive update", and unrelated keys hashing to the same bin block
  // for the duration of the write.
  private final class Holder(make: () => String) { lazy val name: String = make() }
  private val built = new ConcurrentHashMap[(SparkSession, String), Holder]()

  // Temp dirs backing the catalog tables, deleted recursively at JVM exit
  // (File.deleteOnExit can't remove non-empty dirs). The tables are
  // per-JVM scratch — the in-memory catalog dies with the session — so
  // leaving their data behind would just leak /tmp across runs.
  private val tempDirs = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[java.nio.file.Path, java.lang.Boolean]())
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    tempDirs.forEach { dir =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }
    }))

  /** Ensure a bucketed table for `df` exists under `key`; returns the
    * catalog table name (read it back with `spark.table(name)`). The
    * memo key must encode the data dir and projection parameters.
    */
  def table(spark: SparkSession, key: String, nBuckets: Int,
      bucketCol: String)(df: => DataFrame): String = {
    built.keySet.removeIf(_._1.sparkContext.isStopped)
    built.computeIfAbsent((spark, key), _ => new Holder(() => {
      val name = "bkt_" + java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      if (!spark.catalog.tableExists(name)) {
        val dir = java.nio.file.Files.createTempDirectory(s"graft_$name")
        tempDirs.add(dir)
        df.write.mode("overwrite")
          .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
          .option("path", dir.toString)
          .saveAsTable(name)
      }
      name
    })).name
  }
}
