package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the harness test tables (TESTDATA.md).
  *
  * Every query goes through here so scans share one definition; reads are
  * plain parquet scans, which lets Catalyst push filters and prune columns
  * down to the file scan (check `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized base plans per (session, dir, table) — the harness tables
    * are immutable, but `spark.read.parquet` re-lists the directory and
    * re-reads footers for schema on EVERY call, and the catalog's queries
    * each read several tables: across a 110-query run that is hundreds of
    * redundant metadata reads. A real catalog caches table metadata;
    * this map is that cache. (Mutable layer tables — TableStore — are
    * deliberately NOT cached: they change between writes.)
    */
  private val plans =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    plans.computeIfAbsent(
      (System.identityHashCode(spark), sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The events table carries a nanosecond INT64 parquet timestamp, which
    * Spark only reads as a long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set in every session here). Normalize `ts` back to a microsecond
    * TimestampType (floor division — matches an ANSI CAST to TIMESTAMP).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Re-spread a plan whose partition count is below the session's default
    * parallelism, for use directly under compute-heavy per-row work
    * (shingling, per-position hashing, vector explodes).
    *
    * Why conditional: parquet can't split inside a row group, so a corpus
    * that arrives as a handful of small files runs ALL downstream per-row
    * compute in a handful of tasks — measured on this harness as the whole
    * dedup block serializing into one task of a 32-thread session (the
    * 594 KB documents file is one row group). Few splits also means few
    * bytes, so the corrective shuffle is cheap by construction. At
    * production scale the scan has orders of magnitude more splits than
    * cores and this is the identity — no shuffle is ever added to a big
    * input. Apply it AFTER source filters so pushdown still reaches the
    * scan.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
