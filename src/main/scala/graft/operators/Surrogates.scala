package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic surrogate key generation (reference BIGSERIAL, G1 —
  * bl_3nf.sql:44; NA member bl_3nf.sql:221-277).
  *
  * Keys are dense global ranks over the natural-key ordering plus an
  * offset — collision-free and stable across runs, unlike
  * `monotonically_increasing_id` (partition-dependent) or a driver-side
  * collect-and-zip. Two implementations, one contract:
  *
  *  - [[assign]]: `row_number()` over an unpartitioned window. One-task
  *    sort — only for dimension-sized inputs (SURVEY.md §4 notes dims are
  *    kilo-row by definition).
  *  - [[assignScalable]]: global sort + `zipWithIndex` — the sort is a
  *    distributed range shuffle and the index job runs over the *same*
  *    partitioned RDD instance, so partition boundaries (and therefore
  *    every key) are consistent and deterministic. Use for anything that
  *    might be fact-sized.
  *
  * `orderBy` should be a unique key (natural keys are) so the global order
  * — and every assigned key — is well-defined run to run.
  */
object Surrogates {

  /** Assign `keyCol` = offset + row_number ordered by `orderBy` (small
    * dimensions only: single-task window sort).
    */
  def assign(df: DataFrame, keyCol: String, orderBy: Seq[Column], offset: Long = 0L): DataFrame =
    df.withColumn(
      keyCol,
      (row_number().over(Window.orderBy(orderBy: _*)).cast(LongType) + offset))

  /** As [[assign]] but cluster-scalable: distributed range-partitioned
    * sort, then a per-partition index with cumulative offsets
    * (`zipWithIndex` — one lightweight count job, no single-task stage).
    */
  def assignScalable(df: DataFrame, keyCol: String, orderBy: Seq[Column],
      offset: Long = 0L): DataFrame = {
    val sorted = df.orderBy(orderBy: _*)
    val schema = sorted.schema.add(keyCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** Assign keys continuing after the max key already present in `existing`
    * (reference sequences never reuse ids).
    */
  def assignAfter(existing: DataFrame, incoming: DataFrame, keyCol: String,
      orderBy: Seq[Column]): DataFrame =
    assign(incoming, keyCol, orderBy, maxKey(existing, keyCol))

  /** As [[assignAfter]] but via the cluster-scalable [[assignScalable]] —
    * for incremental loads of a dimension that might be fact-sized (the
    * reference's degenerate order dim).
    */
  def assignScalableAfter(existing: DataFrame, incoming: DataFrame,
      keyCol: String, orderBy: Seq[Column]): DataFrame =
    assignScalable(incoming, keyCol, orderBy, maxKey(existing, keyCol))

  /** SQL NTILE(buckets) without the single-task global window the naive
    * `ntile().over(Window.orderBy(...))` plans: global rank via
    * [[assignScalable]] (range shuffle + per-partition index), bucket via
    * the exact NTILE size formula — the first `n % buckets` buckets get
    * `n/buckets + 1` rows, the rest `n/buckets` — computed from the rank
    * with integer arithmetic. One extra count job for the scalar `n`;
    * output matches the window function row for row (ties must be broken
    * by `orderBy`, so make it a total order).
    */
  def ntileScalable(df: DataFrame, buckets: Int, orderBy: Seq[Column],
      out: String = "ntile"): DataFrame = {
    val n = df.count()
    val base = n / buckets
    val rem = n % buckets
    val cut = rem * (base + 1)
    assignScalable(df, "__rank", orderBy)
      .withColumn(out,
        when(lit(base) === 0 || col("__rank") <= cut,
          expr(s"(__rank + $base) DIV ${base + 1}"))
          .otherwise(lit(rem) + expr(s"(__rank - $cut + $base - 1) DIV $base"))
          .cast(LongType))
      .drop("__rank")
  }

  private def maxKey(existing: DataFrame, keyCol: String): Long = {
    val maxRow = existing.agg(max(col(keyCol)).cast(LongType)).head()
    if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
  }
}
