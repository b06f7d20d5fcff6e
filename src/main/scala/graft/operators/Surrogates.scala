package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic surrogate key generation (reference BIGSERIAL, G1 —
  * bl_3nf.sql:44; NA member bl_3nf.sql:221-277).
  *
  * Keys are `row_number()` over the natural-key ordering plus the current
  * maximum — dense, collision-free, and stable across runs, unlike
  * `monotonically_increasing_id` (partition-dependent) or a driver-side
  * zip. The unpartitioned window funnels the *dimension* through one task;
  * dimensions are small by definition (SURVEY.md §4) — never use this on a
  * fact table.
  */
object Surrogates {

  /** Assign `keyCol` = offset + dense row number ordered by `orderBy`. */
  def assign(df: DataFrame, keyCol: String, orderBy: Seq[Column], offset: Long = 0L): DataFrame =
    df.withColumn(
      keyCol,
      (row_number().over(Window.orderBy(orderBy: _*)).cast(LongType) + offset))

  /** Assign keys continuing after the max key already present in `existing`
    * (reference sequences never reuse ids).
    */
  def assignAfter(existing: DataFrame, incoming: DataFrame, keyCol: String,
      orderBy: Seq[Column]): DataFrame = {
    val maxRow = existing.agg(max(col(keyCol)).cast(LongType)).head()
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    assign(incoming, keyCol, orderBy, maxId)
  }
}
