package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for distributive aggregates: keep a
  * per-group STATE table (count + decimal sums) and fold each new batch
  * into it, instead of re-aggregating the whole history every refresh.
  * At 100 TB this is the difference between a refresh that shuffles the
  * full fact table and one that shuffles only the day's delta: both
  * `fromBatch` and `merge` are single hash aggregates over their (small)
  * input, and the merge output replaces the state atomically.
  *
  * Sums accumulate in DECIMAL(38,4), not double — merge must be exact and
  * order-independent, or N incremental refreshes drift from the one-shot
  * answer (see the c7_delta_agg oracle, which asserts bit-equality). State
  * stays at the full 38-digit width across merges (a running sum over a
  * 100 TB fact easily exceeds DECIMAL(18,4)'s 14 integer digits, and under
  * ANSI mode a narrowing cast on merge would throw mid-refresh); only
  * `present` narrows, rendering the state for consumers (BIGINT count,
  * DOUBLE sums).
  */
object IncrementalAgg {

  private val State = DecimalType(38, 4)

  /** Aggregate one batch into state rows: (keys*, n, sum_<c>*). */
  def fromBatch(batch: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        // merge's cast is the schema pin; sum over DECIMAL(38,4) already
        // yields DECIMAL(38,4) here (p+10 caps at 38), so no outer cast
        sumCols.map(c => sum(col(c).cast(State)).as(s"sum_$c")): _*)

  /** Fold a batch's state into the existing state: same schema in and out,
    * one hash aggregate over state ∪ delta. The cast back to DECIMAL(38,4)
    * is width-preserving (Spark caps sum-over-decimal at 38 digits), so it
    * never narrows — it only pins the state schema.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).cast("long").as("n"),
        sumCols.map(c => sum(col(s"sum_$c")).cast(State).as(s"sum_$c")): _*)

  /** Consumer view of the state: counts as BIGINT, sums as DOUBLE. */
  def present(state: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++
        (col("n") +: sumCols.map(c => col(s"sum_$c").cast("double").as(s"sum_$c"))): _*)
}
