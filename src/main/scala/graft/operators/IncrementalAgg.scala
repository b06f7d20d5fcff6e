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

  /** Aggregate a CHANGE batch into signed state rows: rows whose `opCol`
    * is 'D' contribute −1 to the count and −value to every sum, anything
    * else +1/+value — so deletes are RETRACTIONS, not a re-scan trigger.
    * The result merges through [[mergeRetract]] exactly like an
    * insert-only delta: at 100 TB a correction batch (late data, GDPR
    * erasure, a bad upstream day re-issued) costs one delta-sized
    * aggregate, where the naive path re-aggregates the whole history
    * because "sum minus the bad rows" isn't expressible without state.
    * Exactness: counts and DECIMAL sums are distributive GROUPS (have
    * inverses), so retract-then-present is bit-equal to recomputing from
    * the surviving rows — the c8 oracle asserts that equality.
    */
  def fromChanges(batch: DataFrame, keys: Seq[String], sumCols: Seq[String],
      opCol: String): DataFrame = {
    val sign = when(col(opCol) === "D", lit(-1)).otherwise(lit(1))
    batch.groupBy(keys.map(col): _*)
      .agg(
        sum(sign).cast("long").as("n"),
        // cast BEFORE negating so a delete retracts bit-exactly what the
        // insert path accumulated (same double→decimal rounding point)
        sumCols.map(c =>
          sum(col(c).cast(State) * sign).cast(State).as(s"sum_$c")): _*)
  }

  /** [[merge]] plus retraction cleanup: groups whose count reaches zero
    * are REMOVED (a recompute over the surviving rows has no row for
    * them, and a lingering zero-group would present phantom 0.0 sums and
    * pin state forever). PRECONDITION: deletes must retract rows that
    * were actually inserted — a negative count means the feed is corrupt,
    * and this filter would silently hide it, so validate upstream
    * (QualityChecks) when the source isn't trusted.
    */
  def mergeRetract(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    merge(state, delta, keys, sumCols).filter(col("n") =!= 0)

  /** Consumer view of the state: counts as BIGINT, sums as DOUBLE. */
  def present(state: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++
        (col("n") +: sumCols.map(c => col(s"sum_$c").cast("double").as(s"sum_$c"))): _*)
}
