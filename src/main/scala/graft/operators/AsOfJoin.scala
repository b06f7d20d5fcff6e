package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the latest right row of
  * the same key with `right.ts <= left.ts` — the point-in-time lookup
  * behind attribution ("which click preceded this purchase"), feature
  * snapshotting, and slowly-sampled sensor alignment.
  *
  * Spark has no ASOF JOIN operator, and the naive formulations both fail
  * at scale: a range-join (`l.k = r.k AND r.ts <= l.ts` + aggregate) is
  * O(matches) — quadratic for long histories — and a per-row correlated
  * lookup isn't distributed at all. This is instead the single-shuffle
  * union formulation: tag both sides, union them, and run one
  * `last(payload, ignoreNulls)` running window per key ordered by
  * (ts, side, payload) — right rows sort before left rows at equal
  * timestamps, so the match bound is inclusive, and the trailing payload
  * tiebreak makes the pick deterministic when one timestamp carries
  * several right rows. Cost is one hash shuffle of |L|+|R| rows plus a
  * per-key sort — the same plan shape Catalyst produces for any window
  * aggregate, AQE-splittable on skewed keys.
  *
  * Output: every left column, plus a nullable `asof` struct holding the
  * matched right row's non-key columns (null when no right row precedes).
  *
  * Equal-timestamp ties among right rows: pass `tiebreak` (a right-side
  * column, ideally a unique id) and the greatest tiebreak value wins —
  * deterministic and semantically chosen by the caller. Without it the
  * window falls back to ordering by the whole right payload struct, which
  * is deterministic but arbitrary ("max payload wins") and requires every
  * right column to be orderable (no MapType) — prefer the explicit
  * tiebreak whenever one timestamp can carry several right rows.
  */
object AsOfJoin {

  def asOfBackward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      tiebreak: Option[String] = None): DataFrame = {
    val lPay = left.columns.filter(c => c != key && c != leftTs)
    val rPay = right.columns.filterNot(_ == key)
    require(tiebreak.forall(rPay.contains),
      s"tiebreak must be a non-key right-side column; got $tiebreak")

    val rStruct = struct(rPay.map(col): _*)
    val lStruct = if (lPay.isEmpty) struct(lit(0).as("__empty")) else struct(lPay.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    val lu = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__is_l"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val ru = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__is_l"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // left rows carry a null tiebreak; they already sort after right rows
    // at equal ts via __is_l, so the null never affects the match set
    val tb = tiebreak.map(t => col(s"__r.$t")).getOrElse(col("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__is_l"), tb)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)

    val payloadCols = lPay.map(c => col(s"__l.$c").as(c))
    matched.select(
      (col("__k").as(key) +: col("__t").as(leftTs) +: payloadCols) :+
        col("__m").as("asof"): _*)
  }

  /** Forward as-of join: attach to each left row the EARLIEST right row of
    * the same key with `right.ts >= left.ts` — time-to-next-event lookups
    * ("how long until this click converts", time-to-restock, next
    * maintenance window). Same single-shuffle union formulation as
    * [[asOfBackward]], mirrored BY REVERSING THE SORT instead of the
    * frame: a `currentRow → unboundedFollowing` frame looks tempting but
    * Spark's WindowExec re-aggregates the remaining frame for every row
    * (UnboundedFollowingWindowFunctionFrame is O(rows²) per partition —
    * measured 18.9× work on 10× data in the hash-ring sampler that rides
    * this operator), while every RUNNING frame
    * (unboundedPreceding → currentRow) updates incrementally. So rows
    * sort by ts DESCENDING and each left row takes the LAST right row
    * seen so far (`last(payload, ignoreNulls)`, running frame) — the
    * nearest following right in ascending time, O(rows) per partition.
    * At equal timestamps right rows sort BEFORE left rows (so the bound
    * stays inclusive), and the LOWEST tiebreak value sorts LAST among
    * simultaneous right rows — the running `last` then yields it (the
    * first of several simultaneous right rows in forward order).
    */
  def asOfForward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      tiebreak: Option[String] = None): DataFrame = {
    val lPay = left.columns.filter(c => c != key && c != leftTs)
    val rPay = right.columns.filterNot(_ == key)
    require(tiebreak.forall(rPay.contains),
      s"tiebreak must be a non-key right-side column; got $tiebreak")

    val rStruct = struct(rPay.map(col): _*)
    val lStruct = if (lPay.isEmpty) struct(lit(0).as("__empty")) else struct(lPay.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lType = left.select(lStruct.as("l")).schema("l").dataType

    val lu = left.select(
      col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__is_l"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val ru = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__is_l"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // Descending time: __is_l ASC puts right (0) before left (1) at equal
    // ts — the running last() of a left row then already includes the
    // simultaneous right row (inclusive bound) — and the tiebreak sorts
    // DESC so the lowest value lands nearest the current row and wins.
    val tb = tiebreak.map(t => col(s"__r.$t")).getOrElse(col("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__is_l").asc, tb.desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)

    val payloadCols = lPay.map(c => col(s"__l.$c").as(c))
    matched.select(
      (col("__k").as(key) +: col("__t").as(leftTs) +: payloadCols) :+
        col("__m").as("asof"): _*)
  }
}
