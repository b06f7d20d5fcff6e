package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — an operator Spark's built-in join
  * strategies handle badly: the natural formulation
  * `pt >= start AND pt < end` has no equi-conjunct, so Catalyst plans a
  * BroadcastNestedLoopJoin (fine only while the interval side is tiny) or,
  * with two large sides, a cartesian product — both scale-killers.
  *
  * This is the standard bucketed rewrite: each interval is exploded into
  * the fixed-width time buckets it overlaps, each point is mapped to the
  * single bucket containing it, and the join becomes a plain hash
  * equi-join on the bucket key, re-filtered by the exact range predicate.
  * Cost: one shuffle of |points| + |intervals| × avg-buckets-per-interval
  * rows; pick `bucketUnit` close to the typical interval length so the
  * expansion factor stays small. The rewrite is exact: a point matches an
  * interval iff its bucket is one of the interval's covered buckets, so
  * the equi-join loses no candidates and the residual predicate removes
  * false positives within the boundary buckets.
  *
  * Intervals are closed-open `[start, end)`, the natural shape for
  * campaign/validity windows (end = next window's start, no double count).
  */
object RangeJoin {

  private def step(bucketUnit: String): Column = bucketUnit.toLowerCase match {
    case "month" => expr("INTERVAL 1 MONTH")
    case "week"  => expr("INTERVAL 7 DAYS")
    case "day"   => expr("INTERVAL 1 DAY")
    case u => throw new IllegalArgumentException(s"unsupported bucket unit: $u")
  }

  private def bucketOf(bucketUnit: String, c: Column): Column =
    date_trunc(bucketUnit.toUpperCase, c).cast("date")

  /** Join each point row to every interval row whose `[start, end)` range
    * contains its `ptCol` date. Output: point columns ++ interval columns
    * (names must not collide). Points matching no interval are dropped
    * (inner-join semantics).
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketUnit: String = "month"): DataFrame = {
    // a degenerate interval (end <= start, e.g. a zero-length validity
    // window) matches no point under [start, end) — and would feed
    // sequence() a stop below its start, which throws. Filter them out
    // rather than fail the job on one bad row.
    val nonEmpty = intervals.filter(col(endCol) > col(startCol))
    // the last covered bucket is the one containing end-1day (end exclusive)
    val expanded = nonEmpty.withColumn(
      "__bucket",
      explode(sequence(
        bucketOf(bucketUnit, col(startCol)),
        bucketOf(bucketUnit, date_sub(col(endCol), 1)),
        step(bucketUnit))))
    points
      .withColumn("__bucket", bucketOf(bucketUnit, col(ptCol)))
      .join(expanded, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join: every (left, right) pair whose
    * closed-open ranges intersect (`lStart < rEnd AND rStart < lEnd`).
    * Column names must not collide across the two sides.
    *
    * Same bucketed rewrite as [[pointInInterval]], on BOTH sides: each
    * interval explodes into its covered buckets and the join becomes a
    * hash equi-join on the bucket key. Two intervals overlap iff they
    * share at least one covered bucket, so no candidate is lost; the
    * residual predicate removes boundary false positives. A pair can
    * share MANY buckets — instead of a `distinct()` shuffle, each pair is
    * emitted exactly once at the FIRST shared bucket (the later of the
    * two start buckets), which is a plain filter on the joined row.
    * Cost: one shuffle of both sides × their bucket expansion factors;
    * pick `bucketUnit` near the typical interval length of the SHORTER
    * side so expansion stays small.
    *
    * Empty intervals (`end <= start`) are empty SETS and overlap nothing —
    * note this differs from the bare SQL predicate
    * `lStart < rEnd AND rStart < lEnd`, which matches a degenerate `[s,s)`
    * lying strictly inside the other interval.
    */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketUnit: String = "month"): DataFrame = {
    def expand(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s)).withColumn(
        "__bucket",
        explode(sequence(
          bucketOf(bucketUnit, col(s)),
          bucketOf(bucketUnit, date_sub(col(e), 1)),
          step(bucketUnit))))
    expand(left, lStart, lEnd)
      .join(expand(right, rStart, rEnd), Seq("__bucket"))
      .filter(
        col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
          col("__bucket") === greatest(
            bucketOf(bucketUnit, col(lStart)),
            bucketOf(bucketUnit, col(rStart))))
      .drop("__bucket")
  }
}
