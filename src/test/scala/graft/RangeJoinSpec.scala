package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalAgg, RangeJoin}

/** Unit coverage for the bucketed range join (incl. the degenerate-interval
  * guard) and the incremental-aggregate state machine; their end-to-end
  * oracle queries are j12_range_campaign and c7_delta_agg.
  */
class RangeJoinSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("pointInInterval == brute-force non-equi join, degenerate intervals match nothing") {
    val intervals = Seq(
      // [start, end) windows, incl. boundary-bucket shapes
      (1L, "2024-01-15", "2024-03-02"),
      (2L, "2024-02-01", "2024-02-02"), // single day
      (3L, "2024-03-02", "2024-03-02"), // degenerate: end == start
      (4L, "2024-05-01", "2024-04-01"), // degenerate: end < start
      (5L, "2024-01-01", "2024-07-01")  // spans everything
    ).toDF("iv_id", "start_s", "end_s")
      .select(col("iv_id"), col("start_s").cast("date").as("start_dt"),
        col("end_s").cast("date").as("end_dt"))
    val points = (0 until 200)
      .map(i => (i.toLong, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))))
      .toDF("pt_id", "pt_dt")

    val got = RangeJoin.pointInInterval(points, "pt_dt", intervals, "start_dt", "end_dt")
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val want = points.join(intervals,
      col("pt_dt") >= col("start_dt") && col("pt_dt") < col("end_dt"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet

    assert(got == want)
    assert(!got.exists(p => p._2 == 3L || p._2 == 4L), "degenerate intervals must match nothing")
    assert(got.exists(_._2 == 2L), "single-day interval must still match its day")
  }

  test("incremental merge folds are exact and order-independent") {
    val rows = (1 to 300).map(i => (i % 7, BigDecimal(i) * BigDecimal("0.1111")))
      .toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(18,4)").as("v"))
    val oneShot = IncrementalAgg.present(
      IncrementalAgg.fromBatch(rows, Seq("k"), Seq("v")), Seq("k"), Seq("v"))
      .as[(Int, Long, Double)].collect().toSet

    // three disjoint batches, merged in two different orders
    def batches = Seq(0, 1, 2).map(m =>
      IncrementalAgg.fromBatch(rows.filter(pmod(col("k"), lit(3)) === m), Seq("k"), Seq("v")))
    val fwd = batches.reduce(IncrementalAgg.merge(_, _, Seq("k"), Seq("v")))
    val rev = batches.reverse.reduce(IncrementalAgg.merge(_, _, Seq("k"), Seq("v")))

    for (merged <- Seq(fwd, rev)) {
      val got = IncrementalAgg.present(merged, Seq("k"), Seq("v"))
        .as[(Int, Long, Double)].collect().toSet
      assert(got == oneShot)
    }
    // state survives merges at full width: a narrowing cast would change
    // the schema and (under ANSI) throw at scale
    assert(fwd.schema("sum_v").dataType.toString.contains("38,4"))
  }
}
