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

  test("intervalOverlap == brute-force overlap, each pair exactly once, empty intervals match nothing") {
    val left = Seq(
      (1L, "2024-01-10", "2024-04-20"), // spans several buckets
      (2L, "2024-02-01", "2024-02-02"), // single day
      (3L, "2024-03-15", "2024-03-15"), // empty: must match nothing
      (4L, "2024-06-01", "2024-05-01")  // empty (end < start)
    ).toDF("l_id", "ls", "le")
      .select(col("l_id"), col("ls").cast("date").as("l_start"),
        col("le").cast("date").as("l_end"))
    // 80 staggered 10-day windows across the same half year
    val right = (0 until 80)
      .map { i =>
        val s = java.time.LocalDate.of(2024, 1, 1).plusDays(i * 2)
        (100L + i, Date.valueOf(s), Date.valueOf(s.plusDays(10)))
      }.toDF("r_id", "r_start", "r_end")

    val got = RangeJoin
      .intervalOverlap(left, "l_start", "l_end", right, "r_start", "r_end")
      .select("l_id", "r_id").as[(Long, Long)].collect()
    val want = left.filter(col("l_end") > col("l_start"))
      .join(right, col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet

    assert(got.toSet == want)
    assert(got.length == got.toSet.size, "a pair sharing many buckets must be emitted exactly once")
    assert(!got.exists(p => p._1 == 3L || p._1 == 4L), "empty intervals are empty sets")
    // touching endpoints do not overlap under [start, end)
    assert(!want.exists { case (l, r) => l == 1L && r == 100L + 55 })
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
