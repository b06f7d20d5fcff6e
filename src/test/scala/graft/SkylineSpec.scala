package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Skyline sweep vs brute-force dominance: identical front points on
  * dense/tied data at several range counts, nulls dropped, equal points
  * tie (neither dominates).
  */
class SkylineSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  /** Deterministic pseudo-random point cloud with heavy x/y ties. */
  private def pts = (0L until 400L).map { i =>
    ((i * 2654435761L) % 23L, ((i * 40503L) % 17L))
  }.toDF("x", "y")

  private def brute(rows: Seq[(Long, Long)]): Set[(Long, Long)] =
    rows.filter { case (x, y) =>
      !rows.exists { case (a, b) =>
        a >= x && b >= y && (a > x || b > y)
      }
    }.toSet

  test("front equals brute force across range counts (ties included)") {
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = brute(rows)
    for (n <- Seq(1, 3, 32)) {
      val got = Skyline.paretoFront2d(pts, "x", "y", nRanges = n)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expect, s"nRanges=$n")
    }
  }

  test("null coordinates are dropped; a single point survives") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (null, 5L), (2L, 3L)).toDF("x", "y")
    val got = Skyline.paretoFront2d(df, "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 3L)))
  }

  test("a strictly increasing staircase keeps only the top point; a strictly trading-off front keeps all") {
    val stairs = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Skyline.paretoFront2d(stairs, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((3L, 3L)))
    val front = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Skyline.paretoFront2d(front, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 2L), (3L, 1L)))
  }
}
