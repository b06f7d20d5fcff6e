package graft

import org.apache.spark.sql.functions._

import graft.operators.Hits

/** HITS fixed-point integer iteration: authorities and hubs land where
  * the mutual-reinforcement definition puts them, normalization pins
  * the max to base ppm, weights count, and the guard fires.
  */
class HitsSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def edges(rows: (Long, Long, Long)*) = rows.toDF("src", "dst", "w")

  test("pure star: the target is the authority, the pointers are hubs") {
    // 1,2,3 -> 5; 5 -> 4
    val g = edges((1L, 5L, 1L), (2L, 5L, 1L), (3L, 5L, 1L), (5L, 4L, 1L))
    val out = Hits.scores(g, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(5L)._1 == 1000000L, s"node 5 must be the top authority: $out")
    assert(Seq(1L, 2L, 3L).forall(out(_)._2 == 1000000L),
      s"pointers at the top authority must be the top hubs: $out")
    assert(out(4L)._2 == 0L, "sink has no out-edges, hub 0")
    assert(out(1L)._1 == 0L, "sources have no in-edges, authority 0")
  }

  test("edge weights dominate: the heavier-cited target out-ranks") {
    val g = edges((1L, 10L, 5L), (1L, 11L, 1L))
    val out = Hits.scores(g, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 1000000L && out(11L) < out(10L),
      s"weight-5 citation must out-rank weight-1: $out")
  }

  test("iteration count must be positive") {
    intercept[IllegalArgumentException] {
      Hits.scores(edges((1L, 2L, 1L)), 0)
    }
  }
}
