package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** [[PageRank.ranks]]: the fixed-point integer iteration must match an
  * exact BigInt replay of the same recurrence — no float drift, dangling
  * and sink nodes handled, parameters validated.
  */
class PageRankSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  /** Exact scala replay of the documented recurrence. */
  private def replay(edges: Seq[(Long, Long, Long)], iters: Int,
      base: Long = 1000000L, num: Int = 85, den: Int = 100): Map[Long, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val teleport = base * (den - num) / den
    var rank = nodes.map(_ -> BigInt(base)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        rank(u) * w / outw(u) // BigInt / truncates like div
      }.sum).toMap
      rank = nodes.map(v => v -> (BigInt(teleport) + BigInt(num) * in.getOrElse(v, BigInt(0)) / den)).toMap
    }
    rank.map { case (k, v) => k -> v.toLong }
  }

  test("integer PageRank matches the exact BigInt replay on a weighted digraph") {
    // cycle with a heavy chord, a dangling sink (5), a source-only node (9)
    val edges = Seq[(Long, Long, Long)](
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 3L),
      (3L, 5L, 2L), (9L, 1L, 7L))
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.ranks(edges.toDF("src", "dst", "w"), iters)
        .as[(Long, Long)].collect().toMap
      assert(got == replay(edges, iters), s"iters=$iters")
    }
  }

  test("authority orders as expected: heavily-cited node outranks the teleport floor") {
    // star: many pages all linking to hub 100
    val edges = (1L to 8L).map(i => (i, 100L, 1L))
    val got = PageRank.ranks(edges.toDF("src", "dst", "w"), 3)
      .as[(Long, Long)].collect().toMap
    val floor = 150000L // no in-edges -> teleport only
    assert((1L to 8L).forall(got(_) == floor))
    // spokes settle at the floor after round 1, so the hub's fixed point
    // is teleport + 0.85 * 8 * floor exactly
    assert(got(100L) == floor + 85L * 8 * floor / 100, s"hub rank ${got(100L)}")
    assert(got(100L) > 1000000L, "the hub must outrank the start value")
    intercept[IllegalArgumentException](
      PageRank.ranks(edges.toDF("src", "dst", "w"), 0))
  }

  /** Exact scala replay of the personalized recurrence. */
  private def replayPpr(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
      iters: Int, base: Long = 1000000L, num: Int = 85,
      den: Int = 100): Map[Long, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val teleport = base * (den - num) / den
    var rank = nodes.map(v => v -> BigInt(if (seeds(v)) base else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _, w) =>
        rank(u) * w / outw(u)
      }.sum).toMap
      rank = nodes.map(v => v ->
        (BigInt(if (seeds(v)) teleport else 0L) +
          BigInt(num) * in.getOrElse(v, BigInt(0)) / den)).toMap
    }
    rank.map { case (k, v) => k -> v.toLong }
  }

  test("personalized ranks match the BigInt replay; proximity and zero floors hold") {
    // path 1→2→3→4 plus an island 8→9: seed {1} mass decays along the
    // path and NEVER reaches the island
    val edges = Seq[(Long, Long, Long)](
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (8L, 9L, 1L))
    val seeds = Seq(1L).toDF("node")
    for (iters <- Seq(1, 3)) {
      val got = PageRank.personalizedRanks(
        edges.toDF("src", "dst", "w"), seeds, iters)
        .as[(Long, Long)].collect().toMap
      assert(got == replayPpr(edges, Set(1L), iters), s"iters=$iters")
    }
    val got = PageRank.personalizedRanks(
      edges.toDF("src", "dst", "w"), seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) >= 150000L, "seed holds the teleport floor")
    // steady-state proximity decays hop by hop (node 4, the dangling
    // tail, still carries the initial mass WAVE at finite iterations —
    // that transient is part of the certified recurrence, not a bug)
    assert(got(2L) > got(3L), s"one hop must outrank two hops: $got")
    assert(got(8L) == 0L && got(9L) == 0L,
      "unreachable island must sit at exactly 0")
  }
}
