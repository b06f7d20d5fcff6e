package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Degree-ordered triangle counting vs an exhaustive reference. */
class TrianglesSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  /** Brute force: per-node triangle count over an undirected edge set. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val tri = nodes.map { v =>
      val nb = adj(v).toSeq
      v -> nb.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }.toLong
    }.toMap
    nodes.map(v => v -> (adj(v).size.toLong, tri(v))).toMap
  }

  test("matches exhaustive counts on a known graph") {
    // K4 on {1,2,3,4} plus a pendant 5-1 and an isolated edge 6-7
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1), (6, 7),
      (2, 1), (3, 3)) // reversed dup + self loop must be ignored
    val got = Triangles.nodeTriangles(edges.toDF("a", "b"))
      .select("node", "deg", "tri").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === reference(edges))
  }

  test("matches brute force on random graphs, including skewed-degree ones") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      // node 0 is a hub touching everything — exercises the orientation
      val edges = Seq.tabulate(30)(i => (0L, i.toLong + 1)) ++
        Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val got = Triangles.nodeTriangles(edges.toDF("a", "b"))
        .select("node", "deg", "tri").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === reference(edges), s"trial $trial diverged")
    }
  }

  test("kcorePeel keeps a clique, sheds a tail, and peels a path round by round") {
    // 4-clique {1,2,3,4} (internal degree 3) + tail 4-5-6: node 6
    // (deg 1) and 5 (deg 2) fall in round 1, the clique is stable
    val clique = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
    val g = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val got = Triangles.kcorePeel(g, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a 6-path at k=2 peels from both ends: 2 nodes per round, empty
    // after 3 — the round bound is observable, not a fixed point
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    assert(Triangles.kcorePeel(path, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap ==
      Map(2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    assert(Triangles.kcorePeel(path, k = 2, rounds = 3).collect().isEmpty)
    // duplicate/self-loop edges canonicalize before peeling
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("a", "b")
    assert(Triangles.kcorePeel(messy, k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("degreeAssortativity: +1 on degree-sorted cliques, -1 on a star, NULL when regular") {
    // two disjoint cliques of different size: every edge joins equal
    // degrees, and degrees vary across edges -> perfectly assortative
    val tri = (for { a <- 1L to 3L; b <- 1L to 3L if a < b } yield (a, b))
    val quad = (for { a <- 11L to 14L; b <- 11L to 14L if a < b } yield (a, b))
    val sorted = Triangles.degreeAssortativity((tri ++ quad).toDF("a", "b")).head()
    assert(sorted.getLong(0) == 18L && sorted.getDouble(1) == 1.0)
    // star: every edge joins the hub (deg 5) to a leaf (deg 1) -> -1
    val star = (2L to 6L).map(b => (1L, b)).toDF("a", "b")
    val hub = Triangles.degreeAssortativity(star).head()
    assert(hub.getLong(0) == 10L && hub.getDouble(1) == -1.0)
    // a single clique is degree-regular: zero variance -> NULL
    assert(Triangles.degreeAssortativity(tri.toDF("a", "b")).head().isNullAt(1))
  }

  test("clustering coefficient is 1.0 on a clique, 0.0 on a star") {
    val clique = (for {
      a <- 1L to 5L; b <- 1L to 5L if a < b
    } yield (a, b)).toDF("a", "b")
    val cRows = Triangles.nodeTriangles(clique)
      .select("coeff").as[Double].collect()
    assert(cRows.length == 5 && cRows.forall(_ == 1.0))

    val star = (2L to 6L).map(b => (1L, b)).toDF("a", "b")
    val sRows = Triangles.nodeTriangles(star)
      .select("coeff").as[Double].collect()
    assert(sRows.length == 6 && sRows.forall(_ == 0.0))
  }
}
