package graft

import org.apache.spark.sql.functions._

import graft.operators.Bfs

/** Min-plus BFS: exact hop counts on a hand graph, hop bound respected,
  * disconnected components unreached.
  */
class BfsSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // path 1-2-3-4-5, branch 2-10; island 20-21
  private def g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 10L),
    (20L, 21L)).toDF("u", "v")

  test("exact distances within the hop bound; island unreached") {
    val d = Bfs.hops(g, 1L, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 2L, 4L -> 3L))
    val d1 = Bfs.hops(g, 1L, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L))
    intercept[IllegalArgumentException] { Bfs.hops(g, 1L, 0) }
  }
}
