package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

/** MMR diversified rerank: greedy picks against an in-memory reference,
  * diversification vs pure relevance, tie and degenerate poles.
  */
class MmrSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def elems(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("vec_id", "v")
      .select(col("vec_id"), posexplode(col("v")))
      .select(col("vec_id"), col("pos").as("i"), col("col").as("x"))

  test("greedy picks trade relevance for diversity (hand geometry)") {
    // query 0 at the origin; a=(1,0) and b=(1.1,0) are near-duplicates,
    // c=(0,2) is farther but diverse, d=(5,5) is junk.
    // Pure relevance would rank a, b, c; MMR must pick a, then c
    // (diversity beats b's closeness), then b over d.
    val el = elems(Seq(
      0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 0.0), 2L -> Seq(1.1, 0.0),
      3L -> Seq(0.0, 2.0), 4L -> Seq(5.0, 5.0)))
    val got = Mmr.rerank(el, queryId = 0L, poolSize = 4, k = 3)
      .orderBy("rnk").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L),
      s"pick order: ${got.toSeq}")
    val byId = got.map(r => r.getLong(1) -> r).toMap
    assert(byId(1L).getDouble(2) == 1.0) // rel d² of a
    assert(byId(3L).getDouble(2) == 4.0 && byId(3L).getDouble(3) == 5.0) // c
    assert(math.abs(byId(2L).getDouble(2) - 1.21) < 1e-9)
    assert(math.abs(byId(2L).getDouble(3) - 0.01) < 1e-9) // b: d²(b,a) wins the min
    // the first pick's diversity term is NULL (empty selected set)
    val first = Mmr.rerank(el, 0L, 4, 3).filter(col("rnk") === 1).head()
    assert(first.isNullAt(3))
  }

  test("matches a brute-force in-memory greedy on a larger corpus") {
    val pts = (1L to 20L).map(id =>
      id -> Seq((id % 7).toDouble, (id % 5).toDouble, (id % 3).toDouble))
    val el = elems((0L -> Seq(0.0, 0.0, 0.0)) +: pts)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val q = Seq(0.0, 0.0, 0.0)
    val byId = pts.toMap
    val pool = pts.map { case (id, v) => (id, d2(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(8)
    var sel = Vector(pool.minBy { case (id, d) => (d, id) }._1)
    var rem = pool.map(_._1).filterNot(_ == sel.head)
    for (_ <- 2 to 4) {
      val pick = rem.map { id =>
        val mind = sel.map(sid => d2(byId(id), byId(sid))).min
        (mind - d2(q, byId(id)), id)
      }.maxBy { case (sc, id) => (sc, -id) }._2
      sel :+= pick
      rem = rem.filterNot(_ == pick)
    }
    val got = Mmr.rerank(el, 0L, poolSize = 8, k = 4)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    assert(got == sel, s"engine $got vs reference $sel")
  }

  test("degenerate poles: empty corpus, absent query, pool narrower than k") {
    val el = elems(Seq(0L -> Seq(1.0, 2.0), 1L -> Seq(2.0, 1.0)))
    assert(Mmr.rerank(el.limit(0), 0L, 4, 2).count() == 0L)
    assert(Mmr.rerank(el, 99L, 4, 2).count() == 0L, "absent query: no distances")
    // pool of 1 candidate, k = 2: emit what exists
    val one = Mmr.rerank(el, 0L, 4, 2)
    assert(one.count() == 1L && one.head().getLong(1) == 1L)
    intercept[IllegalArgumentException] { Mmr.rerank(el, 0L, 2, 4) }
  }

  test("exact-decimal ties break to the lowest id") {
    // two candidates mirror-symmetric around the query: identical rel
    // and div terms — the pick must be the lower id, both rounds
    val el = elems(Seq(
      0L -> Seq(0.0), 5L -> Seq(1.0), 3L -> Seq(-1.0)))
    val got = Mmr.rerank(el, 0L, 2, 2)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 5L))
  }
}
