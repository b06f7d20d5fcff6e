package graft

import org.apache.spark.sql.functions._

/** SemDeDup (cluster-local semantic dedup) and the kNN-density score:
  * the kept flags and density values are re-derived here by a plain
  * in-memory brute force over the raw embedding arrays, using only the
  * query's own (vec_id, cid) assignment — an independent check of the
  * pair-join path (the k-means assignment itself is oracle-replayed by
  * the driver gate).
  */
class SemDeDupSpec extends SparkSpec {

  private val tau = 0.35

  /** Round half-up to 12 decimals — the contract of the engine's
    * round(c, 12) on the pairwise cosines.
    */
  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    r12(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  private lazy val vecs: Map[Long, IndexedSeq[Double]] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)
      .toMap

  private lazy val semOut: Seq[(Long, Long, Long)] =
    SparkEntry.queries("embed_semdedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("semdedup covers the corpus exactly once with 0/1 kept flags") {
    assert(semOut.map(_._1).toSet == vecs.keySet)
    assert(semOut.size == vecs.size)
    assert(semOut.forall(t => t._3 == 0L || t._3 == 1L))
    // the tau band must actually bite on this corpus, and not wipe it out
    val dropped = semOut.count(_._3 == 0L)
    assert(dropped > 0 && dropped < vecs.size, s"dropped=$dropped")
  }

  test("kept flag == no lower-id within-cluster neighbor at cosine >= tau") {
    val byCluster = semOut.groupBy(_._2)
    for ((_, members) <- byCluster; (v, _, kept) <- members) {
      val hasLower = members.exists { case (u, _, _) =>
        u < v && cos(vecs(u), vecs(v)) >= tau
      }
      assert(kept == (if (hasLower) 0L else 1L),
        s"vec $v: kept=$kept but hasLower=$hasLower")
    }
  }

  test("knn density == brute-force mean of top-8 within-cluster cosines") {
    // total over the corpus: a vector alone in its cluster reads NULL
    val density = SparkEntry.queries("embed_knn_density")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val byCluster = semOut.groupBy(_._2)
    assert(density.keySet == vecs.keySet)
    for ((_, members) <- byCluster; (v, _, _) <- members) {
      val nbrs = members.collect { case (u, _, _) if u != v =>
        (cos(vecs(u), vecs(v)), u)
      }.sortBy { case (c, u) => (-c, u) }.take(8)
      if (nbrs.isEmpty) assert(density(v).isEmpty, s"vec $v: singleton must be NULL")
      else {
        val expect = nbrs.map(_._1).sum / nbrs.size
        val got = density(v).getOrElse(fail(s"vec $v: unexpected NULL density"))
        assert(math.abs(got - expect) < 1e-9, s"vec $v: got $got, brute $expect")
        assert(got >= -1.0 - 1e-9 && got <= 1.0 + 1e-9)
      }
    }
  }
}
