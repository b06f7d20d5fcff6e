package graft

import org.apache.spark.sql.functions._

import graft.operators.IncrementalJoin

/** Incremental join-view maintenance: view ∪ delta must equal the
  * one-shot join as a BAG (duplicate-key multiplicities included), for
  * any split of either side, with empty deltas a no-op.
  */
class IncrementalJoinSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // duplicate keys on both sides (k=1: 2×2 pairs; k=2: 2×1) so bag
  // semantics are actually exercised, plus unmatched rows on each side
  private def a = Seq((1, "a1"), (1, "a2"), (2, "a3"), (2, "a4"), (3, "a5"), (9, "a6"))
    .toDF("k", "av")
  private def b = Seq((1, "b1"), (1, "b2"), (2, "b3"), (3, "b4"), (8, "b5"))
    .toDF("k", "bv")

  private def bag(df: org.apache.spark.sql.DataFrame): Map[(Int, String, String), Long] =
    df.groupBy(col("k"), col("av"), col("bv")).count()
      .as[(Int, String, String, Long)].collect()
      .map { case (k, x, y, n) => (k, x, y) -> n }.toMap

  test("view ∪ delta == one-shot join, as a bag, for every 2x2 split") {
    val oneShot = bag(a.join(b, Seq("k")))
    // split each side by a different predicate, including empty/full deltas
    val aSplits = Seq(col("av") < "a3", lit(false), lit(true), col("k") % 2 === 0)
    val bSplits = Seq(col("bv") >= "b3", lit(false), lit(true), col("k") % 2 === 1)
    for (pa <- aSplits; pb <- bSplits) {
      val (aOld, aDelta) = (a.filter(!pa), a.filter(pa))
      val (bOld, bDelta) = (b.filter(!pb), b.filter(pb))
      val view = aOld.join(bOld, Seq("k"))
      val refreshed = IncrementalJoin.maintained(
        view, aOld, aDelta, bOld, bDelta, Seq("k"))
      assert(bag(refreshed) == oneShot, s"split ($pa, $pb) broke the identity")
    }
  }

  test("empty deltas contribute nothing: delta is an empty frame") {
    val d = IncrementalJoin.delta(a, a.limit(0), b, b.limit(0), Seq("k"))
    assert(d.count() == 0)
  }

  test("weighted retraction: deletes on either side remove exactly their pairs") {
    val a0 = a.withColumn("w", lit(1))
    val b0 = b.withColumn("w", lit(1))
    // bootstrap: empty olds make the cross term the full join
    val v0 = IncrementalJoin.weightedDelta(
      a0.limit(0), a0, b0.limit(0), b0, Seq("k"))
    assert(bag(IncrementalJoin.present(v0).drop("w")) == bag(a.join(b, Seq("k"))))

    // delete one A row (a1, k=1) and one B row (b3, k=2) in one change batch;
    // k=2 also loses its only A partner's pair via the B delete alone
    val aDel = a.filter(col("av") === "a1").withColumn("w", lit(-1))
    val bDel = b.filter(col("bv") === "b3").withColumn("w", lit(-1))
    val dv = IncrementalJoin.weightedDelta(a0, aDel, b0, bDel, Seq("k"))
    val net = IncrementalJoin.present(v0.unionByName(dv))
    val expected = a.filter(col("av") =!= "a1")
      .join(b.filter(col("bv") =!= "b3"), Seq("k"))
    assert(bag(net.drop("w")) == bag(expected))
    assert(net.filter(col("w") <= 0).count() == 0, "present must drop zeroed rows")
  }

  test("weighted cross term: deleting BOTH partners of a pair nets to zero once") {
    val a0 = a.withColumn("w", lit(1))
    val b0 = b.withColumn("w", lit(1))
    val v0 = IncrementalJoin.weightedDelta(
      a0.limit(0), a0, b0.limit(0), b0, Seq("k"))
    // delete every k=3 row on both sides in the SAME batch: the pair loses
    // -1 (A side) and -1 (B side) and regains +1 from ΔA⋈ΔB — net 0, not -1
    val aDel = a.filter(col("k") === 3).withColumn("w", lit(-1))
    val bDel = b.filter(col("k") === 3).withColumn("w", lit(-1))
    val dv = IncrementalJoin.weightedDelta(a0, aDel, b0, bDel, Seq("k"))
    val net = IncrementalJoin.present(v0.unionByName(dv))
    assert(net.filter(col("k") === 3).count() == 0)
    assert(bag(net.drop("w")) ==
      bag(a.filter(col("k") =!= 3).join(b.filter(col("k") =!= 3), Seq("k"))))
  }
}
