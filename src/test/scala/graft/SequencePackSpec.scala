package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack

/** Token-budget sequence packing: the distributed prefix sum must equal
  * the sequential semantics regardless of how the input arrives, offsets
  * must be contiguous, and every pack but the last exactly full.
  */
class SequencePackSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def docs = (1L to 200L).map(i => (i, 1 + (i * 7 % 93))).toDF("id", "n")

  test("offsets are contiguous and equal the sequential cumulative sum") {
    val got = SequencePack.pack(docs, "id", "n", packSize = 64)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = docs.collect().map(r => (r.getLong(0), r.getLong(1).toLong))
      .sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, next), (id, n)) => (id, n, next + n) }
      .drop(1)
      .map { case (id, n, cum) =>
        (id, n, cum - n, (cum - n) / 64, (cum - 1) / 64)
      }
    assert(got.toSeq == expected.toSeq)
  }

  test("packing is independent of the input's partitioning") {
    val a = SequencePack.pack(docs.repartition(1), "id", "n", 64)
    val b = SequencePack.pack(docs.repartition(13), "id", "n", 64)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "partition boundaries must not leak into the packing")
  }

  test("manifest: every pack but the last is exactly full") {
    val packed = SequencePack.pack(docs, "id", "n", 64)
    val m = SequencePack.manifest(packed, 64).orderBy("pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalTokens = docs.agg(sum(col("n"))).head().getLong(0)
    assert(m.map(_._1).toSeq == (0L until m.length).toSeq, "packs are dense")
    assert(m.init.forall(_._3 == 64L), s"non-final pack not full: ${m.toSeq}")
    assert(m.map(_._3).sum == totalTokens, "every token lands in exactly one pack")
    // a doc spanning a boundary is counted in each pack it touches
    assert(m.map(_._2).sum >= docs.count())
  }

  test("duplicate order keys are rejected, not silently mis-packed") {
    val dup = Seq((1L, 5L), (1L, 5L), (2L, 5L)).toDF("id", "n")
    val e = intercept[IllegalArgumentException](
      SequencePack.pack(dup, "id", "n", 4))
    assert(e.getMessage.contains("unique"), e.getMessage)
  }

  test("zero-token rows span no pack and keep offsets contiguous") {
    val withEmpty = Seq((1L, 5L), (2L, 0L), (3L, 5L)).toDF("id", "n")
    val got = SequencePack.pack(withEmpty, "id", "n", 4)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 0L, 0L, 1L), (2L, 5L, 1L, 1L), (3L, 5L, 1L, 2L)))
  }
}
