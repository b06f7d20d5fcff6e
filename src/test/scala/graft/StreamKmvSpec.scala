package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.TableStore
import graft.streaming.StreamSketch

/** Streaming KMV sketch maintenance: the folded per-group bottom-k store
  * must merge to exactly the one-shot sketch (the bottom-k merge law),
  * collapse values duplicated across batches, bound per-batch writes by
  * groups×k, and treat a replayed batch as a no-op.
  */
class StreamKmvSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private val K = 4

  /** 3 groups × 40 values with heavy cross-batch duplication: value v
    * appears in every batch with v % 3 == b and also (duplicated) when
    * v % 7 == 0, so bottom-k members straddle batches.
    */
  private def rows = (0L until 120L).map { i =>
    val grp = s"g${i % 3}"
    (grp, i / 3, (i * 2654435761L) % 4503599627370496L)
  }.toDF("grp", "seq", "h")

  private def oneShot = rows
    .groupBy(col("grp"))
    .agg(call_function("kmv_sketch", col("h"), lit(K)).as("sk"))
    .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

  test("3-batch fold merges to the one-shot sketch; duplicates collapse") {
    val store = new TableStore(s, Files.createTempDirectory("graft_skmv").toString)
    val fold = StreamSketch.applyKmvSketch(store, "kmv", "grp", "h", K) _
    // batch split on seq (uncorrelated with h), plus v%7 dup rows in EVERY batch
    val dups = rows.filter(col("h") % 7 === 0)
    (0 to 2).foreach(i =>
      fold(rows.filter(col("seq") % 3 === i).unionByName(dups), i.toLong))
    val merged = StreamSketch.mergedKmvSketch(store, "kmv", "grp", "h", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(merged == oneShot,
      "merged per-batch sketches must equal the one-shot bottom-k")
    // the merged sketch values are ascending and distinct
    merged.values.foreach(v => assert(v == v.distinct.sorted))
  }

  test("per-batch write volume is bounded by groups×k; replay is a no-op") {
    val store = new TableStore(s, Files.createTempDirectory("graft_skmv2").toString)
    val fold = StreamSketch.applyKmvSketch(store, "kmv", "grp", "h", K) _
    fold(rows.filter(col("seq") % 2 === 0), 0L)
    val b0 = store.read("kmv").filter(col("__applied") === 0).collect().toSet
    assert(b0.size <= 3 * K, s"batch 0 wrote ${b0.size} rows > groups×k")
    fold(rows.filter(col("seq") % 2 === 1), 1L)
    assert(store.read("kmv").filter(col("__applied") === 0)
      .collect().toSet == b0, "a later fold rewrote batch 0's sketch rows")
    val all = store.read("kmv").collect().toSet
    fold(rows.filter(col("seq") % 2 === 1), 1L) // at-least-once replay
    assert(store.read("kmv").collect().toSet == all, "replay doubled rows")
  }

  test("groups with fewer than k distinct values sketch exactly") {
    val store = new TableStore(s, Files.createTempDirectory("graft_skmv3").toString)
    val tiny = Seq(("a", 10L), ("a", 10L), ("a", 7L), ("b", 1L))
      .toDF("grp", "h")
    StreamSketch.applyKmvSketch(store, "kmv", "grp", "h", K)(tiny, 0L)
    val merged = StreamSketch.mergedKmvSketch(store, "kmv", "grp", "h", K)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(merged == Map("a" -> List(7L, 10L), "b" -> List(1L)))
  }
}
