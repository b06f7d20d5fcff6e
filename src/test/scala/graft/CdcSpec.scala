package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, IncrementalAgg}

/** CDC consumption ([[graft.operators.Cdc]]) and retractable aggregate
  * maintenance ([[IncrementalAgg.fromChanges]]): op-fold semantics,
  * out-of-order arrival, delete/resurrect, merge actions, and
  * retraction == recompute — the end-to-end oracle rows are
  * `cdc_apply`, `cdc_merge_soft_delete`, `c8_retractable_agg`.
  */
class CdcSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("applyChanges keeps the highest-seq survivor per key") {
    val feed = Seq(
      // key 1: I then U -> updated value
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),
      // key 2: I then D -> gone
      (2L, 1L, "I", "x"), (2L, 5L, "D", null),
      // key 3: D then later I -> resurrected (order by seq, not arrival)
      (3L, 9L, "I", "back"), (3L, 4L, "D", null), (3L, 1L, "I", "orig"),
      // key 4: lone insert
      (4L, 1L, "I", "solo"))
      .toDF("k", "seq", "op", "v")
    val got = Cdc.applyChanges(feed, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "b"), (3L, "back"), (4L, "solo")))
  }

  test("applyChanges resolves equal-seq ties deterministically (op order)") {
    // same seq: 'D' < 'I' < 'U' ascending, row_number takes the FIRST by
    // (seq desc, op asc) -> the delete wins a tie against an upsert
    val feed = Seq((1L, 7L, "U", "u"), (1L, 7L, "D", null))
      .toDF("k", "seq", "op", "v")
    assert(Cdc.applyChanges(feed, Seq("k"), "seq", "op").isEmpty)
  }

  test("mergeSoftDelete: update / insert / keep / delete / absent-delete") {
    val target = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("k", "v")
    val source = Seq(
      (1L, "s1", false), // matched update
      (2L, "s2", true),  // matched delete
      (4L, "s4", false), // insert
      (5L, "s5", true))  // delete of absent key: no-op
      .toDF("k", "v", "deleted")
    val got = Cdc.mergeSoftDelete(target, source, Seq("k"), "deleted")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, "s1", "updated"), (3L, "t3", "kept"), (4L, "s4", "inserted")))
  }

  test("retraction: changes-fold == recompute over surviving rows, groups vanish") {
    val rows = Seq(
      ("a", 1.0), ("a", 2.5), ("a", 4.0),
      ("b", 10.0), ("b", 0.25),
      ("c", 7.0)) // whole group will be deleted
      .toDF("g", "x")
    val keys = Seq("g"); val sums = Seq("x")
    val state0 = IncrementalAgg.fromBatch(rows, keys, sums)
    val changes = Seq(
      ("a", 2.5, "D"),            // partial retract
      ("b", 0.25, "D"), ("b", 3.75, "I"), // retract + correction
      ("c", 7.0, "D"))            // retracts the group to zero
      .toDF("g", "x", "op")
    val after = IncrementalAgg.present(
      IncrementalAgg.mergeRetract(state0,
        IncrementalAgg.fromChanges(changes, keys, sums, "op"), keys, sums),
      keys, sums)
    val want = IncrementalAgg.present(
      IncrementalAgg.fromBatch(
        Seq(("a", 1.0), ("a", 4.0), ("b", 10.0), ("b", 3.75)).toDF("g", "x"),
        keys, sums), keys, sums)
    assert(after.as[(String, Long, Double)].collect().toSet ==
      want.as[(String, Long, Double)].collect().toSet)
    assert(after.filter(col("g") === "c").isEmpty, "zeroed group must vanish")
  }
}
