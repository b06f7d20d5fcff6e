package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelProp

/** Deterministic synchronous label propagation: dense regions converge
  * to one label, the argmax tie order is (count DESC, label ASC), and
  * the update is truly synchronous (round i reads only round i-1).
  */
class LabelPropSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def und(edges: (Long, Long)*) = edges.toDF("u", "v")

  test("two cliques joined by a bridge settle on per-clique labels") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridge 4-10
    val clique1 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val clique2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val g = und(clique1 ++ clique2 :+ (4L, 10L): _*)
    val out = LabelProp.propagate(g, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // within each clique every member ends on the same label, and the
    // two cliques end on different labels
    val l1 = (1L to 4L).map(out).toSet
    val l2 = (10L to 13L).map(out).toSet
    assert(l1.size == 1, s"clique 1 split: $out")
    assert(l2.size == 1, s"clique 2 split: $out")
    assert(l1 != l2, s"cliques merged: $out")
  }

  test("ties break to the smallest label and updates are synchronous") {
    // star: center 5, leaves 1,2,3 — round 1: center sees {1,2,3} all
    // count 1 → takes 1; each leaf sees only {5} → takes 5. Round 2:
    // center sees {5,5,5} → 5; leaves see {1} → 1 (synchronous: they
    // read the center's ROUND-1 label, not its fresh round-2 value).
    val g = und((1L, 5L), (2L, 5L), (3L, 5L))
    val r1 = LabelProp.propagate(g, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(5L -> 1L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
    val r2 = LabelProp.propagate(g, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(5L -> 5L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("round count must be positive") {
    intercept[IllegalArgumentException] {
      LabelProp.propagate(und((1L, 2L)), 0)
    }
  }
}
