package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count–min sketch: estimates must dominate exact counts (never
  * undercount), collapse to exactness when buckets are collision-free,
  * and the sketch must stay within its declared size bound.
  */
class SketchesSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // 5 keys with distinct known frequencies 1..5
  private def keys = (1 to 5).flatMap(k => Seq.fill(k)(s"key_$k")).toDF("tok")
  private def exact = keys.groupBy("tok").agg(count(lit(1)).as("exact_n"))

  test("estimates dominate exact counts; wide sketches are exact") {
    // width 4 forces collisions among 5 keys in at least one row
    val tight = Sketches.cmsEstimate(
      Sketches.countMin(keys, "tok", depth = 4, width = 4),
      exact, "tok", depth = 4, width = 4)
      .select("tok", "exact_n", "cms_n").as[(String, Long, Long)].collect()
    assert(tight.length == 5)
    assert(tight.forall { case (_, n, est) => est >= n },
      s"count-min must never undercount: ${tight.toSeq}")
    // width 4096 over 5 keys: every key's lightest bucket is private
    val wide = Sketches.cmsEstimate(
      Sketches.countMin(keys, "tok", depth = 4, width = 4096),
      exact, "tok", depth = 4, width = 4096)
      .select("tok", "exact_n", "cms_n").as[(String, Long, Long)].collect()
    assert(wide.forall { case (_, n, est) => est == n },
      s"collision-free buckets must be exact: ${wide.toSeq}")
  }

  test("sketches merge by bucket-wise sum (the streaming/partition-union property)") {
    val a = keys.filter(col("tok").isin("key_1", "key_2", "key_3"))
    val b = keys.filter(!col("tok").isin("key_1", "key_2", "key_3"))
    val merged = Sketches.countMin(a, "tok", 4, 8)
      .unionByName(Sketches.countMin(b, "tok", 4, 8))
      .groupBy("r", "bucket").agg(sum("n").as("n"))
    val whole = Sketches.countMin(keys, "tok", 4, 8)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "count-min must be linear: sketch(a ∪ b) = sketch(a) + sketch(b)")
  }

  test("sketch size is bounded by depth x width regardless of input size") {
    val sketch = Sketches.countMin(keys, "tok", depth = 4, width = 4)
    assert(sketch.count() <= 4L * 4L)
    // total mass per row equals the input row count
    val perRow = sketch.groupBy("r").agg(sum("n").as("t"))
      .select("t").as[Long].collect()
    assert(perRow.forall(_ == keys.count()))
  }
}
