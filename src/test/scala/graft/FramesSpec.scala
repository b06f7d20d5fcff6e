package graft

import org.apache.spark.storage.StorageLevel

import graft.sources.Frames

/** The shared-frame registry's LRU cap: a long-lived session cycling
  * through many data dirs must not pin every retired dir's persisted
  * blocks — beyond `graft.frames.maxShared` the least-recently-used
  * completed frame is unpersisted and forgotten.
  */
class FramesSpec extends SparkSpec {

  test("retired dirs' frames are evicted LRU beyond the cap; hot frames survive") {
    // an isolated session: Frames keys on the SparkSession reference, so
    // the shared test session's own frames can't skew the LRU order
    val s = spark.newSession()
    // explicit-cap entry point: mutating the global maxShared property
    // here would nondeterministically evict frames of suites running in
    // parallel in this JVM
    def sharedAt2(key: String)(build: => org.apache.spark.sql.DataFrame) =
      Frames.sharedWithCap(s, key, 2)(build)
    try {
      import s.implicits._
      val a = sharedAt2("dirA/sig")(s.range(10).toDF)
      a.count()
      val b = sharedAt2("dirB/sig")(s.range(20).toDF)
      b.count()
      // touch A: B becomes the LRU of the two completed frames
      sharedAt2("dirA/sig")(sys.error("A was evicted and rebuilt"))
      // third dir pushes the session over cap=2 -> B must go
      val c = sharedAt2("dirC/sig")(s.range(30).toDF)
      c.count()
      assert(Frames.contains(s, "dirA/sig"), "MRU frame A must survive")
      assert(Frames.contains(s, "dirC/sig"), "just-inserted frame C must survive")
      assert(!Frames.contains(s, "dirB/sig"), "LRU frame B must be evicted")
      assert(b.storageLevel == StorageLevel.NONE,
        "evicted frame's blocks must be unpersisted")
      assert(a.storageLevel != StorageLevel.NONE && c.storageLevel != StorageLevel.NONE,
        "surviving frames stay persisted")
      // an evicted frame still COMPUTES correctly (lineage recompute),
      // and re-sharing it re-registers under the cap (evicting the new LRU)
      val b2 = sharedAt2("dirB/sig")(s.range(20).toDF)
      assert(b2.count() == 20)
      assert(Frames.contains(s, "dirB/sig"))
    } finally Frames.clear(s)
  }

  test("frames below the cap are never evicted") {
    val s = spark.newSession()
    try {
      import s.implicits._
      for (i <- 1 to 5) {
        Frames.shared(s, s"small_dir$i")(s.range(i.toLong).toDF).count()
      }
      for (i <- 1 to 5)
        assert(Frames.contains(s, s"small_dir$i"),
          s"frame $i of 5 must survive under the default cap")
    } finally Frames.clear(s)
  }
}
