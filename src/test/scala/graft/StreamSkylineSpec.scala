package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Skyline
import graft.sources.TableStore
import graft.streaming.StreamSkyline

/** Streaming skyline maintenance: the folded front must equal the
  * one-shot front whatever the arrival order (dominators before OR
  * after their victims), a replayed batch is a no-op, and the stored
  * state per batch is exactly the front — never history.
  */
class StreamSkylineSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def pts = (0L until 300L).map { i =>
    ((i * 2654435761L) % 41L, (i * 40503L) % 29L)
  }.toDF("x", "y")

  private def oneShot = Skyline.paretoFront2d(pts, "x", "y")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-batch fold equals the one-shot front under both arrival orders") {
    for (flip <- Seq(false, true)) {
      val store = new TableStore(s, Files.createTempDirectory("graft_ssky").toString)
      val fold = StreamSkyline.applyBatch(store, "front", "x", "y") _
      val order = if (flip) Seq(2, 1, 0) else Seq(0, 1, 2)
      order.zipWithIndex.foreach { case (b, id) =>
        fold(pts.filter(pmod(col("x") * 13 + col("y"), lit(3)) === b), id.toLong)
      }
      val got = StreamSkyline.currentFront(store, "front")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == oneShot, s"flip=$flip")
    }
  }

  test("replay is a no-op; stored partitions hold fronts, not history") {
    val store = new TableStore(s, Files.createTempDirectory("graft_ssky2").toString)
    val fold = StreamSkyline.applyBatch(store, "front", "x", "y") _
    fold(pts.filter(col("x") < 20), 0L)
    val after0 = store.read("front").collect().toSet
    fold(pts.filter(col("x") < 20), 0L) // at-least-once replay
    assert(store.read("front").collect().toSet == after0, "replay changed state")
    fold(pts.filter(col("x") >= 20), 1L)
    // each partition is itself a front: no row dominated within it
    for (b <- Seq(0L, 1L)) {
      val part = store.read("front").filter(col("__applied") === b)
        .select(col("x"), col("y"))
      val re = Skyline.paretoFront2d(part, "x", "y")
      assert(re.count() == part.count(), s"partition $b holds dominated rows")
    }
  }

  test("a dominated point never re-enters after its dominator arrives") {
    val store = new TableStore(s, Files.createTempDirectory("graft_ssky3").toString)
    val fold = StreamSkyline.applyBatch(store, "front", "x", "y") _
    fold(Seq((1L, 1L)).toDF("x", "y"), 0L) // on the front, alone
    fold(Seq((5L, 5L)).toDF("x", "y"), 1L) // dominates it
    fold(Seq((2L, 2L)).toDF("x", "y"), 2L) // also dominated on arrival
    val got = StreamSkyline.currentFront(store, "front")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 5L)))
  }
}
