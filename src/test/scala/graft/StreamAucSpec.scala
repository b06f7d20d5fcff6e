package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Stats
import graft.sources.TableStore
import graft.streaming.StreamSketch

/** Streaming AUC monitor: the folded score-count store must read out
  * the exact one-shot AUC (count linearity), bound per-batch writes by
  * the batch's distinct scores, and treat replays as no-ops.
  */
class StreamAucSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def rows = (0 until 200).map { i =>
    (i.toLong, (i * 37) % 23, i % 3 == 0)
  }.toDF("id", "score", "y")

  test("3-batch fold reads out the one-shot AUC exactly") {
    val store = new TableStore(s, Files.createTempDirectory("graft_sauc").toString)
    val fold = StreamSketch.applyScoreCounts(store, "auc", "score", "y") _
    (0 to 2).foreach(i => fold(rows.filter(col("id") % 3 === i), i.toLong))
    val streamed = Stats.aucFromCounts(
      StreamSketch.mergedScoreCounts(store, "auc")).head()
    val oneShot = Stats.aucExact(rows, col("score"), col("y")).head()
    assert(streamed.getLong(2) == oneShot.getLong(2))
    assert(streamed.getDouble(3) == oneShot.getDouble(3))
    assert(streamed.getLong(0) == oneShot.getLong(0))
  }

  test("write volume is batch-distinct-score bounded; replay is a no-op") {
    val store = new TableStore(s, Files.createTempDirectory("graft_sauc2").toString)
    val fold = StreamSketch.applyScoreCounts(store, "auc", "score", "y") _
    fold(rows.filter(col("id") < 100), 0L)
    val b0 = store.read("auc").filter(col("__applied") === 0).collect().toSet
    assert(b0.size <= 23, s"batch 0 wrote ${b0.size} rows > distinct scores")
    fold(rows.filter(col("id") >= 100), 1L)
    assert(store.read("auc").filter(col("__applied") === 0)
      .collect().toSet == b0, "a later fold rewrote batch 0's counts")
    val all = store.read("auc").collect().toSet
    fold(rows.filter(col("id") >= 100), 1L) // at-least-once replay
    assert(store.read("auc").collect().toSet == all, "replay doubled counts")
  }
}
