package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Stats
import graft.sources.TableStore
import graft.streaming.StreamSketch

/** Streaming feed-shift monitor: the folded per-time count store must
  * read out the exact one-shot CUSUM changepoint in any arrival order,
  * with batch writes bounded by the batch's distinct time buckets.
  */
class StreamTimeCountsSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // volume shifts 2 -> 8 rows/bucket after t=4
  private def rows = (0 until 200).map { i =>
    val t = if (i < 8) 1 + i / 2 else 5 + (i - 8) / 8
    (i.toLong, t)
  }.toDF("id", "t")

  test("3-batch fold reads out the one-shot changepoint exactly, both arrival orders") {
    val oneShot = Stats.cusumChangepoint(rows, col("t")).head()
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 1, 0))) {
      val store = new TableStore(s,
        Files.createTempDirectory("graft_stc").toString)
      val fold = StreamSketch.applyTimeCounts(store, "cp", "t") _
      order.zipWithIndex.foreach { case (slice, bid) =>
        fold(rows.filter(col("id") % 3 === slice), bid.toLong)
      }
      val streamed = Stats.cusumFromCounts(
        StreamSketch.mergedTimeCounts(store, "cp")).head()
      assert(streamed.getInt(0) == oneShot.getInt(0), s"order $order")
      assert(streamed.getLong(4) == oneShot.getLong(4), s"order $order")
      assert((streamed.getLong(1), streamed.getLong(2), streamed.getLong(3)) ==
        ((oneShot.getLong(1), oneShot.getLong(2), oneShot.getLong(3))),
        s"order $order")
    }
  }

  test("write volume is batch-bucket bounded; replay is a no-op") {
    val store = new TableStore(s, Files.createTempDirectory("graft_stc2").toString)
    val fold = StreamSketch.applyTimeCounts(store, "cp", "t") _
    fold(rows.filter(col("id") < 100), 0L)
    val b0 = store.read("cp").filter(col("__applied") === 0).collect().toSet
    assert(b0.size <= 17, s"batch 0 wrote ${b0.size} rows > distinct buckets")
    fold(rows.filter(col("id") >= 100), 1L)
    val all = store.read("cp").collect().toSet
    fold(rows.filter(col("id") >= 100), 1L) // at-least-once replay
    assert(store.read("cp").collect().toSet == all, "replay doubled counts")
  }
}
