package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Stats
import graft.sources.TableStore
import graft.streaming.StreamSketch

/** Streaming calibration monitor: the folded per-decile bin store (three
  * SUM-mergeable statistics) must read out the exact one-shot
  * reliability table in any arrival order, with batch writes bounded by
  * the bucket domain.
  */
class StreamCalibSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def rows = (0 until 300).map { i =>
    (i.toLong, (i * 17) % 1500, i % 5 != 0)
  }.toDF("id", "n", "y")

  test("3-batch fold reads out the one-shot calibration exactly, both arrival orders") {
    val oneShot = Stats.calibrationReadout(
      Stats.calibrationBins(rows, col("n"), col("y")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    for (order <- Seq(Seq(0, 1, 2), Seq(1, 2, 0))) {
      val store = new TableStore(s,
        Files.createTempDirectory("graft_scal").toString)
      val fold = StreamSketch.applyCalibBins(store, "calib", "n", "y") _
      order.zipWithIndex.foreach { case (slice, bid) =>
        fold(rows.filter(col("id") % 3 === slice), bid.toLong)
      }
      val streamed = Stats.calibrationReadout(
        StreamSketch.mergedCalibBins(store, "calib"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
      assert(streamed == oneShot, s"order $order")
    }
  }

  test("write volume is bucket-domain bounded; replay is a no-op") {
    val store = new TableStore(s, Files.createTempDirectory("graft_scal2").toString)
    val fold = StreamSketch.applyCalibBins(store, "calib", "n", "y") _
    fold(rows.filter(col("id") < 150), 0L)
    val b0 = store.read("calib").filter(col("__applied") === 0).collect().toSet
    assert(b0.size <= 11, s"batch 0 wrote ${b0.size} rows > bucket domain")
    fold(rows.filter(col("id") >= 150), 1L)
    val all = store.read("calib").collect().toSet
    fold(rows.filter(col("id") >= 150), 1L) // at-least-once replay
    assert(store.read("calib").collect().toSet == all, "replay doubled bins")
  }
}
