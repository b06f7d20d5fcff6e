package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Stats
import graft.sources.TableStore
import graft.streaming.StreamSketch

/** Streaming decision-stump tuner: the folded score-count store (the
  * same mergeable statistic as the AUC monitor) must read out the exact
  * one-shot [[Stats.giniStump]] row in ANY arrival order — the
  * maintained threshold is the one-shot threshold by construction.
  */
class StreamStumpSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def rows = (0 until 240).map { i =>
    (i.toLong, (i * 53) % 17, i % 4 != 0)
  }.toDF("id", "score", "y")

  test("3-batch fold reads out the one-shot stump exactly, both arrival orders") {
    val oneShot = Stats.giniStump(
      Stats.scoreClassCounts(rows, col("score"), col("y"))).head()
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val store = new TableStore(s,
        Files.createTempDirectory("graft_sstump").toString)
      val fold = StreamSketch.applyScoreCounts(store, "stump", "score", "y") _
      // batchId stays the queue position; `order` permutes which id-hash
      // slice arrives in it, so cross-batch merge order is exercised
      order.zipWithIndex.foreach { case (slice, bid) =>
        fold(rows.filter(col("id") % 3 === slice), bid.toLong)
      }
      val streamed = Stats.giniStump(
        StreamSketch.mergedScoreCounts(store, "stump")).head()
      assert(streamed.getDouble(0) == oneShot.getDouble(0), s"order $order")
      assert(streamed.getLong(5) == oneShot.getLong(5), s"order $order")
      assert((streamed.getLong(1), streamed.getLong(2), streamed.getLong(3),
        streamed.getLong(4)) ==
        ((oneShot.getLong(1), oneShot.getLong(2), oneShot.getLong(3),
          oneShot.getLong(4))), s"order $order")
    }
  }

  test("single-batch pure-split feed: the tuner lands on the separating threshold") {
    val store = new TableStore(s,
      Files.createTempDirectory("graft_sstump2").toString)
    val sep = ((1 to 50).map(i => (i.toLong, 10, false)) ++
      (1 to 50).map(i => (100L + i, 20, true))).toDF("id", "score", "y")
    StreamSketch.applyScoreCounts(store, "stump", "score", "y")(sep, 0L)
    val r = Stats.giniStump(StreamSketch.mergedScoreCounts(store, "stump")).head()
    assert(r.getDouble(0) == 10.0 && r.getDouble(6) == 0.0,
      "perfectly separable feed must yield the zero-impurity threshold")
  }
}
