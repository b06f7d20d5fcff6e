package graft

import java.nio.file.Files

import graft.sources.Tables
import graft.streaming.EventStream

/** Structured Streaming over the events shape: the streaming hourly rollup
  * must agree with the batch rollup on the same data (shared transform,
  * SURVEY.md §2.12).
  */
class StreamingSpec extends SparkSpec {

  test("streaming hourly rollup == batch hourly rollup") {
    val events = Tables.events(spark, sfDir)
    // single file => single micro-batch => the watermark drops nothing
    val dir = Files.createTempDirectory("graft_events").toString
    events.coalesce(1).write.mode("overwrite").parquet(dir)

    val q = EventStream.startMemorySink(
      EventStream.streamingHourly(EventStream.readEventStream(spark, dir)),
      "hourly_test")
    q.awaitTermination()

    val got = spark.table("hourly_test")
    val want = EventStream.hourlyRollup(events)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
