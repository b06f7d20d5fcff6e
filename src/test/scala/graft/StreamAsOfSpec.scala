package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.AsOfJoin
import graft.sources.Tables
import graft.streaming.{EventStream, StreamAsOf}

/** Streaming as-of attribution vs the batch asOfBackward plan: every
  * attribution the stream emits must equal the batch answer for that
  * purchase (the stream may still hold purchases the watermark hasn't
  * passed — those are exactly the batch rows it hasn't emitted).
  */
class StreamAsOfSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("streaming attribution == batch as-of on every emitted purchase") {
    val events = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft_asof").toString
    // two time-ordered files => two micro-batches: state (dominant click,
    // pending purchases) must carry across the trigger boundary
    val mid = events.agg(expr("percentile(CAST(ts AS DOUBLE), 0.5)"))
      .head().getDouble(0)
    events.filter(col("ts").cast("double") <= mid)
      .coalesce(1).write.mode("append").parquet(dir)
    events.filter(col("ts").cast("double") > mid)
      .coalesce(1).write.mode("append").parquet(dir)

    val q = StreamAsOf.attribute(EventStream.readEventStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("asof_test")
      .select("event_id", "ts_us", "click_us")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val batch = AsOfJoin.asOfBackward(purchases, clicks, "user_id", "ts", "ts")
      .select(col("event_id"), unix_micros(col("ts")),
        unix_micros(col("asof.ts")))
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(streamed.nonEmpty, "watermark advance must finalize some purchases")
    val wrong = streamed.filter { case (id, got) => batch.get(id) != Some(got) }
    assert(wrong.isEmpty, s"stream disagrees with batch: ${wrong.take(3)}")
    // unemitted purchases are exactly the ones the watermark hasn't passed
    assert((batch.keySet -- streamed.keySet).size < batch.size,
      "most purchases should have been finalized")
  }

  test("streaming time-to-convert == windowed batch asOfForward on every emitted click") {
    val events = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft_conv").toString
    val mid = events.agg(expr("percentile(CAST(ts AS DOUBLE), 0.5)"))
      .head().getDouble(0)
    events.filter(col("ts").cast("double") <= mid)
      .coalesce(1).write.mode("append").parquet(dir)
    events.filter(col("ts").cast("double") > mid)
      .coalesce(1).write.mode("append").parquet(dir)

    val win = java.time.Duration.ofHours(24)
    val q = StreamAsOf.timeToConvert(
        EventStream.readEventStream(spark, dir), win)
      .writeStream.outputMode("append").format("memory")
      .queryName("conv_test").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("conv_test")
      .select("event_id", "ts_us", "purchase_us")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val batch = AsOfJoin.asOfForward(clicks, purchases, "user_id", "ts", "ts")
      .select(col("event_id"), unix_micros(col("ts")), unix_micros(col("asof.ts")))
      .as[(Long, Long, Option[Long])].collect()
      .map { case (id, c, p) =>
        // the stream resolves within the conversion window only
        id -> ((c, p.filter(_ - c <= win.toMillis * 1000)))
      }.toMap

    assert(streamed.nonEmpty, "watermark advance must finalize some clicks")
    val wrong = streamed.filter { case (id, got) => batch.get(id) != Some(got) }
    assert(wrong.isEmpty, s"stream disagrees with batch: ${wrong.take(3)}")
    assert(streamed.values.exists(_._2.nonEmpty), "some clicks must convert")
    assert(streamed.values.exists(_._2.isEmpty),
      "some clicks must finalize unconverted (window proof)")
  }

  test("maxClickAge binds at emit even when the watermark jumps past expiry and purchase together") {
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("graft_asof_ttl").toString
    def ts(s: String) = Timestamp.valueOf(s)
    // one file = one micro-batch: the first batch runs at watermark 0 and
    // holds everything in state; the trailing no-data batch then sees the
    // watermark jump straight to 10:00 — past BOTH the click's 30-minute
    // TTL and both purchases — so TTL-by-state-eviction alone never runs
    // before emission, and only an emit-time TTL can null the late one.
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "click", 0.0, "{}"),
      (2L, ts("2024-01-01 00:10:00"), 10L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-01 01:00:00"), 10L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 99L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)

    val q = StreamAsOf.attribute(
      EventStream.readEventStream(spark, dir),
      watermark = "0 seconds",
      maxClickAge = Some(java.time.Duration.ofMinutes(30)))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("asof_ttl_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("asof_ttl_test")
      .select("event_id", "click_us")
      .as[(Long, Option[Long])].collect().toMap
    val clickUs = ts("2024-01-01 00:00:00").getTime * 1000
    assert(got.get(2L) == Some(Some(clickUs)),
      s"purchase 10 min after the click is inside the TTL: $got")
    assert(got.get(3L) == Some(None),
      s"purchase 60 min after the click must attribute to nothing under a 30-min TTL: $got")
  }
}
