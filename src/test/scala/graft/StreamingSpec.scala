package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.streaming.{EventStream, StreamDedup, StreamSketch}

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

  test("stream-stream click->purchase join == batch join") {
    val events = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ss").toString
    events.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = EventStream.readEventStream(spark, dir)
    val joined = EventStream.clickToPurchase(
      stream.filter(col("event_type") === "click").withWatermark("ts", "2 hours"),
      stream.filter(col("event_type") === "purchase").withWatermark("ts", "2 hours"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ss_join_test")
    val want = EventStream.clickToPurchase(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming dedup keeps one row per fingerprint across micro-batches") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    // two files => two micro-batches: duplicates split across batches must
    // still collapse (dedup state survives between triggers)
    docs.repartition(2).write.mode("overwrite").parquet(dir)

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamDedup.dedupStream(stream, "ts", "text", "1 hour")
      .select("fp")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("dedup_test").select("fp")
    val want = docs.select(md5(col("text")).as("fp")).distinct()
    assert(got.count() == want.count(), "one surviving row per distinct text")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming hll registers == batch registers == the batch sketch operator") {
    val events = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    // 3 files => 3 micro-batches: register maxima must max-merge across
    // triggers (the sketch's partition-union property, now over time)
    events.repartition(3).write.mode("overwrite").parquet(dir)

    val q = EventStream.startMemorySink(
      StreamSketch.streamingDailyRegisters(
        EventStream.readEventStream(spark, dir)),
      "hll_stream_test")
    q.awaitTermination()

    val got = spark.table("hll_stream_test")
    val want = StreamSketch.dailyUserRegisters(events)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // and the shared transform agrees with the batch sketch operator
    val op = graft.operators.Sketches.hllRegistersBy(
      events.select(date_trunc("day", col("ts")).as("day"), col("user_id")),
      "user_id", Seq("day"), b = 4)
    val shared = want.withColumnRenamed("day", "d")
    assert(shared.join(op,
      shared("d") === op("day") && shared("register") === op("register") &&
        shared("m_rho") === op("m_rho")).count() == op.count())
  }

  test("streaming kmv bottom-k sketch == batch sketch across micro-batches") {
    val events = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    // 3 files => 3 micro-batches: the TreeSet buffers must dedup and
    // bottom-k-merge across triggers exactly as across partitions
    events.repartition(3).write.mode("overwrite").parquet(dir)

    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        graft.operators.Sketches.hash52(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(call_function("kmv_sketch", col("h"), lit(16)).as("sk"))

    val q = sketch(EventStream.readEventStream(spark, dir))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("kmv_stream_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("kmv_stream_test")
    val want = sketch(events)
    assert(got.count() == want.count() && want.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
