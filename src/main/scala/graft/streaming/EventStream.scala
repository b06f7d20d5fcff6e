package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.Cleaning.{dsum, lcount}

/** Structured Streaming over the `events` table shape.
  *
  * The reference is batch-only, but its Load_id protocol is exactly a
  * micro-batch contract (SURVEY.md §2.12): every transform here is a pure
  * `DataFrame => DataFrame` shared between batch and stream, so a parquet
  * batch and a readStream feed the same logic.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared batch/stream transform: hourly per-type rollup. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_ts"),
        col("event_type"))
      .agg(lcount().as("n"), dsum(col("value")).as("total_value"))

  /** Streaming source over a parquet directory of event files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Watermarked streaming rollup: late events beyond 2 hours are dropped,
    * state is bounded — the config that holds on an unbounded stream.
    */
  def streamingHourly(events: DataFrame): DataFrame =
    hourlyRollup(events.withWatermark("ts", "2 hours"))

  /** Shared batch/stream transform: correlate each click with the
    * purchases the same user makes within the next hour. The join has an
    * equi-key (user) plus a TWO-SIDED event-time bound — exactly the
    * condition a stream-stream join needs so Structured Streaming can
    * expire buffered state on both sides once the watermarks pass.
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    c.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("click_ts") &&
        col("p_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_ts"), col("p_ts"))
  }

  /** Drive a streaming rollup into an in-memory sink (used by tests and
    * local smoke runs; swap format for a real sink in production).
    */
  def startMemorySink(df: DataFrame, name: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
}
