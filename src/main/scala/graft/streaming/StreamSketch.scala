package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming sketch maintenance: per-day distinct-user HyperLogLog
  * registers kept by Structured Streaming itself — the bounded-state
  * answer to "distinct users per day, forever, on an unbounded stream",
  * where exact streaming COUNT(DISTINCT) would grow state with the key
  * domain.
  *
  * The register transform is SHARED between batch and stream (same md5
  * hash family as [[graft.operators.Sketches.hllRegistersBy]], same
  * output — StreamingSpec pins stream == batch == the batch operator):
  * per-row register/rank computation is a stateless projection, and the
  * only stateful op is `max(rho)` grouped by (event-time day window,
  * register) — ≤ m rows of state per day, monotone (a register max never
  * retracts), so watermarked append/update sinks and the Complete-mode
  * test sink all agree. Late events beyond the watermark are dropped
  * exactly as the hourly rollup drops them.
  */
object StreamSketch {

  /** Shared batch/stream transform over the events shape: one row per
    * (day, register) with the register's max rank. `b` register-index
    * bits as in [[graft.operators.Sketches.hllRegistersBy]].
    */
  def dailyUserRegisters(events: DataFrame, b: Int = 4): DataFrame = {
    val m = 1L << b
    val wBits = 60 - b
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast(LongType)
    events
      .select(col("ts"), h.as("__h"))
      .select(col("ts"),
        pmod(col("__h"), lit(m)).cast(LongType).as("register"),
        expr(s"__h DIV $m").cast(LongType).as("__w"))
      .select(col("ts"), col("register"),
        when(col("__w") === 0, lit(wBits + 1))
          .otherwise(instr(lpad(bin(col("__w")), wBits, "0"), "1"))
          .cast(LongType).as("rho"))
      .groupBy(
        window(col("ts"), "1 day").getField("start").as("day"),
        col("register"))
      .agg(max(col("rho")).cast(LongType).as("m_rho"))
  }

  /** Watermarked streaming form: 2-hour lateness bound, state stays
    * ≤ m registers per open day window.
    */
  def streamingDailyRegisters(events: DataFrame, b: Int = 4): DataFrame =
    dailyUserRegisters(events.withWatermark("ts", "2 hours"), b)
}
