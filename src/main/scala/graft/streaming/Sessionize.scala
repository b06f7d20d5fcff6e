package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/** Gap-based sessionization over the events shape, in both execution
  * models:
  *
  *  - [[batchSessions]]: windowed lag/cumsum plan — one shuffle on
  *    user_id, ANSI-SQL-expressible (oracle-checkable).
  *  - [[streamingSessions]]: `flatMapGroupsWithState` with event-time
  *    timeout — bounded per-user state on an unbounded stream; a session
  *    is emitted when a later event closes it or when the watermark passes
  *    its gap window.
  *
  * Both define a session identically: consecutive events of one user with
  * gaps ≤ `gapSec`, summarized as (user_id, start_s, end_s, n) in epoch
  * seconds.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  final case class OpenSession(startS: Long, endS: Long, n: Long)
  final case class SessionOut(user_id: Long, start_s: Long, end_s: Long, n: Long)

  /** Batch: lag → new-session flag → running session index → aggregate.
    * Ordered by (epoch second, event_id) so the plan is reproducible on
    * any ANSI engine regardless of sub-second timestamp precision.
    */
  def batchSessions(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val withFlag = events
      .select(col("user_id"), col("event_id"),
        col("ts").cast(LongType).as("ts_s"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withFlag
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_s")).as("start_s"),
        max(col("ts_s")).as("end_s"),
        count(lit(1)).cast(LongType).as("n"))
      .select(col("user_id"), col("session_idx"), col("start_s"),
        col("end_s"), col("n"))
  }

  /** Streaming: per-user open-session state; events extend or close it,
    * the event-time timeout flushes it once the watermark passes.
    */
  def streamingSessions(events: DataFrame, gapSec: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionFn(gapSec))
  }

  private def sessionFn(gapSec: Long)(
      userId: Long, events: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption
        .map(s => SessionOut(userId, s.startS, s.endS, s.n)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val s = e.ts.getTime / 1000
      open match {
        case Some(o) if s - o.endS <= gapSec =>
          open = Some(o.copy(endS = s, n = o.n + 1))
        case Some(o) =>
          closed += SessionOut(userId, o.startS, o.endS, o.n)
          open = Some(OpenSession(s, s, 1))
        case None =>
          open = Some(OpenSession(s, s, 1))
      }
    }
    open.foreach { o =>
      state.update(o)
      // flush when event time moves past the session's gap window
      state.setTimeoutTimestamp((o.endS + gapSec) * 1000 + 1)
    }
    closed.result().iterator
  }
}
