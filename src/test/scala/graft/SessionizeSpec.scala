package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{EventStream, Sessionize}

/** Stateful streaming sessionization vs the batch window plan: both
  * definitions of a gap session must agree on every session the stream
  * has closed (the stream may still hold one open session per user when
  * input ends — those are exactly the batch sessions it hasn't emitted).
  */
class SessionizeSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("flatMapGroupsWithState sessions == batch sessions (closed set)") {
    val events = Tables.events(spark, sfDir)
    val dir = Files.createTempDirectory("graft_sess").toString
    events.coalesce(1).write.mode("overwrite").parquet(dir)

    val q = Sessionize
      .streamingSessions(EventStream.readEventStream(spark, dir), 1800L)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("sessions_test")
      .select("user_id", "start_s", "end_s", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sessionize.batchSessions(events, 1800L)
      .select("user_id", "start_s", "end_s", "n")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(streamed.nonEmpty, "stream must close at least one session")
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch: ${missing.take(3)}")
    // everything the stream hasn't emitted is an open (last) session:
    // at most one per user, and each is a real batch session
    val open = batch -- streamed
    assert(open.groupBy(_._1).forall(_._2.size == 1),
      "at most one unflushed session per user")
  }
}
