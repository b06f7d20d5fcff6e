package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication at ingest — the streaming face of
  * [[graft.operators.Dedup.exactGroups]] (same md5-fingerprint family).
  *
  * Scale shape: state is keyed by fingerprint and evicted once the
  * watermark passes `horizon` beyond a key's first arrival
  * (`dropDuplicatesWithinWatermark`), so memory is bounded by the dedup
  * horizon × ingest rate, not by corpus size. A duplicate arriving after
  * the horizon re-emits — the standard bounded-state tradeoff; exact
  * global dedup stays a batch job ([[graft.operators.Dedup]]).
  */
object StreamDedup {

  /** Fingerprint the payload and keep the first arrival per fingerprint
    * within the watermark horizon. Works on a watermark-able stream;
    * `tsCol` is the event-time column the watermark advances on.
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      horizon: String): DataFrame =
    docs
      .withColumn("fp", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
