package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.IncrementalAgg
import graft.sources.TableStore

/** Streaming incremental view maintenance — the streaming twin of the
  * batch delta-fold (`c7_delta_agg`): each micro-batch aggregates to a
  * per-group delta and folds into the stored (count, decimal-sum) state
  * via [[IncrementalAgg.merge]], so a refresh shuffles only the
  * micro-batch, never the history. Because the state is DECIMAL and the
  * merge order-independent, a stream of N micro-batches ends
  * bit-identical to re-aggregating everything one-shot — the invariant
  * that makes a continuously-maintained view trustworthy at 100 TB.
  *
  * Unlike a built-in streaming aggregation (whose state lives inside the
  * state store, opaque to batch consumers), the state here is the plain
  * warehouse table every batch query already reads — the view stays
  * queryable mid-stream with the same [[IncrementalAgg.present]] shape.
  */
object ViewMaintain {

  /** Maintain `table` as the running aggregate of `stream` grouped by
    * `keys` with decimal sums over `sumCols`.
    *
    * Replay-safe: `foreachBatch` is at-least-once, so the fold must be
    * idempotent per batch id. The last applied id rides ON the state
    * rows themselves (`__applied`), so state and watermark commit in ONE
    * atomic overwrite — a replayed batch at or below it is a no-op
    * instead of a double-fold (which would silently double counts and
    * sums, breaking the stream==batch bit-identity this exists for).
    */
  def maintainer(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], sumCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, table, keys, sumCols)(batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing of replay semantics. */
  def applyBatch(store: TableStore, table: String, keys: Seq[String],
      sumCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.{col, lit, max}
    val lastApplied =
      if (!store.exists(table)) -1L
      else {
        val r = store.read(table).agg(max(col("__applied"))).head()
        if (r.isNullAt(0)) -1L else r.getLong(0)
      }
    if (batchId > lastApplied) {
      val delta = IncrementalAgg.fromBatch(batch, keys, sumCols)
      val next =
        if (store.exists(table))
          IncrementalAgg.merge(store.read(table).drop("__applied"),
            delta, keys, sumCols)
        else delta
      store.overwrite(table, next.withColumn("__applied", lit(batchId)))
    }
  }
}
