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
    */
  def maintainer(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], sumCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val delta = IncrementalAgg.fromBatch(batch.toDF(), keys, sumCols)
        val next =
          if (store.exists(table))
            IncrementalAgg.merge(store.read(table), delta, keys, sumCols)
          else delta
        store.overwrite(table, next)
      }
}
