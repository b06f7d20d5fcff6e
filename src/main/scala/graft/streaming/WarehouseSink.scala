package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.{Staging, TableStore}

/** Stream → warehouse adapter (SURVEY.md §2.12): the reference's Load_id
  * batch protocol IS a micro-batch contract, so a stream feeds the exact
  * same staging path as a batch load — `foreachBatch` turns every
  * micro-batch into one lineage-stamped, guard-checked Load_id batch, and
  * any per-batch warehouse stage (dim merge, fact append) runs behind it
  * unchanged.
  */
object WarehouseSink {

  /** Write a stream into the raw staging table, one Load_id per
    * micro-batch, then run `afterBatch(loadId)` (e.g. dim/fact stages).
    */
  def stagingLoader(stream: DataFrame, store: TableStore, table: String)(
      afterBatch: Int => Unit = _ => ()): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val loadId = batchId.toInt + 1
        Staging.stageAppend(store, table, batch.toDF(), loadId)
        afterBatch(loadId)
      }
}
