package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Cdc
import graft.sources.TableStore

/** Streaming CDC mirror: maintain the current-state table of a CDC op
  * feed ([[Cdc.applyChanges]] semantics) as micro-batches arrive, so the
  * warehouse copy of a transactional source is continuously queryable
  * without ever replaying the feed's history.
  *
  * State rows keep their winning (seq, op) — deletes persist as
  * TOMBSTONES rather than disappearing. That is load-bearing for
  * correctness, not bookkeeping: CDC transports are only ordered per
  * key AT THE SOURCE, not across batches, so a delete may arrive in
  * batch N and a stale lower-seq update for the same key in batch N+1.
  * With the tombstone present, the fold (`latestRows(state ∪ batch)`,
  * associative by construction) discards the stale row; without it the
  * dead key would silently resurrect. [[present]] strips tombstones for
  * consumers; purge them by retention policy once the transport's
  * reordering horizon has passed (they are one row per deleted key —
  * bounded by key cardinality, not feed volume).
  *
  * Replay safety mirrors [[ViewMaintain]]: foreachBatch is
  * at-least-once, so the applied batch id rides on the state rows and
  * commits in the same atomic overwrite — a replayed batch is a no-op.
  * Each fold shuffles state + batch on the key; at very large key
  * cardinality the overwrite is the cost of keeping the mirror a plain
  * table every batch query can read (a keyed-merge sink would trade
  * that for sink-side compaction).
  */
object StreamCdc {

  def maintainer(stream: DataFrame, store: TableStore, table: String,
      keys: Seq[String], seqCol: String, opCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, table, keys, seqCol, opCol)(batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing of replay and
    * cross-batch reordering semantics.
    */
  def applyBatch(store: TableStore, table: String, keys: Seq[String],
      seqCol: String, opCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val lastApplied =
      if (!store.exists(table)) -1L
      else {
        val r = store.read(table).agg(max(col("__applied"))).head()
        if (r.isNullAt(0)) -1L else r.getLong(0)
      }
    if (batchId > lastApplied) {
      val collapsed = Cdc.latestRows(batch, keys, seqCol, opCol)
      val next =
        if (store.exists(table))
          Cdc.latestRows(
            store.read(table).drop("__applied").unionByName(collapsed),
            keys, seqCol, opCol)
        else collapsed
      store.overwrite(table, next.withColumn("__applied", lit(batchId)))
    }
  }

  /** Consumer view of the mirror: tombstones and bookkeeping removed —
    * the same shape batch [[Cdc.applyChanges]] produces.
    */
  def present(state: DataFrame, seqCol: String, opCol: String): DataFrame =
    state.filter(col(opCol) =!= "D").drop(seqCol, opCol, "__applied")
}
