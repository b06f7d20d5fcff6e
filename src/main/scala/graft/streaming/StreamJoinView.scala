package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.IncrementalJoin
import graft.sources.TableStore

/** Streaming JOIN-view maintenance — the streaming twin of
  * `c9_delta_join_view` ([[graft.operators.IncrementalJoin]]), sharing
  * [[ViewMaintain]]'s store discipline.
  *
  * The stream carries TAGGED rows of both join sides (a `side` column,
  * 'a' or 'b' — the shape a multiplexed CDC feed or a two-topic union
  * produces). Each micro-batch fold appends three batch-keyed
  * partitions: the batch's A-rows to the A log, its B-rows to the B log,
  * and the view delta ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB to the view log — per-batch
  * write volume is O(batch + new matches), and the view is continuously
  * queryable as a plain table (union of its partitions) without ever
  * re-joining history against history. At warehouse scale the side logs
  * are what a bucketed-by-join-key layout co-locates; compact with
  * [[TableStore.compact]] as batch partitions accumulate.
  *
  * Replay safety (foreachBatch is at-least-once) rests on ONE rule: the
  * fold only ever reads side partitions with `__applied < batchId`. A
  * crashed attempt may have appended this batch's side partitions
  * already, but the replay's delta computation prunes them, so ΔV is
  * reconstructed identically and its partition replacement is
  * idempotent. The view partition lands LAST and is the applied marker;
  * its presence implies the side partitions landed too.
  * `checkpointDir` is REQUIRED for the batch-id-durability reason
  * documented on [[StreamDedup.nearDupMaintainer]].
  */
object StreamJoinView {

  def maintainer(stream: DataFrame, store: TableStore, checkpointDir: String,
      aTable: String, bTable: String, viewTable: String,
      sideCol: String, keys: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, aTable, bTable, viewTable, sideCol, keys)(
          batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing. The batch's A-rows
    * keep every non-null A column, B-rows every non-null B column (the
    * tagged union is ragged: each side's own columns are set, the other
    * side's are null — [[split]] reprojects them).
    */
  def applyBatch(store: TableStore, aTable: String, bTable: String,
      viewTable: String, sideCol: String, keys: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    Seq(aTable, bTable, viewTable).foreach(store.recoverPartitions)
    val lastApplied =
      if (!store.exists(viewTable)) -1L
      else {
        val r = store.read(viewTable)
          .agg(max(col("__applied").cast("long"))).head()
        if (r.isNullAt(0)) -1L else r.getLong(0)
      }
    if (batchId > lastApplied) {
      val aDelta = split(batch, sideCol, "a", keys).localCheckpoint()
      val bDelta = split(batch, sideCol, "b", keys).localCheckpoint()
      def priorSide(table: String, like: DataFrame): DataFrame =
        if (!store.exists(table)) like.limit(0)
        else store.read(table)
          .filter(col("__applied").cast("long") < batchId).drop("__applied")
      val aOld = priorSide(aTable, aDelta)
      val bOld = priorSide(bTable, bDelta)
      val dv = IncrementalJoin.delta(aOld, aDelta, bOld, bDelta, keys)
      store.replacePartitions(aTable,
        aDelta.withColumn("__applied", lit(batchId)), "__applied")
      store.replacePartitions(bTable,
        bDelta.withColumn("__applied", lit(batchId)), "__applied")
      store.replacePartitions(viewTable,
        dv.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** One side's rows of the tagged union, reprojected to its own
    * columns: the join keys plus every column that is non-null anywhere
    * on this side is kept; columns that are entirely the OTHER side's
    * (all-null here) are dropped by name convention — side columns are
    * prefixed `a_`/`b_` (keys unprefixed).
    */
  private def split(batch: DataFrame, sideCol: String, side: String,
      keys: Seq[String]): DataFrame = {
    val own = batch.columns.filter(c =>
      keys.contains(c) || c.startsWith(s"${side}_"))
    batch.filter(col(sideCol) === side)
      .select(own.map(col).toIndexedSeq: _*)
  }
}
