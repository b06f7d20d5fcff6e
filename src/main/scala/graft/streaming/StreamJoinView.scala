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
  * re-joining history against history. The side logs are hash-bucketed
  * on the join key inside each batch partition, so a fold's delta joins
  * read only the buckets the batch touches — O(touched-bucket state)
  * per refresh, not O(all history); compact with [[TableStore.compact]]
  * as batch partitions accumulate.
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
      sideCol: String, keys: Seq[String], nBuckets: Int = 64): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, aTable, bTable, viewTable, sideCol, keys, nBuckets)(
          batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing. The batch's A-rows
    * keep every non-null A column, B-rows every non-null B column (the
    * tagged union is ragged: each side's own columns are set, the other
    * side's are null — [[split]] reprojects them).
    *
    * The side logs are HASH-BUCKETED on the join key inside each batch
    * partition (`__applied=N/__bucket=K/` — [[TableStore
    * .replacePartitions]]' nested layout, the same key-bucket discipline
    * as [[StreamCdc]]): matching keys share a bucket, so the fold reads
    * only the buckets the batch's own keys touch — per-batch READ volume
    * is O(touched-bucket state), not O(all history), while appends stay
    * O(batch) and replacement atomicity stays per batch partition.
    */
  def applyBatch(store: TableStore, aTable: String, bTable: String,
      viewTable: String, sideCol: String, keys: Seq[String],
      nBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(viewTable)
    if (batchId > lastApplied) {
      val bucketOf =
        pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).cast("int")
      // ONE materialization of the batch (splits re-filter it in memory):
      // two per-side checkpoints recomputed the batch lineage twice
      val pinned = batch.withColumn("__bucket", bucketOf).localCheckpoint()
      val aDelta = split(pinned, sideCol, "a", keys, extra = Seq("__bucket"))
      val bDelta = split(pinned, sideCol, "b", keys, extra = Seq("__bucket"))
      // the touched-bucket list only prunes PRIOR state — with no store
      // yet (the common first fold) the collect is pure overhead
      lazy val touched = pinned.select(col("__bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      def priorSide(table: String, like: DataFrame): DataFrame =
        if (!store.exists(table)) like.limit(0).drop("__bucket")
        else store.read(table)
          .filter(col("__bucket").isInCollection(touched))
          .filter(col("__applied").cast("long") < batchId)
          .drop("__applied", "__bucket")
      val aOld = priorSide(aTable, aDelta)
      val bOld = priorSide(bTable, bDelta)
      val dv = IncrementalJoin.delta(
        aOld, aDelta.drop("__bucket"), bOld, bDelta.drop("__bucket"), keys)
      // the side logs are independent tables — land them concurrently;
      // the view partition (the applied marker) still lands strictly last
      sideBySide(
        () => store.replacePartitions(aTable,
          aDelta.withColumn("__applied", lit(batchId)), "__applied", Seq("__bucket")),
        () => store.replacePartitions(bTable,
          bDelta.withColumn("__applied", lit(batchId)), "__applied", Seq("__bucket")))
      store.replacePartitions(viewTable,
        dv.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** Run two independent store writes concurrently (different tables, so
    * different tmp dirs and manifest streams); rethrows the first
    * failure after both settle — a half-landed side pair is safe because
    * the view partition, the fold's applied marker, never landed.
    */
  private def sideBySide(a: () => Unit, b: () => Unit): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a())
    b()
    Await.result(fa, Duration.Inf)
  }

  /** CDC form: the tagged stream also carries an op column ('I' insert,
    * 'D' delete), and the fold flows deletes through the join as −1
    * weights ([[IncrementalJoin.weightedDelta]] — the streaming
    * `c10_retract_join_view`): deleting a side row appends a −1 row to
    * its log and the view delta retracts exactly the pairs that row once
    * produced, the ΔA⋈ΔB cross term netting a double-sided delete to
    * zero once. Readers collapse the view log with
    * `IncrementalJoin.present(store.read(viewTable).drop("__applied"))`
    * — the batch partition column must be dropped first or +1/−1 rows
    * of the same pair land in different groups and never net.
    * Same bucket pruning, same replay rule
    * (only side partitions with `__applied < batchId` are read). The
    * feed must be consistent (delete only what was inserted) — weights,
    * like any counting IVM, track the feed's algebra rather than
    * validate it.
    */
  def cdcMaintainer(stream: DataFrame, store: TableStore, checkpointDir: String,
      aTable: String, bTable: String, viewTable: String,
      sideCol: String, opCol: String, keys: Seq[String],
      nBuckets: Int = 64): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyCdcBatch(store, aTable, bTable, viewTable, sideCol, opCol, keys,
          nBuckets)(batch.toDF(), batchId)
      }

  /** The per-batch weighted fold, exposed for direct testing. */
  def applyCdcBatch(store: TableStore, aTable: String, bTable: String,
      viewTable: String, sideCol: String, opCol: String, keys: Seq[String],
      nBuckets: Int = 64)(batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(viewTable)
    if (batchId > lastApplied) {
      val bucketOf =
        pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).cast("int")
      val pinned = batch
        .withColumn("w", when(col(opCol) === "D", lit(-1)).otherwise(lit(1)))
        .withColumn("__bucket", bucketOf).localCheckpoint()
      val aDelta = split(pinned, sideCol, "a", keys, extra = Seq("w", "__bucket"))
      val bDelta = split(pinned, sideCol, "b", keys, extra = Seq("w", "__bucket"))
      lazy val touched = pinned.select(col("__bucket"))
        .distinct().collect().map(_.getInt(0)).toSeq
      def priorSide(table: String, like: DataFrame): DataFrame =
        if (!store.exists(table)) like.limit(0).drop("__bucket")
        else store.read(table)
          .filter(col("__bucket").isInCollection(touched))
          .filter(col("__applied").cast("long") < batchId)
          .drop("__applied", "__bucket")
      val dv = IncrementalJoin.weightedDelta(
        priorSide(aTable, aDelta), aDelta.drop("__bucket"),
        priorSide(bTable, bDelta), bDelta.drop("__bucket"), keys, "w")
      sideBySide(
        () => store.replacePartitions(aTable,
          aDelta.withColumn("__applied", lit(batchId)), "__applied", Seq("__bucket")),
        () => store.replacePartitions(bTable,
          bDelta.withColumn("__applied", lit(batchId)), "__applied", Seq("__bucket")))
      store.replacePartitions(viewTable,
        dv.withColumn("__applied", lit(batchId)), "__applied")
    }
  }

  /** One side's rows of the tagged union, reprojected to its own
    * columns: the join keys plus every column that is non-null anywhere
    * on this side is kept; columns that are entirely the OTHER side's
    * (all-null here) are dropped by name convention — side columns are
    * prefixed `a_`/`b_` (keys unprefixed). `extra` names shared
    * passthrough columns (e.g. the CDC weight).
    */
  private def split(batch: DataFrame, sideCol: String, side: String,
      keys: Seq[String], extra: Seq[String] = Nil): DataFrame = {
    val own = batch.columns.filter(c =>
      keys.contains(c) || extra.contains(c) || c.startsWith(s"${side}_"))
    batch.filter(col(sideCol) === side)
      .select(own.map(col).toIndexedSeq: _*)
  }
}
