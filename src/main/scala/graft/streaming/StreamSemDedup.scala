package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Similarity
import graft.sources.TableStore

/** Streaming SemDeDup maintenance — the streaming face of
  * `embed_semdedup`: new embedding batches fold into a persisted,
  * cluster-partitioned member store carrying each vector's kept flag,
  * with nothing re-clustered and nothing ever comparing
  * new × all-history.
  *
  * Coarse centroids are a FROZEN broadcast k-row frame (trained once,
  * versioned separately — re-clustering is a batch rebuild, the same
  * contract [[StreamAnn]] pins for its quantizer). The member store is
  * partitioned `__applied=batch/cid=centroid/`, so a fold's duplicate
  * probe reads prune at the directory level to the clusters the batch
  * actually touches: per-batch READ volume is O(touched-cluster state),
  * write volume O(batch).
  *
  * Duplicate rule (arrival-order greedy, the streaming instance of the
  * batch twin's keep-lowest-id rule): a vector is dropped iff some
  * same-cluster vector with PRECEDENCE over it — an earlier batch, or
  * the same batch with a lower vec_id — sits at cosine ≥ τ. Dropped
  * members still land in the store (kept = 0) and still serve as dedup
  * witnesses for later arrivals, exactly as the batch rule's lower-id
  * witnesses do regardless of their own kept flag; that is what makes
  * the maintained store equal a pure batch replay under any batching of
  * the same arrival order.
  *
  * Replay safety: the batch's member rows land LAST (single store), so
  * their `__applied` id doubles as the applied marker —
  * [[TableStore.lastAppliedBatch]] short-circuits an at-least-once
  * replay, and a half-landed crash re-folds against `__applied <
  * batchId` state only (the [[StreamJoinView]] rule).
  */
object StreamSemDedup {

  def maintainer(stream: DataFrame, store: TableStore, checkpointDir: String,
      table: String, centroids: DataFrame, tau: Double): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, table, centroids, tau)(batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing. `batch` carries
    * (vec_id, v: array<double>); `centroids` (cid, cv: array<double>).
    */
  def applyBatch(store: TableStore, table: String, centroids: DataFrame,
      tau: Double)(batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(table)
    if (batchId > lastApplied) {
      val cents = centroids
        .withColumn("n2c", Similarity.dotNative(col("cv"), col("cv")))
      // home assignment: one map-side projection against the broadcast
      // centroid frame; zero-norm vectors have no cosine direction
      // (their NaN would sort above every real centroid) — dropped, as
      // at the ANN maintainer's door
      val home = batch
        .withColumn("n2", Similarity.dotNative(col("v"), col("v")))
        .filter(col("n2") > 0d)
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("v"), col("cid"),
          round(Similarity.dotNative(col("v"), col("cv")) /
            (sqrt(col("n2")) * sqrt(col("n2c"))), 12).as("cs"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cs").desc, col("cid"))))
        .filter(col("r") === 1)
        .select(col("vec_id"), col("cid"), col("v"))
        .localCheckpoint() // consumed 4× below (witness joins + the write)
      val touched = home.select(col("cid")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val hist =
        if (!store.exists(table))
          home.select(col("vec_id").as("uid"), col("cid"), col("v").as("vu")).limit(0)
        else store.read(table)
          .filter(col("cid").isInCollection(touched))
          .filter(col("__applied").cast("long") < batchId)
          .select(col("vec_id").as("uid"), col("cid"), col("v").as("vu"))
      def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        round(Similarity.dotNative(a, b) /
          (sqrt(Similarity.dotNative(a, a)) * sqrt(Similarity.dotNative(b, b))), 12)
      // witnesses with precedence: any earlier-batch member in the same
      // cluster, or a lower-id vector of this batch
      val histDup = home.join(hist, Seq("cid"))
        .filter(cos(col("v"), col("vu")) >= tau)
        .select(col("vec_id"))
      val a = home.select(col("cid"), col("vec_id").as("ua"), col("v").as("xa"))
      val batchDup = home.join(a, Seq("cid"))
        .filter(col("ua") < col("vec_id") && cos(col("xa"), col("v")) >= tau)
        .select(col("vec_id"))
      val dropped = histDup.unionByName(batchDup).distinct()
        .withColumn("d", lit(0L))
      val out = home.join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"),
          coalesce(col("d"), lit(1L)).as("kept"), col("v"))
      store.replacePartitions(table,
        out.withColumn("__applied", lit(batchId)), "__applied", Seq("cid"))
    }
  }
}
