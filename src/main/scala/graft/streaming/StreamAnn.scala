package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.LongType

import graft.operators.Similarity
import graft.sources.TableStore

/** Streaming ANN index maintenance — the streaming face of
  * `embed_ann_incremental`: new embedding batches fold into a persisted
  * IVF inverted-list store and are searched against history as they
  * arrive, with nothing ever re-indexed and nothing ever comparing
  * new × all-history.
  *
  * The inverted index IS the partition layout: the list store is
  * partitioned `__applied=batch/cid=centroid/` ([[graft.sources
  * .TableStore.replacePartitions]]' nested form), so a fold's probe
  * reads prune at the directory level to the ≤ `probe` lists the batch
  * actually probes — per-batch READ volume is O(probed-list state),
  * write volume O(batch). Centroids are a fixed broadcast k-row frame
  * (the coarse quantizer is trained once and versioned separately, the
  * standard production IVF contract; re-training is a batch rebuild).
  *
  * Per fold: assign the batch's vectors to their nearest centroid
  * (map-side against the broadcast centroids), log each vector's top-k
  * cosine neighbors among history in its probed lists, append the
  * neighbor rows as one `__batch` partition, then append the batch's
  * list rows LAST — their `__applied` id is the applied marker, so
  * at-least-once replay short-circuits, and a half-landed crash replays
  * against the same pre-batch lists (`__applied < batchId` pruning, the
  * [[StreamJoinView]] rule).
  */
object StreamAnn {

  def maintainer(stream: DataFrame, store: TableStore, checkpointDir: String,
      listTable: String, neighborsTable: String, centroids: DataFrame,
      probe: Int = 4, k: Int = 3): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, listTable, neighborsTable, centroids, probe, k)(
          batch.toDF(), batchId)
      }

  /** The per-batch fold, exposed for direct testing. `batch` carries
    * (vec_id, v: array<double>); `centroids` (cid, cv: array<double>).
    */
  def applyBatch(store: TableStore, listTable: String,
      neighborsTable: String, centroids: DataFrame, probe: Int, k: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(listTable)
    if (batchId > lastApplied) {
      val cents = centroids
        .withColumn("n2c", Similarity.dotNative(col("cv"), col("cv")))
      val scored = batch
        .withColumn("n2", Similarity.dotNative(col("v"), col("v")))
        // zero-norm vectors have no cosine direction: their 0/0 = NaN
        // similarity would sort ABOVE every real neighbor (Spark orders
        // NaN greatest), so they are unindexable — dropped here, like
        // null embeddings at the source reader
        .filter(col("n2") > 0d)
        .crossJoin(broadcast(cents))
        // round(…, 12): the batch ANN family's engine-portability pin —
        // assignment and ranking read the same 12-digit value in every
        // engine that replays this fold (the per-element double dot fold
        // is already reproducible; the rounding absorbs any tie wobble)
        .select(col("vec_id"), col("v"), col("cid"),
          round(Similarity.dotNative(col("v"), col("cv")) /
            (sqrt(col("n2")) * sqrt(col("n2c"))), 12).as("cs"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cs").desc, col("cid"))
      val ranked = scored.withColumn("r", row_number().over(w)).localCheckpoint()
      val home = ranked.filter(col("r") === 1)
        .select(col("vec_id"), col("cid"), col("v"))
      val probes = ranked.filter(col("r") <= probe)
        .select(col("vec_id").as("qid"), col("cid"))
      val touched = probes.select(col("cid")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val hist =
        if (!store.exists(listTable))
          home.select(col("vec_id").as("nid"), col("cid"), col("v").as("vb")).limit(0)
        else store.read(listTable)
          .filter(col("cid").isInCollection(touched))
          .filter(col("__applied").cast("long") < batchId)
          .select(col("vec_id").as("nid"), col("cid"), col("v").as("vb"))
      // Final ranking as the topk_pairs bounded-heap aggregate, not a
      // row_number window: per-qid candidates = the probed lists' rows,
      // which grow with the STORE (~history/k per list) — the window
      // would funnel them through one partition per query, the aggregate
      // partial-reduces map-side. Tie/NaN order replays the window's
      // (cosine desc, nid asc) exactly; posexplode's index is the rank.
      val neighbors = probes
        .join(hist, Seq("cid"))
        .join(batch.select(col("vec_id").as("qid"), col("v").as("va")), Seq("qid"))
        .select(col("qid"), col("nid"),
          round(Similarity.dotNative(col("va"), col("vb")) /
            (sqrt(Similarity.dotNative(col("va"), col("va"))) *
              sqrt(Similarity.dotNative(col("vb"), col("vb")))), 12).as("cosine"))
        .distinct() // a neighbor reachable via several probed lists scores once
        .groupBy(col("qid"))
        .agg(call_function("topk_pairs", col("cosine"), col("nid"), lit(k)).as("t"))
        .select(col("qid"), posexplode(col("t")))
        .select(col("qid"), col("col.id").as("nid"),
          col("col.score").as("cosine"),
          (col("pos") + 1).cast(LongType).as("rnk"))
      store.replacePartitions(neighborsTable,
        neighbors.withColumn("__batch", lit(batchId)), "__batch")
      store.replacePartitions(listTable,
        home.withColumn("__applied", lit(batchId)), "__applied", Seq("cid"))
    }
  }
}
