package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.LongType

import graft.sources.TableStore

/** Streaming recommender-index maintenance: per-(item, item) basket
  * co-occurrence counts and per-item basket counts kept current from an
  * order stream — the always-fresh "also bought" index behind
  * `dm_item_cf_topk`, with state bounded by co-purchased item pairs,
  * not order volume.
  *
  * The merge law is SUM with a batch contract: a BASKET must arrive
  * whole inside one micro-batch (split the stream on the basket key —
  * the natural CDC/commit grain of an order feed), because a basket's
  * pairs are generated from its full item set. Under that contract both
  * statistics are linear: per-batch pair counts and item counts fold by
  * per-key SUM, and the merged store answers the EXACT one-shot cosine
  * top-k at any moment — `c35_stream_itemcf` certifies against VERBATIM
  * the one-shot oracle SQL.
  *
  * Crash discipline ([[StreamDedup.applyBatch]]): the pair partition
  * (the delta) lands FIRST, the item-count partition (the applied
  * marker) lands LAST; refolds and readers filter the pair store to
  * `__applied <= lastApplied`, so a crashed attempt's orphan pairs are
  * excluded and replaced by the retry.
  */
object StreamItemCf {

  /** Distinct (basket, item) incidence of one row set — dedup before
    * counting so a quantity-split order line never double-counts.
    */
  def basketIncidence(rows: DataFrame, basketCol: String,
      itemCol: String): DataFrame =
    rows.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()

  /** Per-(pa < pb) co-occurrence counts of a basket incidence — the
    * one-shuffle per-basket sorted-array pair generation (Σ basket²,
    * never items²), shared by the one-shot query and the fold.
    */
  def basketPairCounts(incidence: DataFrame): DataFrame =
    incidence.groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
      .filter(size(col("items")) > 1)
      .select(explode(
        graft.operators.Dedup.pairsFromSortedArray(col("items"))).as("pp"))
      .groupBy(col("pp.doc_a").as("pa"), col("pp.doc_b").as("pb"))
      .agg(count(lit(1)).cast(LongType).as("n_ab"))

  /** Per-item basket counts of a basket incidence. */
  def itemBasketCounts(incidence: DataFrame): DataFrame =
    incidence.groupBy(col("item"))
      .agg(count(lit(1)).cast(LongType).as("n_item"))

  /** The per-batch fold, exposed for direct testing. Batch columns are
    * (basketCol, itemCol); baskets must arrive whole (see object doc).
    */
  def applyBatch(store: TableStore, pairTable: String, itemTable: String,
      basketCol: String, itemCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val lastApplied = store.lastAppliedBatch(itemTable)
    if (batchId > lastApplied) {
      val inc = basketIncidence(batch, basketCol, itemCol).localCheckpoint()
      store.replacePartitions(pairTable,
        basketPairCounts(inc).withColumn("__applied", lit(batchId)),
        "__applied")
      store.replacePartitions(itemTable,
        itemBasketCounts(inc).withColumn("__applied", lit(batchId)),
        "__applied")
    }
  }

  /** Corpus pair counts from the store (orphan partitions of a crashed
    * attempt excluded by the item-table marker).
    */
  def mergedPairCounts(store: TableStore, pairTable: String,
      itemTable: String): DataFrame = {
    val lastApplied = store.lastAppliedBatch(itemTable)
    store.read(pairTable).filter(col("__applied") <= lastApplied)
      .groupBy(col("pa"), col("pb"))
      .agg(sum(col("n_ab")).cast(LongType).as("n_ab"))
  }

  /** Corpus per-item basket counts from the store. */
  def mergedItemCounts(store: TableStore, itemTable: String): DataFrame =
    store.read(itemTable)
      .groupBy(col("item"))
      .agg(sum(col("n_item")).cast(LongType).as("n_item"))

  /** Structured Streaming entry: fold each micro-batch into the store.
    * `checkpointDir` is REQUIRED for batch-id durability (the
    * [[StreamDedup.nearDupMaintainer]] note).
    */
  def maintainer(stream: DataFrame, store: TableStore, checkpointDir: String,
      pairTable: String, itemTable: String, basketCol: String,
      itemCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        applyBatch(store, pairTable, itemTable, basketCol, itemCol)(
          batch.toDF(), batchId)
      }
}
