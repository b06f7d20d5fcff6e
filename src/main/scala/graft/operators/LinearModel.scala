package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextAnalysis

/** Linear-model inference at corpus scale — the fasttext-shaped quality
  * classifier LLM curation pipelines apply to every document (CCNet /
  * RedPajama-style filtering): hashed bag-of-words features, a weight
  * per bucket, score = mean feature weight. The expensive part at 100 TB
  * is the feature pass, and it is all scan-stage here: tokenize →
  * [[Sketches.featureBucket]] (vocabulary-free md5 hashing, same family
  * as `ml_feature_hash`) → broadcast-join the bucket-weight table (the
  * MODEL, shipped as a nBuckets-row frame — a real trained model drops
  * in as different rows) → one grouped integer aggregate per document.
  * No vocabulary broadcast, no per-token state, one shuffle keyed by
  * document.
  *
  * Weights are INTEGERS (a fixed-point model; fasttext weights quantize
  * to fixed point without measurable quality loss), so the per-document
  * sum is exact and the score is one pinned double division — the whole
  * inference replays bit-for-bit in an external SQL oracle.
  */
object LinearModel {

  /** Score each document: mean integer weight of its hashed tokens.
    * `weights` is the model: (bucket, w) with one row per bucket,
    * integer w. Output: id, passthrough `carryCols`, n_tokens, score.
    */
  def hashedBowScore(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, nBuckets: Int,
      carryCols: Seq[String] = Nil): DataFrame = {
    val toks = docs.select(
      (col(idCol) +: carryCols.map(col)) :+
        explode(TextAnalysis.tokens(col(textCol))).as("__token"): _*)
      .filter(col("__token") =!= "")
      .withColumn("bucket", Sketches.featureBucket(col("__token"), nBuckets))
    // LEFT join + coalesce: a sparse model (missing bucket rows) means
    // weight 0 for those tokens — they still count into n_tokens, and a
    // doc whose tokens all miss still scores (0.0) instead of vanishing.
    // For a dense model (every bucket present) this is bit-identical to
    // an inner join.
    toks
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy((col(idCol) +: carryCols.map(col)): _*)
      .agg(
        count(lit(1)).cast(LongType).as("n_tokens"),
        sum(coalesce(col("w"), lit(0))).cast(LongType).as("__sum_w"))
      .withColumn("score",
        col("__sum_w").cast("double") / col("n_tokens").cast("double"))
      .drop("__sum_w")
  }
}
