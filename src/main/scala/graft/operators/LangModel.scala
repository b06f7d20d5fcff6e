package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextAnalysis

/** N-gram language-model QUALITY SCORING — the KenLM-style filter of a
  * training-data pipeline (score each document by how probable its token
  * stream is under a corpus-trained model; the low tail is gibberish,
  * boilerplate, or the wrong language). The model here is a bigram MLE
  * trained on the corpus itself.
  *
  * ENGINE-EXACT scoring: a conditional probability c(prev,cur)/c(prev)
  * is not reproducible as a float across engines/partitionings, so each
  * transition scores the INTEGER (c_pair · 10¹²) div c_prev (truncating
  * division — identical everywhere), and a document's score is the mean
  * of those integers, divided back to probability space by one pinned
  * double expression at the very end. The intermediate product
  * n_pair · 10¹² is computed in DECIMAL(38,0) (a web-scale bigram count
  * past ~9.2M would wrap a signed 64-bit product); the QUOTIENT is ≤ 10¹²
  * so the per-document sum stays far under 2⁶³ (a document would need
  * 9 million tokens to overflow).
  *
  * Scale shape: transitions are a map-side array zip (no self-join on
  * position); the model is two hash aggregates whose size is bounded by
  * VOCAB², independent of corpus size; scoring joins transitions to the
  * model on the token pair — at 100 TB the model side is millions of
  * rows against billions of transitions, a plain shuffle join AQE will
  * broadcast when the vocab is small. No driver materialization.
  */
object LangModel {

  private def ckpt(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Bigram transition model: (prev, cur, n_pair, n_prev) with exact
    * integer counts, from whitespace-tokenized `textCol`.
    */
  def bigramModel(docs: DataFrame, textCol: String): DataFrame =
    modelFromTransitions(transitions(docs, idCol = null, textCol))

  /** The model aggregates over an existing transition frame — extra
    * columns (the doc id) ride through the counts unchanged, so scoring
    * and training can share ONE exploded pass over the corpus.
    */
  private def modelFromTransitions(pairs: DataFrame): DataFrame = {
    val cPair = pairs.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).cast(LongType).as("n_pair"))
    val cPrev = cPair.groupBy(col("prev"))
      .agg(sum(col("n_pair")).cast(LongType).as("n_prev"))
    cPair.join(cPrev, Seq("prev"))
  }

  /** (doc_id?, prev, cur) token transitions — one exploded map-side pass. */
  private def transitions(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val arr = TextAnalysis.tokens(col(textCol))
    val n1 = greatest(size(arr) - 1, lit(0))
    val pairs = zip_with(
      slice(arr, lit(1), n1), slice(arr, lit(2), n1),
      (x, y) => struct(x.as("prev"), y.as("cur")))
    val base =
      if (idCol == null) docs.select(explode(pairs).as("p"))
      else docs.select(col(idCol), explode(pairs).as("p"))
    base.withColumn("prev", col("p.prev")).withColumn("cur", col("p.cur"))
      .drop("p")
  }

  /** Per-document mean bigram probability under the corpus-trained model:
    * (idCol, n_trans, avg_prob). Documents with fewer than two tokens
    * have no transitions and are absent (nothing to score).
    */
  /** Held-out bigram scoring with add-one (Laplace) smoothing — the
    * CCNet/KenLM-style quality filter done WITHOUT training on the text
    * being scored: the model (pair counts, prefix counts, vocabulary
    * size V) comes only from `train`, and every `test` transition scores
    *
    *   p = (c(prev,cur) + 1) / (c(prev) + V)
    *
    * as the exact truncating lattice ((c_pair+1)·10¹²) div (c_prev+V) —
    * unseen pairs and unseen prev tokens (the OOV count reported per
    * document) get the smoothed floor instead of vanishing from the
    * average the way [[bigramScore]]'s MLE inner-join drops them. The
    * denominator is clamped to ≥ 1 so an EMPTY train model degrades to
    * p = 1 rather than a divide-by-zero (both engines).
    *
    * Scale shape: the model is vocab²-bounded; scoring is two left
    * joins of test transitions against it plus one 1-row broadcast
    * vocabulary-size cross — at 100 TB the model side is millions of
    * rows against billions of transitions. Returns
    * (idCol, n_trans, n_oov, avg_prob) for test docs with ≥ 1
    * transition.
    */
  def bigramScoreHeldout(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val Scale = 1000000000000L
    val cPair = transitions(train, idCol = null, textCol)
      .groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).cast(LongType).as("n_pair"))
    val cPrev = cPair.groupBy(col("prev"))
      .agg(sum(col("n_pair")).cast(LongType).as("n_prev"))
    val vocab = train
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).cast(LongType).as("vsz"))
    transitions(test, idCol, textCol)
      .join(cPair, Seq("prev", "cur"), "left")
      .join(cPrev, Seq("prev"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        when(col("n_prev").isNull, 1L).otherwise(0L).as("oov"),
        expr(s"""((coalesce(n_pair, 0) + cast(1 as decimal(38,0))) * ${Scale}L)
                | div greatest(coalesce(n_prev, 0) + vsz, 1)"""
          .stripMargin.replaceAll("\n\\s*", " ")).as("p_scaled"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_trans"),
        sum(col("oov")).cast(LongType).as("n_oov"),
        // accumulate through DECIMAL(38,0): each p_scaled term is ~10¹²,
        // so a LongType sum wraps silently (non-ANSI) past ~9.2M
        // transitions in one document — the oracle sums in HUGEINT
        (sum(col("p_scaled").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double") /
          lit(Scale).cast("double")).as("avg_prob"))
  }

  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val Scale = 1000000000000L // 10^12: probability resolution of the integer score
    // ONE exploded pass: training and scoring both read the checkpointed
    // id-carrying transitions (the explode over the corpus IS the cost —
    // re-deriving it for the model doubled the query)
    val trans = ckpt(transitions(docs, idCol, textCol))
    val model = modelFromTransitions(trans)
    trans
      .join(model, Seq("prev", "cur"))
      .select(col(idCol),
        expr(s"(cast(n_pair as decimal(38,0)) * ${Scale}L) div n_prev")
          .as("p_scaled"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast(LongType).as("n_trans"),
        // DECIMAL(38,0) accumulator — same silent-wrap guard as
        // bigramScoreHeldout (terms are ~10¹² each)
        (sum(col("p_scaled").cast("decimal(38,0)")).cast("double") /
          count(lit(1)).cast("double") /
          lit(Scale).cast("double")).as("avg_prob"))
  }
}
