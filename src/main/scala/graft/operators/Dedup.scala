package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.TextAnalysis

/** Document deduplication for training-data pipelines, designed for the
  * banded-LSH shape that scales: candidate pairs come from equi-joins on
  * band buckets — never an all-pairs cross join.
  *
  * Scale notes (100 TB): the shingle explode is map-side; signatures are
  * one shuffle on (doc, seed); banding one shuffle on (doc, band); the
  * bucket self-join shuffles on (band, band_key) whose cardinality is the
  * number of buckets, and AQE handles residual bucket skew. Exact dedup is
  * a single hash aggregate on the text hash.
  */
object Dedup {

  /** Exact duplicate groups: md5(text) → representative id + group size. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("fp"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).cast(LongType).as("n_dups"))

  /** Distinct (id, shingle) pairs — the MinHash input set. */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.shingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** MinHash signatures in long format: (id, seed, minhash). The hash
    * family is md5(seed || '|' || shingle) — deterministic, portable, and
    * string-min-comparable (fixed-width lowercase hex).
    */
  def minhashSignatures(shingles: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val seeds = shingles.sparkSession.range(numHashes).select(col("id").as("seed"))
    shingles
      .crossJoin(broadcast(seeds))
      .groupBy(col(idCol), col("seed"))
      .agg(
        min(md5(concat(col("seed").cast("string"), lit("|"), col("shingle"))))
          .as("minhash"))
  }

  /** Collapse signatures into per-band bucket keys: band = seed / rows,
    * band_key = ordered concat of the band's minhashes.
    */
  def bandKeys(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sig
      .groupBy(
        col(idCol),
        (col("seed") / rowsPerBand).cast(LongType).as("band"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("seed"), col("minhash")))),
            s => s.getField("minhash")),
          ",").as("band_key"))

  /** Candidate near-dup pairs: docs sharing any band bucket (a < b). */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band"), col("band_key"))
    val b = bands.select(col(idCol).as("doc_b"), col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** End-to-end MinHash-LSH candidate pairs. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, rowsPerBand: Int = 4, shingleN: Int = 3): DataFrame =
    candidatePairs(
      bandKeys(
        minhashSignatures(shingleSet(docs, idCol, textCol, shingleN), idCol, numHashes),
        idCol, rowsPerBand),
      idCol)

  /** Exact Jaccard similarity for given (doc_a, doc_b) pairs — the
    * verification stage after LSH candidate generation.
    */
  def jaccardForPairs(shingles: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val sizes = shingles.groupBy(col(idCol))
      .agg(count(lit(1)).cast(LongType).as("n_sh"))
    val sa = shingles.select(col(idCol).as("doc_a"), col("shingle"))
    val sb = shingles.select(col(idCol).as("doc_b"), col("shingle"))
    val inter = pairs
      .join(sa, Seq("doc_a"))
      .join(sb, Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast(LongType).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double")).as("jaccard"))
  }

  /** All exact-Jaccard pairs above a threshold — brute force, for recall
    * testing at small scale only (O(n²) via the shingle join, not a cross
    * join, but still quadratic in matching docs).
    */
  def bruteForceJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, shingleN)
    val all = sh.select(col(idCol).as("doc_a"), col("shingle"))
      .join(sh.select(col(idCol).as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    jaccardForPairs(sh, idCol, all).filter(col("jaccard") >= threshold)
  }

  /** SimHash (64-bit) per document over its token set: per bit position,
    * sum ±1 weighted by each token-hash's bit, take the sign. Uses Spark's
    * native xxhash64 — codegen'd, no UDF.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    toks
      .select(col(idCol), col("h"),
        explode(sequence(lit(0), lit(63))).as("pos"))
      .withColumn("bit",
        when(expr("shiftright(h, pos)").bitwiseAND(1) === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("pos"))
      .agg(sum(col("bit")).as("s"))
      .groupBy(col(idCol))
      .agg(
        sum(
          when(col("s") > 0, expr("shiftleft(1L, pos)")).otherwise(0L))
          .as("simhash"))
  }

  /** SimHash near-dup candidates: split the 64-bit hash into 4 16-bit
    * chunks; docs sharing any chunk are candidates (finds all pairs within
    * Hamming distance 3 by pigeonhole).
    */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val chunks = sh.select(
      col(idCol),
      explode(sequence(lit(0), lit(3))).as("chunk"))
      .join(sh, Seq(idCol))
      .select(
        col(idCol), col("chunk"),
        expr("shiftright(simhash, chunk * 16)")
          .bitwiseAND(0xFFFFL).as("chunk_val"))
    val a = chunks.select(col(idCol).as("doc_a"), col("chunk"), col("chunk_val"))
    val b = chunks.select(col(idCol).as("doc_b"), col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }
}
