package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count–min sketch over a key column — the fixed-size frequency summary
  * a streaming/scale pipeline keeps when exact per-key counts would need
  * unbounded state: `depth` hash rows × `width` buckets of counters,
  * estimate = min over rows of the key's bucket counter (always an
  * OVERestimate, biased by collisions only).
  *
  * Scale shape: the sketch build is one shuffle on (row, bucket) with
  * map-side partial aggregation — at most depth×width rows leave any
  * partition no matter how many input rows it holds, which is the whole
  * point of a sketch. Lookups join the (tiny, broadcastable) sketch.
  *
  * The hash family is md5-derived (high 60 bits of md5("r|" || key) mod
  * width) — deterministic and portable, so sketch contents and estimates
  * are replayable bit-for-bit by an external SQL oracle, same as the
  * portable MinHash/SimHash families.
  */
object Sketches {

  /** Bucket of `key` in hash row `r`. */
  def cmsBucket(key: Column, r: Int, width: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$r|"), key)), 1, 15), 16, 10).cast(LongType),
      lit(width.toLong))

  /** Build the sketch: (r, bucket, n) — at most depth×width rows. */
  def countMin(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    keys
      .select(posexplode(
        array((0 until depth).map(r => cmsBucket(col(keyCol), r, width)): _*)))
      .groupBy(col("pos").as("r"), col("col").as("bucket"))
      .agg(count(lit(1)).cast(LongType).as("n"))

  /** Portable HyperLogLog registers: m = 2^b register maxima over the
    * md5-derived 60-bit hash — register = hash mod m, rank ρ = position
    * of the highest set bit of the remaining 52 bits, computed as the
    * first '1' in the zero-padded binary string (`lpad(bin(w), 52)`) so
    * every step is integer/string-exact — no float log2 anywhere. The
    * register maxima partial-aggregate map-side: at most m rows per
    * partition reach the ONE shuffle regardless of input size, which is
    * the whole point of the sketch (the exact COUNT(DISTINCT) shuffles
    * the full key domain). Output: (register, m_rho), ≤ m rows.
    */
  def hllRegisters(keys: DataFrame, keyCol: String, b: Int = 8): DataFrame =
    hllRegistersBy(keys, keyCol, Nil, b)

  /** As [[hllRegisters]] but one sketch PER GROUP — (groupCols*, register,
    * m_rho), ≤ m rows per group. Same single map-side-partial shuffle;
    * the group columns simply ride in the grouping key (this is what a
    * per-day / per-source distinct readout wants instead of one global
    * sketch).
    */
  def hllRegistersBy(keys: DataFrame, keyCol: String,
      groupCols: Seq[String], b: Int = 8): DataFrame = {
    val m = 1L << b
    val wBits = 60 - b // suffix width after the register is peeled off
    val g = groupCols.map(col)
    keys
      .select(g :+ conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
        .cast(LongType).as("__h"): _*)
      .select(g ++ Seq(
        pmod(col("__h"), lit(m)).cast(LongType).as("register"),
        expr(s"__h DIV $m").cast(LongType).as("__w")): _*)
      .select(g ++ Seq(col("register"),
        when(col("__w") === 0, lit(wBits + 1))
          .otherwise(instr(lpad(bin(col("__w")), wBits, "0"), "1"))
          .cast(LongType).as("rho")): _*)
      .groupBy(g :+ col("register"): _*)
      .agg(max(col("rho")).cast(LongType).as("m_rho"))
  }

  /** One-row HLL readout from [[hllRegisters]] output: the harmonic sum
    * Σ 2^(-M_j) is carried as the EXACT integer Σ 2^(53-M_j) (every term
    * a power of two; absent registers contribute 2^53 each), so sketch
    * state and estimate are bit-replayable by an external SQL oracle.
    * `raw_est` = α_m·m²/Σ2^(-M) as ONE pinned left-to-right double
    * expression — the uncorrected estimator, accurate in the n ≳ 2.5m
    * regime (callers in the small-range regime should read n_zero and
    * apply linear counting; this readout keeps every op IEEE-pinned).
    */
  def hllEstimate(registers: DataFrame, b: Int = 8): DataFrame =
    hllEstimateBy(registers, Nil, b)

  /** As [[hllEstimate]] but one readout row per group of [[hllRegistersBy]]
    * output — (groupCols*, m, n_zero, s_inv, raw_est).
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    val m = 1L << b
    // Σ 2^(-M_j) is scaled by 2^maxRho so every term is an exact BIGINT
    // power of two; worst case m · 2^maxRho = 2^61 — never overflows
    val maxRho = 61 - b
    val scale = 1L << maxRho
    val g = groupCols.map(col)
    registers
      .groupBy(g: _*)
      .agg(
        count(lit(1)).cast(LongType).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRho - m_rho AS INT))"))
          .cast(LongType).as("s_present"))
      .select(g ++ Seq(
        lit(m).cast(LongType).as("m"),
        (lit(m) - col("n_present")).cast(LongType).as("n_zero"),
        (col("s_present") + (lit(m) - col("n_present")) * lit(scale))
          .cast(LongType).as("s_inv")): _*)
      .withColumn("raw_est",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          lit((m * m).toDouble) * lit(scale.toDouble) /
          col("s_inv").cast("double"))
  }

  /** 52-bit md5-derived hash (13 hex chars): non-negative, exactly
    * representable in a DOUBLE, and identical in any engine with md5 —
    * the hash family the KMV bottom-k sketch draws from.
    */
  def hash52(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast(LongType)

  /** HASHING-TRICK feature bucket: a categorical feature string maps to
    * a fixed-dimension index via [[hash52]] mod `nBuckets` — the
    * featurizer that needs NO vocabulary pass, no dictionary broadcast,
    * and no retrain when new categories appear (they land in some
    * bucket deterministically). Collisions are the accepted trade; audit
    * them with a (bucket → distinct features) aggregate before fixing
    * the dimension. Pure map-side column — embeds in any scan stage.
    */
  def featureBucket(feat: Column, nBuckets: Int): Column = {
    require(nBuckets >= 1, s"need a positive dimension, got $nBuckets")
    pmod(hash52(feat), lit(nBuckets.toLong))
  }

  /** Estimate each probe key's frequency: min over the sketch's rows of
    * its bucket counter. Probes keep their other columns; the sketch side
    * is at most depth×width rows (broadcast). PRECONDITION: probe rows
    * must be distinct — the estimate re-groups by the probe columns, so
    * duplicate rows collapse to one (probe a key once per distinct
    * context, or carry a row key).
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val keyed = probes.select(
      col("*"),
      posexplode(array((0 until depth).map(r => cmsBucket(col(keyCol), r, width)): _*))
        .as(Seq("__cms_r", "__cms_bucket")))
    keyed
      .join(broadcast(
        sketch.select(col("r").as("__cms_r"), col("bucket").as("__cms_bucket"),
          col("n").as("__cms_n"))),
        Seq("__cms_r", "__cms_bucket"), "left")
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("__cms_n"), lit(0L))).as("cms_n"))
  }
}
