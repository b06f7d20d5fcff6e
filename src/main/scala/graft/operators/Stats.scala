package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Surrogates

/** Grouped ordinary-least-squares regression and Pearson correlation with
  * ENGINE-EXACT arithmetic: the five sufficient statistics
  * (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in integer/DECIMAL space —
  * order-independent, shuffle-safe — and the closed-form slope /
  * intercept / r are derived by a fixed sequence of IEEE double ops at
  * the very end. Two engines that aggregate in double disagree in the
  * last bits depending on partitioning (float addition isn't
  * associative); this formulation makes the result reproducible bit for
  * bit — the same trick as [[graft.functions.Cleaning.dsum]], extended
  * to second moments.
  *
  * Scale shape: one hash aggregate per grouping (partial map-side
  * combine, six narrow agg buffers per group) — a regression over a
  * 100 TB fact costs exactly one shuffle of group-count rows. No window,
  * no collect, no second pass.
  *
  * Bounds: x must fit a BIGINT; y is cast to `yType` (default
  * DECIMAL(18,4)). For results that must be REPRODUCIBLE ACROSS ENGINES
  * (not just across partitionings), choose the y unit so every
  * sufficient statistic stays under 2^53: some engines convert wide
  * decimals to double by converting the unscaled integer first and
  * multiplying by 10^-scale — two roundings, off by an ulp from the
  * correctly-rounded cast — but a statistic that is an exactly-
  * representable double converts identically everywhere. A scale-0 y in
  * a coarse unit (whole dollars for monthly revenue) keeps Σy² exact
  * through double space; the noise this ignores is far below what a
  * double could carry anyway.
  */
object Stats {

  /** Per-group sufficient statistics: (keys*, n, sx, sy, sxy, sxx, syy)
    * with sums exact (BIGINT / DECIMAL). `x`: integral column; `y`: any
    * numeric (cast to `yType` at the row level).
    */
  def sufficientStats(df: DataFrame, keys: Seq[String], x: Column,
      y: Column, yType: String = "decimal(18,4)"): DataFrame = {
    val xd = x.cast("long")
    val yd = y.cast(yType)
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(xd).cast("long").as("sx"),
        sum(yd).as("sy"),
        sum(xd * yd).as("sxy"),
        sum(xd * xd).cast("long").as("sxx"),
        sum(yd * yd).as("syy"))
  }

  /** OLS fit per group: (keys*, n, slope, intercept, r).
    *
    * slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), intercept = ȳ − slope·x̄,
    * r = cov / (σx·σy) — each computed double-from-exact. Degenerate
    * groups (a single point, or zero variance in either axis) yield NULL
    * slope/intercept/r rather than ±Inf/NaN, so downstream filters
    * behave.
    */
  def regressionBy(df: DataFrame, keys: Seq[String], x: Column,
      y: Column, yType: String = "decimal(18,4)"): DataFrame = {
    val st = sufficientStats(df, keys, x, y, yType)
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val sxxD = col("sxx").cast("double")
    val syyD = col("syy").cast("double")
    val covN = nD * sxyD - sxD * syD    // n² × covariance
    val varXN = nD * sxxD - sxD * sxD   // n² × variance(x)
    val varYN = nD * syyD - syD * syD
    val slope = when(varXN > 0, covN / varXN)
    val r = when(varXN > 0 && varYN > 0, covN / (sqrt(varXN) * sqrt(varYN)))
    st.select(
      keys.map(col) :+ col("n") :+
        slope.as("slope") :+
        when(varXN > 0, (syD - (covN / varXN) * sxD) / nD).as("intercept") :+
        r.as("r"): _*)
  }

  /** EXACT quantiles (percentile_disc semantics: the data value at rank
    * ⌈q·n⌉, rank 1 for q→0) at distributed scale: global ranks come from
    * [[Surrogates.assignScalable]] — a RANGE shuffle plus per-partition
    * indexing — never the single-task `row_number().over(Window.orderBy)`
    * that serializes the whole table through one executor. Equal values
    * share arbitrary ranks, but the VALUE at any fixed rank is unique, so
    * the result is deterministic without a tiebreaker.
    *
    * Cost: one count job for `n`, one ranked pass, a broadcast join of
    * the |qs|-row rank table. Returns (q DOUBLE, value) one row per
    * requested quantile. Exact — where a sketch (approx_percentile)
    * trades rank error for one fewer pass; under a bit-compare gate or a
    * contractual SLA ("p99 latency"), exact is the one you can certify.
    */
  /** Per-group σ-threshold outliers decided ENTIRELY in integer
    * arithmetic: |x − μ| > (num/den)·σ is equivalent to
    *
    *   den² · (n·x − S)²  >  num² · (n·Q − S²)
    *
    * with S = Σx, Q = Σx² — no mean, no variance, no sqrt, no doubles
    * anywhere, so the flagged set is reproducible bit for bit across
    * engines and partitionings (a double formulation can flip rows that
    * sit exactly on the threshold). One hash aggregate for the per-group
    * (n, S, Q) plus one equi-join back — the same two-pass shape as the
    * quantile quality cut.
    *
    * Bounds: exact while n²·max(x)² fits a signed 64-bit long (e.g.
    * 10⁶ rows/group × values ≤ 10³). Past that, cast the three
    * statistics to DECIMAL(38,0) — same plan, wider buffers.
    *
    * Returns the input rows with (grp_n, grp_sum, grp_sumsq) appended —
    * callers project; μ and σ are derivable downstream without another
    * pass.
    */
  def integerOutliers(df: DataFrame, keys: Seq[String], x: Column,
      num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= 1, s"threshold must be positive, got $num/$den")
    val xd = x.cast("long")
    val g = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("long").as("grp_n"),
      sum(xd).as("grp_sum"),
      sum(xd * xd).as("grp_sumsq"))
    val dev = col("grp_n") * xd - col("grp_sum")
    df.join(g, keys)
      .filter(lit(den.toLong * den) * dev * dev >
        lit(num.toLong * num) *
          (col("grp_n") * col("grp_sumsq") - col("grp_sum") * col("grp_sum")))
  }

  /** Equi-width histogram of a numeric column: (bucket, bucket_lo, n).
    * Two aggregates — one 1-row min/max frame broadcast back (the only
    * cross join, bounded by design), then a map-side bucket assignment
    * and one hash aggregate. Bucketing arithmetic is a fixed sequence of
    * IEEE double ops ((x−lo)/w, floor, clamp), so bucket membership is
    * reproducible across engines; a degenerate column (min = max) lands
    * everything in bucket 0 rather than dividing by zero.
    */
  def equiWidthHistogram(df: DataFrame, value: Column,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"need at least one bucket, got $nBuckets")
    val mm = df.agg(min(value).cast("double").as("lo"),
      max(value).cast("double").as("hi"))
    val w = (col("hi") - col("lo")) / nBuckets
    val bucket = when(col("hi") > col("lo"),
      least(lit(nBuckets - 1),
        floor((value.cast("double") - col("lo")) / w).cast("int")))
      .otherwise(0)
    df.crossJoin(broadcast(mm))
      .groupBy(bucket.as("bucket"), (col("lo") + bucket * w).as("bucket_lo"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[BigDecimal]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $qs")
    val n = df.count()
    val ranked = Surrogates.assignScalable(
      df.select(col(valueCol)), "__rank", Seq(col(valueCol)))
    val spark = df.sparkSession
    import spark.implicits._
    val targets = qs
      .map(q => (q.toDouble, math.max(1L, (q * n).setScale(0, BigDecimal.RoundingMode.CEILING).toLong)))
      .toDF("q", "__rank")
    ranked.join(broadcast(targets), Seq("__rank"))
      .select(col("q"), col(valueCol))
  }
}
