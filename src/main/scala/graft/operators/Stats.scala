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
