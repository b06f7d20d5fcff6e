package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** [[Stats.regressionBy]]: exact sufficient statistics → closed-form
  * OLS/Pearson; degenerate groups yield NULL, not Inf/NaN.
  */
class StatsSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("regressionBy recovers a known line and correlation") {
    // g1: y = 2x + 1 exactly -> slope 2, intercept 1, r = 1
    // g2: y = -0.5x + 10 with noise orthogonal to x (+1,-1,-1,+1 has zero
    // covariance with x = 0,2,4,6), so OLS recovers the base slope exactly
    val rows =
      (1 to 10).map(x => ("g1", x, 2.0 * x + 1)) ++
        Seq(("g2", 0, 10.0 + 1), ("g2", 2, 9.0 - 1),
          ("g2", 4, 8.0 - 1), ("g2", 6, 7.0 + 1))
    val got = Stats.regressionBy(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    val (_, n1, sl1, ic1, r1) = got("g1")
    assert(n1 == 10 && sl1.contains(2.0) && ic1.contains(1.0))
    assert(math.abs(r1.get - 1.0) < 1e-12)
    val (_, _, sl2, _, r2) = got("g2")
    assert(math.abs(sl2.get - (-0.5)) < 1e-12)
    assert(r2.get < 0 && r2.get > -1, "noisy negative trend")
  }

  test("exactQuantiles selects the value at rank ceil(q*n), ties and edges included") {
    // 10 values with duplicates; ranks: q=0.25->3, 0.5->5, 0.75->8, 1.0->10
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 7.0, 3.0, 8.0, 7.0)
    val df = vals.map(Tuple1(_)).toDF("v")
    val got = Stats.exactQuantiles(df, "v",
      Seq("0.25", "0.5", "0.75", "1.0").map(BigDecimal(_)))
      .as[(Double, Double)].collect().toMap
    val sorted = vals.sorted
    assert(got == Map(0.25 -> sorted(2), 0.5 -> sorted(4),
      0.75 -> sorted(7), 1.0 -> sorted(9)))
    // q small enough that ceil(q*n) < 1 clamps to rank 1 (the minimum)
    val tiny = Stats.exactQuantiles(df, "v", Seq(BigDecimal("0.01")))
      .as[(Double, Double)].collect().toSeq
    assert(tiny == Seq((0.01, 1.0)))
  }

  test("degenerate groups produce NULL, never Inf/NaN") {
    val rows = Seq(
      ("one_point", 5, 3.0),
      ("flat_x", 2, 1.0), ("flat_x", 2, 9.0),   // zero x-variance
      ("flat_y", 1, 4.0), ("flat_y", 3, 4.0))   // zero y-variance
    val got = Stats.regressionBy(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(got("one_point")._3.isEmpty && got("flat_x")._3.isEmpty)
    assert(got("one_point")._5.isEmpty && got("flat_x")._5.isEmpty)
    // flat_y: slope is defined (0), r is not (zero y-variance)
    assert(got("flat_y")._3.contains(0.0) && got("flat_y")._5.isEmpty)
  }

  test("integerOutliers matches exact BigInt arithmetic; boundary and σ=0 excluded") {
    val rows = ((1 to 9).map(v => ("A", v)) :+ (("A", 60))) ++
      (1 to 5).map(_ => ("B", 7)) ++ // constant group: σ = 0, no outliers
      Seq(("C", 0), ("C", 2)) // both sit EXACTLY on 1σ — strict > excludes
    val df = rows.toDF("g", "v")
    for ((num, den) <- Seq((1, 1), (3, 2), (2, 1))) {
      val got = Stats.integerOutliers(df, Seq("g"), col("v"), num, den)
        .select(col("g"), col("v")).as[(String, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, m) =>
        val n = BigInt(m.size)
        val s = m.map(r => BigInt(r._2)).sum
        val q = m.map(r => BigInt(r._2) * r._2).sum
        m.filter { case (_, x) =>
          BigInt(den * den) * (n * x - s).pow(2) >
            BigInt(num * num) * (n * q - s * s)
        }
      }.groupBy(identity).view.mapValues(_.length).toMap
      assert(got == want, s"k=$num/$den")
      if (num == den) {
        assert(!got.keySet.exists(_._1 == "C"), "exact-boundary rows flagged")
        assert(got.keySet.exists(_._1 == "A"), "the far outlier must flag")
      }
    }
  }

  test("equiWidthHistogram partitions every row, clamps max, handles a flat column") {
    val df = (0 to 16).map(Tuple1(_)).toDF("v")
    val got = Stats.equiWidthHistogram(df, col("v"), 16)
      .as[(Int, Double, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).sum == 17, "every row lands in exactly one bucket")
    assert(got.last == ((15, 15.0, 2L)), "v=16 clamps into the top bucket")
    assert(got.head == ((0, 0.0, 1L)) && got.length == 16)
    val flat = Stats.equiWidthHistogram(
      Seq(5, 5, 5).map(Tuple1(_)).toDF("v"), col("v"), 16)
      .as[(Int, Double, Long)].collect()
    assert(flat.toSeq == Seq((0, 5.0, 3L)), "min=max degenerates to bucket 0")
  }

  test("ksTwoSample matches hand-computed D, exact at every range count") {
    // a = {1,2,3,4}, b = {3,4,5,6}: F_a - F_b peaks at x=2 (2/4 - 0/4)
    // and x=4 (4/4 - 2/4) -> D = 1/2; d_e12 = (8·1e12) div 16 = 5e11
    val df = (Seq(1, 2, 3, 4).map((_, true)) ++ Seq(3, 4, 5, 6).map((_, false)))
      .toDF("v", "a")
    for (n <- Seq(1, 2, 32)) {
      val r = Stats.ksTwoSample(df, col("v"), col("a"), nRanges = n).head()
      assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
      assert(r.getLong(2) == 500000000000L, s"nRanges=$n")
      assert(math.abs(r.getDouble(3) - 0.5) < 1e-15, s"nRanges=$n")
    }
    // identical samples -> D = 0
    val same = (Seq(1, 2, 3).map((_, true)) ++ Seq(1, 2, 3).map((_, false)))
      .toDF("v", "a")
    assert(Stats.ksTwoSample(same, col("v"), col("a")).head().getDouble(3) == 0.0)
  }

  test("aucExact: perfect ranker 1.0, anti-ranker 0.0, ties midrank to 0.5 — exact") {
    // positives all score above negatives -> AUC = 1 exactly
    val perfect = (Seq(5, 6, 7).map((_, true)) ++ Seq(1, 2, 3).map((_, false)))
      .toDF("s", "y")
    assert(Stats.aucExact(perfect, col("s"), col("y")).head().getDouble(3) == 1.0)
    assert(Stats.aucExact(perfect, -col("s"), col("y")).head().getDouble(3) == 0.0)
    // all tied -> midranks give exactly 0.5
    val tied = (Seq(4, 4).map((_, true)) ++ Seq(4, 4, 4).map((_, false)))
      .toDF("s", "y")
    val r = Stats.aucExact(tied, col("s"), col("y")).head()
    assert(r.getDouble(3) == 0.5)
    assert(r.getLong(2) == 500000000000L) // 0.5 on the e12 lattice
    // hand case with a mix: pos {3,1}, neg {2,1}: pairs (3>2)+(3>1)+(1>2=0)+(1=1 half)
    // AUC = (1+1+0+0.5)/4 = 0.625, lattice = 5
    val mix = (Seq(3, 1).map((_, true)) ++ Seq(2, 1).map((_, false))).toDF("s", "y")
    val m = Stats.aucExact(mix, col("s"), col("y")).head()
    assert(m.getLong(2) == 625000000000L && m.getDouble(3) == 0.625)
    // single class -> NULL
    assert(Stats.aucExact(Seq((1, true)).toDF("s", "y"), col("s"), col("y"))
      .head().isNullAt(3))
  }

  test("cramersV: 1 on a determined pair, ~0 on independence, NULL on 0 df") {
    // b = f(a): perfect association, V = 1
    val det = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"), ("z", "r"))
      .toDF("a", "b")
    val r1 = Stats.cramersV(det, col("a"), col("b")).head()
    assert(math.abs(r1.getDouble(3) - 1.0) < 1e-6, s"determined pair: $r1")
    // perfectly balanced 2x2: exact independence, V = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val r2 = Stats.cramersV(ind, col("a"), col("b")).head()
    assert(r2.getDouble(3) == 0.0, s"independent pair: $r2")
    // single category on one axis: min(r,c)-1 = 0 degrees -> NULL v
    val degen = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Stats.cramersV(degen, col("a"), col("b")).head().isNullAt(3))
  }

  test("spearman: monotone ±1 exactly, ties == in-memory midrank reference, NULL poles") {
    // any strictly monotone map scores exactly 1 (here x -> x³, where
    // Pearson on the raw values would be < 1)
    val cubic = Seq(1, 2, 3, 4, 5).map(x => (x, x * x * x)).toDF("x", "y")
    assert(Stats.spearman(cubic, col("x"), col("y")).head().getDouble(1) == 1.0)
    assert(Stats.spearman(cubic, col("x"), -col("y")).head().getDouble(1) == -1.0)
    // tied data vs the textbook midrank formulation computed in memory
    val data = Seq((1, 7), (2, 7), (2, 3), (3, 3), (3, 9), (4, 1), (4, 1), (5, 8))
    def midranks(vs: Seq[Int]): Map[Int, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val tied = sorted.count(_ == v)
        v -> (below + (tied + 1) / 2.0)
      }.toMap
    }
    val (xs, ys) = data.unzip
    val (rx, ry) = (midranks(xs), midranks(ys))
    val pairs = data.map { case (x, y) => (rx(x), ry(y)) }
    val n = pairs.size.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    for (nr <- Seq(1, 2, 32)) {
      val got = Stats.spearman(data.toDF("x", "y"), col("x"), col("y"),
        nRanges = nr).head()
      assert(got.getLong(0) == data.size.toLong, s"nRanges=$nr")
      assert(math.abs(got.getDouble(1) - expected) < 1e-9,
        s"nRanges=$nr: got ${got.getDouble(1)}, expected $expected")
    }
    // a constant column has zero rank variance -> NULL, not NaN
    val const = Seq((1, 5), (2, 5), (3, 5)).toDF("x", "y")
    assert(Stats.spearman(const, col("x"), col("y")).head().isNullAt(1))
    assert(Stats.spearman(const.limit(0), col("x"), col("y")).head().isNullAt(1))
  }

  test("prCurvePoints: confusion integers exact at every threshold, boundary rates") {
    // pos scores {3, 1}, neg {2, 1}: thresholds 1/2/3
    //   thr=1: tp=2 fp=2 -> p=0.5 r=1.0 | thr=2: tp=1 fp=1 -> p=0.5 r=0.5
    //   thr=3: tp=1 fp=0 -> p=1.0 r=0.5 f1=2/3
    val df = (Seq(3, 1).map((_, true)) ++ Seq(2, 1).map((_, false))).toDF("s", "y")
    val per = Stats.scoreClassCounts(df, col("s"), col("y"))
    val rows = Stats.prCurvePoints(per).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(rows(1.0) == ((2L, 2L, 0.5, 1.0)))
    assert(rows(2.0) == ((1L, 1L, 0.5, 0.5)))
    assert(rows(3.0) == ((1L, 0L, 1.0, 0.5)))
    // all-negative input: precision defined where fp > 0, recall NULL
    val neg = Seq((5, false), (7, false)).toDF("s", "y")
    val nrows = Stats.prCurvePoints(Stats.scoreClassCounts(neg, col("s"), col("y")))
      .collect()
    assert(nrows.forall(r => r.getLong(1) == 0L && r.isNullAt(4)))
    assert(nrows.find(_.getDouble(0) == 5.0).get.getDouble(3) == 0.0)
  }

  test("giniStump: hand-checked argmin, pure split preferred, constant score empty") {
    // pos scores {3, 3, 1}, neg {1, 2}: thresholds 1 and 2 (3 = max is
    // not a split). thr=1: (2/2 + 4/3)/5; thr=2: (4/3 + 0/2)/5 — the
    // right side of thr=2 is PURE (both pos), so thr=2 wins.
    val df = (Seq(3, 3, 1).map((_, true)) ++ Seq(1, 2).map((_, false)))
      .toDF("s", "y")
    val got = Stats.giniStump(Stats.scoreClassCounts(df, col("s"), col("y")))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getDouble(0) == 2.0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 1L, 2L, 2L)))
    // gini_e12 = ((4*1e12)//3 + 0) div 5
    assert(r.getLong(5) == 1333333333333L / 5)
    assert(math.abs(r.getDouble(6) - 1333333333333.0 / 1e12 / 5) < 5e-13)
    // constant score: no valid split -> EMPTY, not a degenerate row
    val const = Seq((4, true), (4, false), (4, true)).toDF("s", "y")
    assert(Stats.giniStump(Stats.scoreClassCounts(const, col("s"), col("y")))
      .collect().isEmpty)
  }

  test("cusumChangepoint locates a planted mean shift; flat and single-bucket poles") {
    // counts 1,1,1,9,9,9 per time 1..6: true changepoint after t=3.
    // dev_t = |6*prefix - t*30|: 24, 48, 72, 48, 24 -> argmax t=3.
    val rows = Seq(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 9, 5 -> 9, 6 -> 9)
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val got = Stats.cusumChangepoint(rows.map(Tuple1(_)).toDF("t"), col("t"))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(0) == 3 && r.getLong(1) == 3L)
    assert(r.getLong(2) == 6L && r.getLong(3) == 30L)
    assert(r.getLong(4) == 400000000000L) // (72·1e12) div 180
    assert(r.getDouble(5) == 72.0 / (6.0 * 30.0))
    // flat series: every deviation 0 -> earliest time, cusum exactly 0
    val flat = Seq(1, 2, 3, 4).flatMap(t => Seq.fill(5)(t))
    val fr = Stats.cusumChangepoint(flat.map(Tuple1(_)).toDF("t"), col("t")).head()
    assert(fr.getInt(0) == 1 && fr.getDouble(5) == 0.0)
    // single distinct time: no split exists -> EMPTY
    assert(Stats.cusumChangepoint(
      Seq(7, 7, 7).map(Tuple1(_)).toDF("t"), col("t")).collect().isEmpty)
    // the argmax is range-count independent (the sweep, not luck)
    for (nr <- Seq(1, 2, 7)) {
      val g = Stats.cusumChangepoint(rows.map(Tuple1(_)).toDF("t"), col("t"),
        nRanges = nr).head()
      assert(g.getInt(0) == 3 && g.getLong(4) == 400000000000L,
        s"nRanges=$nr")
    }
  }

  test("isotonicCalibration pools violations like in-memory PAV and stays monotone") {
    // fracs 0.1, 0.5, 0.3, 0.7 with equal weights: PAV pools the
    // (0.5, 0.3) violation to 0.4 -> iso = 0.1, 0.4, 0.4, 0.7
    val bins = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 3L), (3L, 10L, 7L))
      .toDF("bucket", "n", "n_pos")
      .withColumn("ssum", lit(0).cast("decimal(38,0)"))
    val got = Stats.isotonicCalibration(bins).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got == Map(0L -> 0.1, 1L -> 0.4, 2L -> 0.4, 3L -> 0.7))
    // weighted pooling + lattice minimax == BigInt replay on random bins
    val rnd = new scala.util.Random(11)
    val rb = (0L until 9L).map(bkt =>
      (bkt, 1L + rnd.nextInt(50).toLong, rnd.nextInt(40).toLong))
      .map { case (b, n, p) => (b, n, math.min(n, p)) }
    def latticeIso: Map[Long, BigInt] = {
      val S = BigInt("1000000000000")
      def pool(i: Int, j: Int): BigInt = {
        val seg = rb.slice(i, j + 1)
        S * seg.map(_._3).sum / seg.map(_._2).sum
      }
      rb.indices.map { t =>
        rb(t)._1 -> (0 to t).map(i =>
          (t until rb.size).map(j => pool(i, j)).min).max
      }.toMap
    }
    val gr = Stats.isotonicCalibration(
      rb.toDF("bucket", "n", "n_pos")
        .withColumn("ssum", lit(0).cast("decimal(38,0)")))
      .collect().map(r => r.getLong(0) -> BigInt(r.getLong(4)))
      .toMap
    assert(gr == latticeIso)
    // monotone by construction
    val seq = gr.toSeq.sortBy(_._1).map(_._2)
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y })
  }

  test("mannKendall: exact S and tie-corrected variance, z poles") {
    // strictly increasing counts per bucket: S = C(4,2) = 6 pairs all +1
    val up = Seq(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4)
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val r = Stats.mannKendall(up.map(Tuple1(_)).toDF("t"), col("t")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L)
    // no ties: var18 = 4*3*13 = 156; z = (6-1)/sqrt(156/18)
    assert(r.getLong(2) == 156L)
    assert(math.abs(r.getDouble(3) - 5.0 / math.sqrt(156.0 / 18.0)) < 5e-13)
    // constant series: every pair ties -> S = 0, var18 = 0 -> z NULL
    val flat = Seq(1, 2, 3).flatMap(t => Seq.fill(2)(t))
    val fr = Stats.mannKendall(flat.map(Tuple1(_)).toDF("t"), col("t")).head()
    assert(fr.getLong(1) == 0L && fr.getLong(2) == 0L && fr.isNullAt(3))
    // mixed ties: buckets with counts 2,1,2,3 -> pairs sgn:
    // (2,1)-1 (2,2)0 (2,3)+1 (1,2)+1 (1,3)+1 (2,3)+1 -> S=3; tie group
    // {2,2}: t=2 -> tsum = 2*1*9 = 18; var18 = 4*3*13 - 18 = 138
    val mixed = Seq(1 -> 2, 2 -> 1, 3 -> 2, 4 -> 3)
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val mr = Stats.mannKendall(mixed.map(Tuple1(_)).toDF("t"), col("t")).head()
    assert(mr.getLong(1) == 3L && mr.getLong(2) == 138L)
  }

  test("pettittChangepoint == brute-force sgn double sum, ties included, at several range counts") {
    // values shift distribution after t=3; ties across the boundary
    val rows = Seq((1, 10), (1, 12), (2, 11), (3, 10),
      (4, 50), (4, 52), (5, 50), (6, 12), (6, 55))
    def bruteU(t: Int): Long = {
      val (left, right) = rows.partition(_._1 <= t)
      left.map(_._2).flatMap(a => right.map(b => math.signum(a - b._2).toLong)).sum
    }
    val times = rows.map(_._1).distinct.sorted
    val best = times.dropRight(1)
      .map(t => (t, math.abs(bruteU(t))))
      .maxBy { case (t, u) => (u, -t) }
    for (nr <- Seq(1, 2, 7, 32)) {
      val got = Stats.pettittChangepoint(rows.toDF("t", "v"),
        col("t"), col("v"), nRanges = nr).head()
      assert(got.getInt(0) == best._1, s"nRanges=$nr")
      assert(got.getLong(3) == best._2, s"nRanges=$nr")
      assert(got.getLong(2) == rows.size)
      assert(math.abs(got.getDouble(4) -
        best._2.toDouble * 4.0 / (rows.size.toDouble * rows.size)) < 5e-13,
        s"nRanges=$nr")
    }
    // identical distribution throughout: |U| can still be nonzero, but a
    // single distinct time has no split -> EMPTY
    assert(Stats.pettittChangepoint(
      Seq((1, 5), (1, 7)).toDF("t", "v"), col("t"), col("v"))
      .collect().isEmpty)
  }

  test("theilSen: outlier-immune slope, exact floored lattice on negative slopes") {
    // y = 3x with one wild outlier: 6 of 10 pairwise slopes are 3,
    // so the median slope is exactly 3 (OLS would be dragged far off)
    val pts = Seq((0, 0), (1, 3), (2, 6), (3, 9), (4, 100))
    val r = Stats.theilSen(pts.toDF("x", "y"), col("x"), col("y")).head()
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 3.0)
    // negative non-divisible slope floors: (0,0),(2,-3) -> floor(-1.5e12)
    val neg = Stats.theilSen(Seq((0, 0), (2, -3)).toDF("x", "y"),
      col("x"), col("y")).head()
    assert(neg.getDouble(1) == -1.5)
    // rank-ceil(m/2) selection: slopes (0,1)=1, (1,2)=3, (0,2)=2
    // -> sorted {1,2,3}, rank ceil(1.5)=2 -> median 2
    val med = Stats.theilSen(Seq((0, 0), (1, 1), (2, 4)).toDF("x", "y"),
      col("x"), col("y")).head()
    assert(med.getLong(0) == 3L)
    assert(med.getDouble(1) == 2.0)
    // single point: no pairs -> EMPTY
    assert(Stats.theilSen(Seq((5, 5)).toDF("x", "y"), col("x"), col("y"))
      .collect().isEmpty)
  }

  test("every lattice readout presents its documented shape on ZERO-row input") {
    // the driver-certified 1-row/≤1-row readouts must not throw or emit
    // surprise shapes when the feed is empty — the cheap canary for a
    // future zero-row driver probe (argmax family → EMPTY; aggregate
    // family → one all-NULL/zero row with the same schema)
    val ev = Seq((1, 10)).toDF("t", "v").limit(0)
    val sy = Seq((1, true)).toDF("s", "y").limit(0)
    // aggregate family: one row, NULL statistic
    val auc = Stats.aucExact(sy, col("s"), col("y")).collect()
    assert(auc.length == 1 && auc.head.isNullAt(2) && auc.head.isNullAt(3))
    assert(Stats.aucExact(sy, col("s"), col("y")).columns.toSeq ==
      Seq("n_pos", "n_neg", "auc_e12", "auc"))
    val mk = Stats.mannKendall(ev, col("t")).collect()
    assert(mk.length == 1 && mk.head.getLong(0) == 0L && mk.head.isNullAt(3))
    // ks: the (n_a, n_b) groupBy over an empty sweep has nothing to group
    assert(Stats.ksTwoSample(ev, col("v"), col("t") > 0).collect().isEmpty)
    // argmax/argmin family: EMPTY, not a degenerate row
    assert(Stats.giniStump(
      Stats.scoreClassCounts(sy, col("s"), col("y"))).collect().isEmpty)
    assert(Stats.cusumChangepoint(ev, col("t")).collect().isEmpty)
    assert(Stats.pettittChangepoint(ev, col("t"), col("v")).collect().isEmpty)
    assert(Stats.theilSen(ev, col("t"), col("v")).collect().isEmpty)
    // bucket-domain family: empty bins -> empty curve
    assert(Stats.isotonicCalibration(
      Stats.calibrationBins(ev, col("v"), col("t") > 0)).collect().isEmpty)
  }

  test("giniStump == in-memory brute force at several range counts, ties to lowest thr") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(_ => (rnd.nextInt(12), rnd.nextBoolean()))
    val df = rows.toDF("s", "y")
    // brute force over distinct thresholds, lattice arithmetic replayed
    val n = rows.size
    val p = rows.count(_._2)
    def bf: (Double, BigInt) = {
      val cands = rows.map(_._1).distinct.sorted.dropRight(1).map { t =>
        val nl = rows.count(_._1 <= t)
        val pl = rows.count(r => r._1 <= t && r._2)
        val ql = nl - pl
        val (nr, pr) = (n - nl, p - pl)
        val qr = nr - pr
        def term(nn: Int, pp: Int, qq: Int): BigInt =
          (BigInt(nn) * nn - BigInt(pp) * pp - BigInt(qq) * qq) *
            BigInt("1000000000000") / nn
        (t.toDouble, term(nl, pl, ql) + term(nr, pr, qr))
      }
      cands.minBy { case (t, g) => (g, t) }
    }
    val (bthr, bg) = bf
    for (nr <- Seq(1, 2, 7, 32)) {
      val got = Stats.giniStump(
        Stats.scoreClassCounts(df, col("s"), col("y")), nRanges = nr)
        .collect().head
      assert(got.getDouble(0) == bthr, s"nRanges=$nr")
      assert(BigInt(got.getLong(5)) == bg / n, s"nRanges=$nr")
    }
  }
}
