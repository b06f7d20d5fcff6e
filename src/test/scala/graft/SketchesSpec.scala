package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count–min sketch: estimates must dominate exact counts (never
  * undercount), collapse to exactness when buckets are collision-free,
  * and the sketch must stay within its declared size bound.
  */
class SketchesSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // 5 keys with distinct known frequencies 1..5
  private def keys = (1 to 5).flatMap(k => Seq.fill(k)(s"key_$k")).toDF("tok")
  private def exact = keys.groupBy("tok").agg(count(lit(1)).as("exact_n"))

  test("estimates dominate exact counts; wide sketches are exact") {
    // width 4 forces collisions among 5 keys in at least one row
    val tight = Sketches.cmsEstimate(
      Sketches.countMin(keys, "tok", depth = 4, width = 4),
      exact, "tok", depth = 4, width = 4)
      .select("tok", "exact_n", "cms_n").as[(String, Long, Long)].collect()
    assert(tight.length == 5)
    assert(tight.forall { case (_, n, est) => est >= n },
      s"count-min must never undercount: ${tight.toSeq}")
    // width 4096 over 5 keys: every key's lightest bucket is private
    val wide = Sketches.cmsEstimate(
      Sketches.countMin(keys, "tok", depth = 4, width = 4096),
      exact, "tok", depth = 4, width = 4096)
      .select("tok", "exact_n", "cms_n").as[(String, Long, Long)].collect()
    assert(wide.forall { case (_, n, est) => est == n },
      s"collision-free buckets must be exact: ${wide.toSeq}")
  }

  test("sketches merge by bucket-wise sum (the streaming/partition-union property)") {
    val a = keys.filter(col("tok").isin("key_1", "key_2", "key_3"))
    val b = keys.filter(!col("tok").isin("key_1", "key_2", "key_3"))
    val merged = Sketches.countMin(a, "tok", 4, 8)
      .unionByName(Sketches.countMin(b, "tok", 4, 8))
      .groupBy("r", "bucket").agg(sum("n").as("n"))
    val whole = Sketches.countMin(keys, "tok", 4, 8)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "count-min must be linear: sketch(a ∪ b) = sketch(a) + sketch(b)")
  }

  test("sketch size is bounded by depth x width regardless of input size") {
    val sketch = Sketches.countMin(keys, "tok", depth = 4, width = 4)
    assert(sketch.count() <= 4L * 4L)
    // total mass per row equals the input row count
    val perRow = sketch.groupBy("r").agg(sum("n").as("t"))
      .select("t").as[Long].collect()
    assert(perRow.forall(_ == keys.count()))
  }

  // --- HyperLogLog ---------------------------------------------------------

  private def domain(n: Int) = (1 to n).map(i => s"item_$i").toDF("k")

  test("hll estimates high-cardinality domains within the published error") {
    // n = 4096 >> 2.5m for m=256: the raw estimator's regime; its standard
    // error is 1.04/sqrt(256) = 6.5% — assert a generous 4 sigma
    val est = Sketches.hllEstimate(Sketches.hllRegisters(domain(4096), "k"), b = 8)
      .select("raw_est").as[Double].head()
    assert(math.abs(est - 4096) / 4096 < 0.26,
      s"raw HLL estimate $est too far from 4096")
  }

  test("hll is insensitive to duplication (cardinality, not frequency)") {
    val once = domain(512)
    val tripled = once.unionAll(once).unionAll(once)
    val a = Sketches.hllEstimate(Sketches.hllRegisters(once, "k"), 8).collect()
    val b = Sketches.hllEstimate(Sketches.hllRegisters(tripled, "k"), 8).collect()
    assert(a.sameElements(b), "duplicate rows must not move any register")
  }

  test("hll registers merge by max (the partition-union property)") {
    val whole = domain(2048)
    val a = whole.filter(col("k") < "item_5") // lexicographic split
    val b = whole.filter(!(col("k") < "item_5"))
    val merged = Sketches.hllRegisters(a, "k")
      .unionByName(Sketches.hllRegisters(b, "k"))
      .groupBy("register").agg(max("m_rho").as("m_rho"))
    val direct = Sketches.hllRegisters(whole, "k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "hll(a ∪ b) must equal max-merge of hll(a), hll(b)")
  }

  test("grouped hll registers equal per-group global registers") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"item_$i")).toDF("g", "k")
    val grouped = Sketches.hllRegistersBy(df, "k", Seq("g"), b = 6)
    for (g <- Seq("g0", "g1", "g2")) {
      val direct = Sketches.hllRegisters(df.filter(col("g") === g), "k", b = 6)
      val slice = grouped.filter(col("g") === g).drop("g")
      assert(slice.exceptAll(direct).isEmpty && direct.exceptAll(slice).isEmpty,
        s"group $g registers diverge from a dedicated sketch")
    }
    val est = Sketches.hllEstimateBy(grouped, Seq("g"), b = 6)
      .select("g", "raw_est").as[(String, Double)].collect().toMap
    assert(est.keySet === Set("g0", "g1", "g2"))
    assert(est.values.forall(e => math.abs(e - 1000) / 1000 < 0.6))
  }

  // --- KMV bottom-k -------------------------------------------------------

  private def kmv(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.agg(call_function("kmv_sketch",
      graft.operators.Sketches.hash52(col("k")), lit(k)).as("s"))
      .select("s").as[Seq[Long]].head()

  test("kmv keeps the k smallest distinct hashes, ascending") {
    val ref = (1 to 1000)
      .map(i => s"item_$i")
      .map(s => java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
          .take(7).map("%02x".format(_)).mkString.take(13), 16))
      .distinct.sorted.take(64)
    assert(kmv(domain(1000), 64) === ref)
  }

  test("kmv is duplicate-insensitive and partition-order-insensitive") {
    val once = domain(300)
    val messy = once.unionAll(once).unionAll(once).repartition(17)
    assert(kmv(once, 32) === kmv(messy, 32))
  }

  test("kmv sketches of parts merge into the sketch of the whole") {
    val whole = domain(500)
    val a = whole.filter(col("k") < "item_3")
    val b = whole.filter(!(col("k") < "item_3"))
    val mergedU = kmv(a, 48) ++ kmv(b, 48)
    val merged = mergedU.distinct.sorted.take(48)
    assert(merged === kmv(whole, 48))
  }

  test("kmv rejects non-positive k at analysis time") {
    // k = 0 would silently return empty sketches from every group
    val e = intercept[Exception] { kmv(domain(10), 0) }
    assert(e.getMessage.contains("k >= 1"), s"got: ${e.getMessage}")
    val neg = intercept[Exception] { kmv(domain(10), -3) }
    assert(neg.getMessage.contains("k >= 1"))
  }

  test("kmv cardinality estimate lands within a few standard errors") {
    val hs = kmv(domain(5000), 128)
    val est = 127.0 * 4503599627370496.0 / hs.last.toDouble
    // relative std error ~ 1/sqrt(k-2) = 8.9%; allow 4 sigma
    assert(math.abs(est - 5000) / 5000 < 0.36, s"KMV estimate $est vs 5000")
  }

  test("hll sketch stays within m rows and legal rank range") {
    val regs = Sketches.hllRegisters(domain(10000), "k", b = 4).collect()
    assert(regs.length <= 16)
    // legal rank range for b=4 is 1..wBits+1 = 1..57 (56 suffix bits)
    assert(regs.forall { r =>
      val reg = r.getLong(0); val rho = r.getLong(1)
      reg >= 0 && reg < 16 && rho >= 1 && rho <= 57
    }, s"illegal register/rank: ${regs.toSeq}")
  }
}
