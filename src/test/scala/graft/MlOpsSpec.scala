package graft

import org.apache.spark.sql.functions._

import graft.operators.{LangModel, Similarity, Sketches, Stats}

/** Edge cases of the ML-prep operators that the oracle rows can't reach
  * (degenerate ranges, filtered inputs, absent keys).
  */
class MlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("benfordAudit drops non-positive amounts and shares sum to 1") {
    val df = Seq(123.45, 0.0, -5.0, 912.0, 1.23, 19.99)
      .toDF("amt")
    val out = Stats.benfordAudit(df, col("amt")).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 4) // 0 and -5 excluded
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-12)
    // digit of 912.0 cents=91200 -> 9
    assert(out.exists(r => r.getAs[Long]("digit") == 9 && r.getAs[Long]("n") == 1))
  }

  test("driftChi2 degenerate value range lands everything in bin 0") {
    val df = Seq(
      (5.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (5.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (5.0, java.sql.Timestamp.valueOf("2024-01-03 00:00:00")))
      .toDF("v", "ts")
    val out = Stats.driftChi2(df, col("v"), col("ts"), nBins = 4).collect()
    assert(out.length == 1 && out.head.getAs[Long]("bin") == 0)
    assert(out.head.getAs[Long]("n_early") == 1) // strict midpoint: only t0
    assert(out.head.getAs[Long]("n_late") == 2)
  }

  test("driftChi2 one-sided split yields NULL chi2 terms, never NaN/Inf") {
    // all timestamps equal -> every row is 'late' (strict midpoint),
    // tot_early = 0 -> expected counts are 0; terms must guard to NULL
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq((1.0, t), (2.0, t), (9.0, t)).toDF("v", "ts")
    val out = Stats.driftChi2(df, col("v"), col("ts"), nBins = 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.isNullAt(3)), "degenerate split must yield NULL terms")
  }

  test("bigramScore survives bigram counts past the 64-bit product bound") {
    // 1000 docs x 9400 'a' tokens -> n_pair('a','a') = 9.399M; the
    // intermediate n_pair*10^12 exceeds 2^63 and would wrap long math
    // negative — the DECIMAL path must still score p = 1.0 exactly
    val txt = ("a " * 9400).trim
    val docs = (0L until 1000L).map((_, txt)).toDF("id", "text")
    val out = LangModel.bigramScore(docs, "id", "text")
      .agg(min("avg_prob"), max("avg_prob")).head()
    assert(out.getDouble(0) == 1.0 && out.getDouble(1) == 1.0)
  }

  test("tfidfTopK survives tf products past the 64-bit scale bound") {
    // two docs of 3100 repeated tokens: tfq*tf = 9.61e6, so the scaled
    // product exceeds 2^63 — long math wraps the dot product negative;
    // the DECIMAL path must rank the twin at cosine exactly 1.0
    val txt = ("x " * 3100).trim
    val docs = Seq((0L, txt), (1L, txt), (2L, "y z")).toDF("id", "text")
    val out = Similarity.tfidfTopK(docs, "id", "text", Seq(0L), k = 2).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("nid") == 1L)
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("bigramScoreHeldout: hand-checked smoothed lattice, OOV count, empty-train pole") {
    // train "a b a b": c(a,b)=2, c(b,a)=1, c(a)=2, c(b)=1, V={a,b}=2
    val train = Seq((0L, "a b a b")).toDF("id", "text")
    val test = Seq((1L, "a b c"), (3L, "z z")).toDF("id", "text")
    val out = LangModel.bigramScoreHeldout(train, test, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // doc 1: (a,b) -> (2+1)/(2+2)=0.75; (b,c) unseen pair, seen prev ->
    // (0+1)/(1+2) -> 333333333333; no OOV prev
    val (n1, o1, p1) = out(1L)
    assert(n1 == 2L && o1 == 0L)
    assert(p1 == (750000000000L + 333333333333L).toDouble / 2 / 1e12)
    // doc 3: prev 'z' unseen -> OOV, floor p = 1/(0+2)
    val (n3, o3, p3) = out(3L)
    assert(n3 == 1L && o3 == 1L && p3 == 0.5)
    // the model must come ONLY from train: scoring the same test docs
    // against an empty train degrades to the clamped p = 1 floor
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val deg = LangModel.bigramScoreHeldout(empty, test, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(deg(1L) == 1.0 && deg(3L) == 1.0)
  }

  test("bigramScore skips docs with fewer than two tokens") {
    val docs = Seq((1L, "a b a b"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val out = LangModel.bigramScore(docs, "id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    // transitions of doc 1: (a,b)x2,(b,a): p(b|a)=1, p(a|b)=1 -> avg 1.0
    assert(math.abs(out.head.getAs[Double]("avg_prob") - 1.0) < 1e-9)
  }

  test("tfidfTopK scores only term-sharing docs and excludes self") {
    val docs = Seq(
      (0L, "x y z"), (1L, "x y q"), (2L, "q r s"), (3L, "t u v"))
      .toDF("id", "text")
    val out = Similarity.tfidfTopK(docs, "id", "text", Seq(0L), k = 3)
      .collect()
    // doc 3 shares no term with query 0; doc 2 shares none either
    assert(out.map(_.getAs[Long]("nid")).toSet == Set(1L))
    assert(out.forall(_.getAs[Long]("qid") == 0L))
  }

  test("targetEncodeLoo: singleton category encodes NULL, others exact") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0))
      .toDF("cat", "y")
    val out = Stats.targetEncodeLoo(df, "cat", col("y"), "enc")
      .select("cat", "y", "enc").collect()
    val a10 = out.find(r => r.getString(0) == "a" && r.getDouble(1) == 10.0).get
    assert(a10.getDouble(2) == 25.0) // (20+30)/2
    assert(out.find(_.getString(0) == "b").get.isNullAt(2))
  }

  test("anovaF: zero within-group variance yields NULL, separation is large") {
    val degenerate = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L)).toDF("k", "v")
    assert(Stats.anovaF(degenerate, "k", col("v")).head().isNullAt(2))
    val separated = Seq(("a", 1L), ("a", 2L), ("b", 100L), ("b", 101L)).toDF("k", "v")
    val f = Stats.anovaF(separated, "k", col("v")).head().getDouble(2)
    assert(f > 1000.0, s"clear separation must dominate noise, got $f")
  }

  test("gini: equal amounts -> 0, total concentration -> (n-1)/n") {
    val equal = Seq(5.0, 5.0, 5.0, 5.0).toDF("x")
    val g0 = Stats.gini(equal, col("x")).head()
    assert(math.abs(g0.getAs[Double]("gini")) < 1e-12)
    val conc = Seq(0.0, 0.0, 0.0, 100.0).toDF("x")
    val g1 = Stats.gini(conc, col("x")).head().getAs[Double]("gini")
    assert(math.abs(g1 - 0.75) < 1e-12) // (n-1)/n with n=4
  }

  test("mergedVocab conserves corpus character mass") {
    val vocab = Seq(("aba", 3L), ("ab", 2L), ("b", 4L)).toDF("word", "n")
    val toks = graft.operators.Bpe.mergedVocab(vocab, "word", "n", rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = toks.map { case (t, n) => t.length * n }.sum
    assert(chars == 3 * 3 + 2 * 2 + 4) // every char survives merging
  }

  test("featureBucket is stable and in range") {
    val b = Seq("seg=AUTO").toDF("f")
      .select(Sketches.featureBucket(col("f"), 64).as("b"))
      .head().getLong(0)
    assert(b >= 0 && b < 64)
    // portable definition: md5 52-bit prefix mod 64
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("seg=AUTO".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(13)
    assert(b == java.lang.Long.parseLong(h, 16) % 64)
  }

  test("hashedBowScore: mean of per-token bucket weights, token-less docs absent") {
    import graft.operators.LinearModel
    // a 2-bucket model with known weights makes scores hand-checkable
    val weights = Seq((0L, 10), (1L, -10)).toDF("bucket", "w")
    val docs = Seq((1L, "x x y"), (2L, "   "), (3L, "y")).toDF("doc_id", "text")
    val scored = LinearModel.hashedBowScore(docs, "doc_id", "text", weights, 2)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, sc) => id -> ((n, sc)) }.toMap
    // recompute the buckets the operator's own hash assigns
    val bx = Seq("x").toDF("f").select(Sketches.featureBucket(col("f"), 2)).head().getLong(0)
    val by = Seq("y").toDF("f").select(Sketches.featureBucket(col("f"), 2)).head().getLong(0)
    def w(b: Long) = if (b == 0L) 10.0 else -10.0
    assert(scored(1L) == ((3L, (2 * w(bx) + w(by)) / 3.0)))
    assert(scored(3L) == ((1L, w(by))))
    assert(!scored.contains(2L), "whitespace-only doc has no features to score")
  }

  test("fdAudit counts violating groups and rows exactly; NULL dependents don't violate") {
    // det=1 -> {a, a, b}: violates with 3 rows; det=2 -> {c}: holds;
    // det=3 -> {d, NULL}: NULL is missing data, not a second value;
    // det=NULL rows are excluded from the determinant domain entirely
    val df = Seq(
      (Some(1), Some("a")), (Some(1), Some("a")), (Some(1), Some("b")),
      (Some(2), Some("c")),
      (Some(3), Some("d")), (Some(3), None),
      (None, Some("e")))
      .toDF("det", "dep")
    val r = graft.operators.QualityChecks.fdAudit(df,
      Seq(("det->dep", col("det"), col("dep")))).head()
    assert(r.getString(0) == "det->dep")
    assert(r.getLong(1) == 3L, "n_groups")
    assert(r.getLong(2) == 1L, "n_viol_groups")
    assert(r.getLong(3) == 6L, "n_rows excludes the null-determinant row")
    assert(r.getLong(4) == 3L, "n_viol_rows")
    assert(!r.getBoolean(5), "holds")
    // a held dependency reports holds = true with zeroed violation counts
    val held = graft.operators.QualityChecks.fdAudit(df.filter(col("det") =!= 1),
      Seq(("det->dep", col("det"), col("dep")))).head()
    assert(held.getBoolean(5) && held.getLong(2) == 0L && held.getLong(4) == 0L)
    // empty input: one row per candidate, zero groups, vacuously holds
    val empty = graft.operators.QualityChecks.fdAudit(df.limit(0),
      Seq(("det->dep", col("det"), col("dep")))).head()
    assert(empty.getLong(1) == 0L && empty.getBoolean(5))
  }
}
