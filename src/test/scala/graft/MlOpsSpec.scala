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
}
