package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.Pq
import graft.sources.Tables

/** Product-quantization ANN: code validity, the centroid identity (a
  * vector that IS a codebook entry gets exact ADC distances), and recall
  * against the exact squared-L2 ranking.
  */
class PqSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private val nSub = 32
  private val nCent = 16
  private lazy val corpus = Tables.embeddings(spark, sfDir)
  private lazy val cb = Pq.codebook(corpus, "vec_id", "embedding", nCent)

  test("every vector gets one code per subspace, codes within the codebook") {
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, nSub)
    val n = corpus.count()
    assert(codes.count() == n * nSub)
    val bad = codes.filter(col("code") < 0 || col("code") >= nCent ||
      col("m") < 0 || col("m") >= nSub)
    assert(bad.isEmpty)
    assert(codes.groupBy("nid").count().filter(col("count") =!= nSub).isEmpty)
  }

  test("native fused-loop encode agrees with the decimal reference code-for-code") {
    val ref = Pq.encode(corpus, "vec_id", "embedding", cb, nSub)
    val native = Pq.encodeNative(corpus, "vec_id", "embedding", cb, nSub)
    assert(native.count() == ref.count())
    assert(native.exceptAll(ref).isEmpty && ref.exceptAll(native).isEmpty,
      "double-argmin and decimal-argmin codes must agree on real data")
  }

  test("a codebook vector encodes to its own code in every subspace") {
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, nSub)
    // codebook entry j is the corpus vector at id j*stride (stride = n/16)
    val stride = math.max(1L, corpus.count() / nCent)
    val own = codes
      .filter(pmod(col("nid"), lit(stride)) === 0 &&
        col("nid") < stride * nCent)
      .withColumn("expect", (col("nid") / lit(stride)).cast("int"))
    assert(own.filter(col("code") =!= col("expect")).isEmpty,
      "a centroid's own subvector must be its nearest codebook entry")
  }

  test("ADC distance to a codebook vector equals the exact squared L2") {
    val k = corpus.count().toInt // full ranking: every codebook member ranked
    val got = Pq.adcTopK(corpus, corpus.filter(col("vec_id") === 1),
      "vec_id", "embedding", k, nSub, nCent)
    val stride = math.max(1L, corpus.count() / nCent)
    val dec = DecimalType(38, 18)
    // exact squared L2 from query 1 to each codebook vector, decimal-true
    val q = corpus.filter(col("vec_id") === 1)
      .select(posexplode(col("embedding")))
      .select(col("pos").as("i"), col("col").cast(DoubleType).as("qx"))
    val exact = corpus
      .filter(pmod(col("vec_id"), lit(stride)) === 0 &&
        col("vec_id") < stride * nCent)
      .select(col("vec_id").as("nid"), posexplode(col("embedding")))
      .select(col("nid"), col("pos").as("i"), col("col").cast(DoubleType).as("x"))
      .join(q, Seq("i"))
      .groupBy(col("nid"))
      .agg(round(sum(((col("x") - col("qx")) * (col("x") - col("qx"))).cast(dec))
        .cast(DoubleType), 12).as("d_exact"))
    val joined = got.join(exact, Seq("nid")).collect()
    assert(joined.nonEmpty, "top-50 must surface codebook members")
    joined.foreach { r =>
      val est = r.getAs[Double]("dist_est")
      val ex = r.getAs[Double]("d_exact")
      assert(est == ex, s"nid ${r.getAs[Long]("nid")}: ADC $est != exact $ex")
    }
  }

  test("IVF-PQ (probed lists only) still recalls the exact top-10") {
    val queries = corpus.filter(col("vec_id") < 5)
    // coarse: nearest strided centroid per vector, queries probe 4 lists
    val stride = math.max(1L, corpus.count() / nCent)
    val cents = corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(nCent)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast(org.apache.spark.sql.types.DoubleType)).as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def nearest(vec: Seq[Double], top: Int): Seq[Long] =
      cents.map { case (cid, cv) =>
        (cid, vec.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sortBy { case (cid, d) => (d, cid) }.take(top).map(_._1).toSeq
    val vecs = corpus.select(col("vec_id"),
      transform(col("embedding"), x => x.cast(org.apache.spark.sql.types.DoubleType)).as("v"))
      .as[(Long, Seq[Double])].collect()
    val listOf = vecs.map { case (id, v) => id -> nearest(v, 1).head }.toMap
    val pairs = (for {
      (qid, qv) <- vecs if qid < 5
      probed = nearest(qv, 4).toSet
      (nid, _) <- vecs if nid != qid && probed.contains(listOf(nid))
    } yield (qid, nid)).toSeq.toDF("qid", "nid")
    val got = Pq.adcTopKForPairs(corpus, queries, "vec_id", "embedding",
      pairs, 3, nSub, nCent)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = vecs.filter(_._1 < 5).map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid)
        .map { case (nid, v) =>
          (nid, v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (nid, dd) => (dd, nid) }.take(10).map(_._1).toSet
    }.toMap
    val hits = got.map { case (qid, nids) => (nids & brute(qid)).size }.sum
    val total = got.values.map(_.size).sum
    assert(total > 0 && hits.toDouble / total >= 0.4,
      s"IVF-PQ recall vs exact top-10: $hits/$total")
  }

  test("PQ top-3 recalls most of the exact squared-L2 top-10") {
    val queries = corpus.filter(col("vec_id") < 5)
    val got = Pq.adcTopK(corpus, queries, "vec_id", "embedding", 3, nSub, nCent)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = corpus.select(col("vec_id").as("nid"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
    val q = queries.select(col("vec_id").as("qid"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("qv"))
    val brute = exact.crossJoin(q)
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        aggregate(zip_with(col("v"), col("qv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, e) => acc + e).as("d"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d"), col("nid"))))
      .filter(col("r") <= 10)
      .select("qid", "nid").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = got.map { case (qid, nids) => (nids & brute(qid)).size }.sum
    val total = got.values.map(_.size).sum
    assert(total == 3 * got.size)
    assert(hits.toDouble / total >= 0.6,
      s"PQ recall vs exact top-10: $hits/$total")
  }
}
