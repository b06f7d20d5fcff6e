package graft

import org.apache.spark.sql.functions._

import graft.operators.{DateDim, Surrogates}

/** G1 surrogate keys + G2 date dimension (reference bl_3nf.sql:44,
  * bl_cl.sql:1487-1507).
  */
class SurrogatesDateDimSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("assign produces dense 1..n keys in natural-key order") {
    val df = Seq("delta", "alpha", "charlie", "bravo").toDF("nk")
    val keyed = Surrogates.assign(df, "sk", Seq(col("nk")))
      .orderBy("sk").select("sk", "nk").as[(Long, String)].collect()
    assert(keyed.toSeq == Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta")))
  }

  test("assignScalable matches assign exactly (distributed two-phase rank)") {
    val df = (1 to 500).map(i => f"key$i%03d").toDF("nk").repartition(7)
    val a = Surrogates.assign(df, "sk", Seq(col("nk"))).select("nk", "sk")
    val b = Surrogates.assignScalable(df, "sk", Seq(col("nk"))).select("nk", "sk")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("assignAfter continues past the existing max key") {
    val existing = Seq((-1L, "NA"), (1L, "a"), (2L, "b")).toDF("sk", "nk")
    val keyed = Surrogates.assignAfter(existing, Seq("c", "d").toDF("nk"), "sk", Seq(col("nk")))
    assert(keyed.select("sk").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("ntileScalable matches the window NTILE row for row, uneven buckets included") {
    // 23 rows into 4 buckets: sizes 6,6,6,5 — exercises the remainder path
    for (n <- Seq(23, 24, 3)) { // 3 < buckets: every row its own bucket
      val rows = (1 to n).map(i => ((i * 37) % n, i.toLong)).toDF("v", "id")
      val want = rows.withColumn("ntile",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("v").desc, col("id"))).cast("long"))
        .select("id", "ntile").as[(Long, Long)].collect().toMap
      val got = Surrogates.ntileScalable(rows, 4, Seq(col("v").desc, col("id")))
        .select("id", "ntile").as[(Long, Long)].collect().toMap
      assert(got == want, s"n=$n")
      // and no single-task global window in the scalable plan
      val p = Surrogates.ntileScalable(rows, 4, Seq(col("v").desc, col("id")))
        .queryExecution.sparkPlan
      assert(p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }.isEmpty, "scalable ntile must not plan an unpartitioned window")
    }
  }

  test("date dim covers the reference range with dense ordinals and correct parts") {
    val dd = DateDim.referenceRange(spark).cache()
    assert(dd.count() == 1096)
    assert(dd.agg(min("date_id"), max("date_id")).head() ==
      org.apache.spark.sql.Row(1L, 1096L))
    assert(dd.select(countDistinct("date_id")).head().getLong(0) == 1096)
    val q = dd.filter(col("full_date").isin("2022-03-31", "2022-04-01", "2024-12-31"))
      .orderBy("full_date").select("quarter", "year").as[(Long, Long)].collect()
    assert(q.toSeq == Seq((1L, 2022L), (2L, 2022L), (4L, 2024L)))
    dd.unpersist()
  }
}
