package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the pre-shuffle strategy for repeated big
  * joins on a stable key (SURVEY.md scale notes): two tables bucketed and
  * sorted on the join key join with NO exchange on either side.
  */
class BucketedJoinSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("join of co-bucketed tables runs without a shuffle") {
    val left = (1 to 10000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 10000).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(j.count() == 10000)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("approx_count_distinct stays within 5% of exact (the A2 scale path)") {
    val df = (1 to 20000).map(i => i % 3777).toDF("v")
    val exact = df.select(countDistinct(col("v"))).head().getLong(0)
    val approx = df.select(approx_count_distinct(col("v"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
