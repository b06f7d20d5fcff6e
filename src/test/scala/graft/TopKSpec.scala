package graft

import org.apache.spark.sql.functions._

/** The bounded-heap `topk_pairs` aggregate (graft.plans.TopKPairs) must
  * agree exactly with the window row_number formulation — same rows, same
  * ranks, same tie-breaks — including across partial-aggregation merges.
  */
class TopKSpec extends SparkSpec {

  test("topk_pairs == window row_number top-k, across partial merges") {
    // deterministic scores with heavy planted ties (1000 distinct values
    // over ~1400 rows per key); 13 partitions force partial-buffer merges
    val scored = spark.range(10000).toDF("i")
      .select(
        (col("i") % 7).as("qid"),
        col("i").as("nid"),
        ((col("i") * 48271 % 1000) / lit(1000.0)).as("cosine"))
      .repartition(13)

    val heap = scored.groupBy("qid")
      .agg(call_function("topk_pairs", col("cosine"), col("nid"), lit(5)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id").as("nid"), col("col.score").as("cosine"),
        (col("pos") + 1).as("rank"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    val win = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("nid"), col("cosine"), col("rank"))

    assert(heap.count() == 7 * 5)
    assert(heap.exceptAll(win).isEmpty && win.exceptAll(heap).isEmpty,
      "heap top-k must equal window top-k row for row")
  }

  test("topk_pairs aggregates partially (map-side combine before the shuffle)") {
    val df = spark.range(100).toDF("nid")
      .select((col("nid") % 3).as("qid"), col("nid"), (col("nid") * 0.5).as("cosine"))
      .groupBy("qid")
      .agg(call_function("topk_pairs", col("cosine"), col("nid"), lit(2)).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_pairs"),
      s"no partial aggregation stage:\n$plan")
  }

  test("topk_pairs handles keys with fewer than k rows") {
    val tiny = spark.range(3).toDF("nid")
      .select(lit(0L).as("qid"), col("nid"), (col("nid") * 0.1).as("cosine"))
    val out = tiny.groupBy("qid")
      .agg(call_function("topk_pairs", col("cosine"), col("nid"), lit(10)).as("top"))
      .select(size(col("top")).as("n"))
    assert(out.head().getInt(0) == 3)
  }
}
