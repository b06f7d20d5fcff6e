package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling: with skew thresholds scaled to test data, a
  * join with one hot key gets its oversized partition split at runtime
  * (the `isSkew=true` marker in the final plan) — the automatic
  * counterpart of Skew.saltedJoin for moderate skew.
  */
class SkewJoinSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // 90% of probe rows share key 1; payload pads partition size
      val probe = (1 to 40000)
        .map(i => (if (i % 10 != 0) 1L else i.toLong, "x" * 60))
        .toDF("k", "pad")
      val build = (1 to 40000).map(i => (i.toLong, s"b$i")).toDF("k", "b")
      val j = probe.join(build, Seq("k"))
      // collect (not count) so THIS plan executes and AQE finalizes it
      assert(j.collect().length == 40000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isSkew=true") || p.contains("skew=true"),
        s"expected AQE skew-split markers in final plan:\n$p")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
