package graft

import org.apache.spark.sql.SparkSession

/** One-query profiler: `runMain graft.BenchOne q1 q2 ...` times each named
  * registered query on SPARK_GRAFT_SF_DIR (default sf0.1) — one untimed
  * warm execution (JIT/codegen), then SPARK_GRAFT_REPS timed reps (default
  * 3) — and prints per-rep seconds plus the min. `EXPLAIN=1` additionally
  * dumps the formatted physical plan once per query. The A/B harness for
  * single-query plan work; the official wall comes from [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val explain = sys.env.get("EXPLAIN").contains("1")
    val spark = SparkSession.builder()
      .appName("graft-bench-one").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "524288"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    args.foreach { name =>
      qs.get(name) match {
        case None => println(s"$name: NOT REGISTERED")
        case Some(f) =>
          if (explain) f(spark, sfDir).explain("formatted")
          def once(): Double = {
            val t0 = System.nanoTime()
            f(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm
          val ts = (1 to reps).map(_ => once())
          println(f"$name: min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
