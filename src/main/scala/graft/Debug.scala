package graft

import org.apache.spark.sql.SparkSession

/** Local iteration harness: time named queries (noop write, like Bench) on
  * SPARK_GRAFT_SF_DIR, or `--show` to print rows. Not part of the driver
  * contract.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", "524288"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val show = args.contains("--show")
    val explain = args.contains("--explain")
    if (args.contains("--aqe-off"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val repeat = args.find(_.startsWith("--repeat="))
      .map(_.stripPrefix("--repeat="))
      .map(v => v.toIntOption.filter(_ >= 1).getOrElse(
        sys.error(s"--repeat needs a positive integer, got '$v'")))
      .getOrElse(1)
    args.filterNot(_.startsWith("--")).foreach { name =>
      try {
        // construction included in the timing — some queries (iterative
        // clustering) do eager work before the final action, and Bench
        // times them the same way. --repeat=N reports the min of N runs
        // (steady state on a noisy host).
        var best = Double.MaxValue
        for (_ <- 1 to repeat) {
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, sfDir)
          if (explain) df.explain("formatted")
          if (show) df.show(20, false)
          else df.write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[debug] $name%-32s $best%8.2f s")
      } catch {
        case e: Throwable =>
          println(s"[debug] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
