package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully executed through a `noop`
  * write — unlike `count()`, that materializes every output column, so
  * Catalyst can't prune the work away. Failures are recorded per-query in
  * an `errors` object rather than masquerading as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // Untimed warmup at the smallest sf: first execution of each query's
    // generated code pays 10-120s of Janino+JIT compilation on this box
    // (measured: the same plan runs 83s cold, 7s warm) — benchmark the
    // steady state, not the compiler.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    queries.foreach { case (_, fn) =>
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Two timed passes, per-query minimum: this host's CPU allotment
    // swings by >10x between minutes (the same query measured 1.4s and
    // 141s in back-to-back runs), so a single pass benchmarks the
    // hypervisor, not the engine. The min of two passes is the best
    // available estimate of the engine's actual cost.
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val passTotals = (1 to 2).map { _ =>
      var passTotal = 0.0
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          passTotal += t
          timings(name) = math.min(timings.getOrElse(name, Double.MaxValue), t)
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        }
      }
      passTotal
    }
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val passes = passTotals.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"pass_totals":$passes,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
