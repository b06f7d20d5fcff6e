package graft

import java.util.concurrent.{Callable, Executors, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicBoolean
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is fully executed through a `noop`
  * write — unlike `count()`, that materializes every output column, so
  * Catalyst can't prune the work away. Failures are recorded per-query in
  * an `errors` object rather than masquerading as timings.
  *
  * Robustness against the harness's wall-clock cap (this host's CPU
  * allotment swings >10x between minutes, so a locally-fast run can blow
  * the cap):
  *   - a wall budget (SPARK_GRAFT_BENCH_BUDGET_S, default 480s of timed
  *     work measured from JVM start) stops issuing new queries once
  *     exceeded, recording the remainder as "skipped" instead of dying
  *     mid-run with no output at all;
  *   - a JVM shutdown hook prints the partial JSON line if the process is
  *     SIGTERM'd (timeout(1) rc=124) before the normal print;
  *   - warmup (untimed, pays per-query Janino+JIT codegen compilation) runs
  *     4 queries in flight to overlap compilation.
  */
object Bench {
  private val jvmStart = System.nanoTime()
  private def elapsedS: Double = (System.nanoTime() - jvmStart) / 1e9

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "480").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    val timings = scala.collection.concurrent.TrieMap[String, Double]()
    val errors = scala.collection.concurrent.TrieMap[String, String]()
    @volatile var skipped: List[String] = Nil
    @volatile var passTotals: List[Double] = Nil
    val printed = new AtomicBoolean(false)

    def emit(): Unit = if (printed.compareAndSet(false, true)) {
      val qs = timings.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      // a success in ANY pass is the query's timing; an error from the
      // other pass (host stall -> per-query timeout) is not a failure
      val realErrors = errors.toSeq.filterNot(e => timings.contains(e._1))
      val es = realErrors.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}:${jstr(v.take(200))}" }
        .mkString("{", ",", "}")
      val total = timings.values.sum
      val passes = passTotals.reverse.map(t => f"$t%.3f").mkString("[", ",", "]")
      val sk = skipped.sorted.map(jstr).mkString("[", ",", "]")
      println(
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"pass_totals":$passes,"n_ok":${timings.size},"n_err":${realErrors.size},"skipped":$sk,"wall_s":${f"$elapsedS%.1f"},"sf":"$sfDir"}""")
      Console.out.flush()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit()))

    // Untimed warmup at the smallest sf: first execution of each query's
    // generated code pays 10-120s of Janino+JIT compilation on this box
    // (measured: the same plan runs 83s cold, 7s warm) — benchmark the
    // steady state, not the compiler. 4 in flight overlaps compilation;
    // capped at half the budget so a slow host still gets timed numbers.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val warmups = queries.map { case (_, fn) =>
      Future {
        if (elapsedS < budgetS / 2)
          try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
      }
    }
    try Await.ready(Future.sequence(warmups), Duration.Inf)
    finally pool.shutdown()

    // Two timed passes, per-query minimum: a single pass benchmarks the
    // hypervisor (same query measured 1.4s and 141s back-to-back), so take
    // the min of two — but never start a new query past the wall budget,
    // and cancel any single query that runs past its per-query cap (job-
    // group cancellation) so one stall can't eat the harness's whole
    // wall-clock allowance.
    val queryCapS = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_S", "150").toLong
    val qpool = Executors.newSingleThreadExecutor()
    var remaining = List.empty[String]
    for (pass <- 1 to 2) {
      var passTotal = 0.0
      queries.foreach { case (name, fn) =>
        if (elapsedS > budgetS) {
          if (pass == 1 && !timings.contains(name) && !errors.contains(name))
            remaining ::= name
        } else if (pass == 2 && errors.get(name).exists(_.startsWith("timeout"))) {
          // don't re-run a query that already blew its per-query cap
        } else {
          val fut = qpool.submit(new Callable[Double] {
            def call(): Double = {
              spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
              val t0 = System.nanoTime()
              try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              finally spark.sparkContext.clearJobGroup()
              (System.nanoTime() - t0) / 1e9
            }
          })
          try {
            val t = fut.get(queryCapS, TimeUnit.SECONDS)
            passTotal += t
            timings(name) = math.min(timings.getOrElse(name, Double.MaxValue), t)
            errors.remove(name) // a later success supersedes a pass-1 error
          } catch {
            case _: TimeoutException =>
              spark.sparkContext.cancelJobGroup(name)
              fut.cancel(true)
              errors(name) = s"timeout >${queryCapS}s"
            case e: Throwable =>
              val cause = Option(e.getCause).getOrElse(e)
              errors(name) = Option(cause.getMessage).getOrElse(cause.getClass.getName)
          }
        }
      }
      passTotals ::= passTotal
    }
    qpool.shutdownNow()
    skipped = remaining
    emit()
    spark.stop()
  }
}
