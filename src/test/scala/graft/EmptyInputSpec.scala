package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Every registered query against an ALL-EMPTY feed — the production
  * case a scheduled pipeline hits on a quiet day (an empty daily
  * partition, a feed that published headers and no rows). The contract:
  * a query either executes to an (empty) result, or fails with the
  * reference's C1 empty-source guard ("There is no data in the source"
  * — the documented abort the warehouse loaders intentionally raise).
  * Anything else — an analyzer error from a zero-column array literal, a
  * head() on an empty collect, a schema-inference failure on a fileless
  * table — is a crash a real pipeline would page on, and this spec
  * exists because six of them shipped unnoticed until round 13.
  */
class EmptyInputSpec extends SparkSpec {

  test("every registered query yields an empty result or the C1 guard on empty tables") {
    val dir = Files.createTempDirectory("graft_empty_feed").toString
    val tables = Files.list(Paths.get(sfDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    assert(tables.nonEmpty, s"no harness tables under $sfDir")
    tables.foreach { p =>
      val name = Paths.get(p).getFileName.toString
      spark.read.parquet(p).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$name")
    }

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable
              if e.getMessage != null &&
                e.getMessage.contains("There is no data in the source") =>
            None // the reference's C1 guard: a DEFINED refusal, not a crash
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
        }
      }
    }
    val failures =
      try Await.result(Future.sequence(results), Duration.Inf).flatten
      finally pool.shutdown()
    assert(failures.isEmpty,
      s"queries that crash on an empty feed:\n${failures.mkString("\n")}")
  }

  test("every registered query survives a null-laden feed (10% of non-key values)") {
    import org.apache.spark.sql.functions.{col, lit, pmod, when, xxhash64}
    val dir = Files.createTempDirectory("graft_null_feed").toString
    val tables = Files.list(Paths.get(sfDir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
    tables.foreach { p =>
      val name = Paths.get(p).getFileName.toString
      val df = spark.read.parquet(p)
      // null out a deterministic ~10% of every non-key value — the dirty
      // feed a real ingest sees; keys stay intact (a null key is a
      // different failure class, quarantined at staging)
      val dirty = df.columns.foldLeft(df) { (acc, c) =>
        if (c.toLowerCase.endsWith("key") || c.toLowerCase.endsWith("_id")) acc
        else acc.withColumn(c,
          when(pmod(xxhash64(col(c).cast("string"), lit(c)), lit(10)) === 0, lit(null))
            .otherwise(col(c)))
      }
      dirty.write.mode("overwrite").parquet(s"$dir/$name")
    }

    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable
              if e.getMessage != null &&
                e.getMessage.contains("There is no data in the source") =>
            None
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(160)}")
        }
      }
    }
    val failures =
      try Await.result(Future.sequence(results), Duration.Inf).flatten
      finally pool.shutdown()
    assert(failures.isEmpty,
      s"queries that crash on a null-laden feed:\n${failures.mkString("\n")}")
  }
}
