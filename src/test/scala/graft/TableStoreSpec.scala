package graft

import java.nio.file.{Files, Paths}

import graft.sources.TableStore

/** Crash-safe table storage (reference C6 per-statement transactionality):
  * overwrite publishes atomically via temp-write + rename, append
  * accumulates batches.
  */
class TableStoreSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("overwrite replaces content atomically and leaves no temp dirs") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    store.overwrite("t", Seq(1, 2, 3).toDF("v"))
    assert(store.read("t").count() == 3)
    store.overwrite("t", Seq(10, 20).toDF("v"))
    assert(store.read("t").as[Int].collect().sorted.toSeq == Seq(10, 20))
    val leftovers = Files.list(Paths.get(root)).toArray.map(_.toString)
      .filter(p => p.contains(".tmp_") || p.contains(".old_"))
    assert(leftovers.isEmpty, s"stale swap dirs: ${leftovers.toSeq}")
  }

  test("append accumulates; partitioned append lays out partition dirs") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    store.append("p", Seq((1, 2020), (2, 2021)).toDF("v", "yr"), Seq("yr"))
    store.append("p", Seq((3, 2021)).toDF("v", "yr"), Seq("yr"))
    assert(store.read("p").count() == 3)
    assert(Files.exists(Paths.get(s"$root/p/yr=2021")))
    assert(store.read("p").filter(col("yr") === 2021).count() == 2)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
