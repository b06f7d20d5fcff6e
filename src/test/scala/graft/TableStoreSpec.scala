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

  test("compact collapses many small append files without changing content") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new TableStore(spark, root)
    (0 until 6).foreach(b =>
      store.append("c", Seq(b * 2, b * 2 + 1).toDF("v").repartition(2)))
    assert(store.dataFileCount("c") >= 6, "fixture must start fragmented")
    val before = store.read("c").as[Int].collect().sorted.toSeq

    store.compact("c", targetRowsPerFile = 100)
    assert(store.dataFileCount("c") == 1, "12 rows fit one 100-row file")
    assert(store.read("c").as[Int].collect().sorted.toSeq == before)
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
