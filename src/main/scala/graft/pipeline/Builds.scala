package graft.pipeline

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, year}

import graft.sources.{BuildCache, Tables}

/** The catalog's built-artifact entry points, living in `graft.pipeline`
  * DELIBERATELY: [[BuildCache]] digests this package's class files, so
  * editing any builder body below (or anything it calls) changes the
  * digest and invalidates its cached artifacts — the builder code can
  * never drift ahead of a cache hit. The spec strings passed to
  * [[BuildCache.dir]] only need to cover parameters, which are all
  * threaded as arguments here.
  */
object Builds {

  /** One-shot warehouse ([[Runner.runAll]]) for `sfDir`; returns the
    * store directory (cached across JVMs).
    */
  def warehouse(s: SparkSession, sfDir: String, runDate: Date): String =
    BuildCache.dir("wh", sfDir, s"runAll-1-$runDate") { p =>
      new Runner(s, sfDir, p).runAll(1, runDate); ()
    }

  /** Incrementally-built warehouse: the same source split into two loads
    * by order-key parity ([[Runner.runIncremental]]).
    */
  def incWarehouse(s: SparkSession, sfDir: String, runDate: Date): String =
    BuildCache.dir("whinc", sfDir, s"orderkey-parity2-$runDate") { p =>
      new Runner(s, sfDir, p).runIncremental(
        Seq(
          1 -> Map("orders" -> (col("o_orderkey") % 2 === 0),
            "lineitem" -> (col("l_orderkey") % 2 === 0)),
          2 -> Map("orders" -> (col("o_orderkey") % 2 === 1),
            "lineitem" -> (col("l_orderkey") % 2 === 1))),
        runDate)
      ()
    }

  /** Year-partitioned order fact (G3's partition-pruning substrate). */
  def partitionedFact(s: SparkSession, sfDir: String): String =
    BuildCache.dir("fact", sfDir, "year-partitioned") { p =>
      Tables.lineitem(s, sfDir)
        .join(Tables.orders(s, sfDir), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_quantity"),
          year(col("o_orderdate").cast("date")).as("order_year"))
        .write.partitionBy("order_year").parquet(p)
    }
}
