package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomPrune
import graft.sources.Tables

/** Bloom semi-join reduction: the reduced join must equal the plain
  * semi-join exactly, and the bloom pass must actually prune.
  */
class BloomPruneSpec extends SparkSpec {

  private def probe = Tables.lineitem(spark, sfDir)
    .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  private def build = Tables.supplier(spark, sfDir)
    .filter(col("s_acctbal") > 6000)

  test("bloom-reduced semi-join equals the plain semi-join exactly") {
    val plain = probe.join(build, col("l_suppkey") === col("s_suppkey"), "left_semi")
    val reduced = BloomPrune.semiJoin(probe, build, "l_suppkey", "s_suppkey")
    assert(build.count() > 0, "fixture filter must keep some suppliers")
    assert(reduced.exceptAll(plain).isEmpty && plain.exceptAll(reduced).isEmpty,
      "bloom false positives must not survive the exact join")
  }

  test("the bloom pass prunes non-candidates before the join shuffle") {
    val total = probe.count()
    val exact = probe.join(build, col("l_suppkey") === col("s_suppkey"), "left_semi").count()
    val candidates = BloomPrune
      .probeFiltered(probe, build, "l_suppkey", "s_suppkey",
        estimatedItems = 1000L, numBits = 65536L)
      .count()
    assert(exact < total, "fixture must be selective or the test proves nothing")
    assert(candidates >= exact, "bloom must never drop a true match")
    // with 64K bits over a handful of keys the false-positive rate is
    // tiny: the candidate set must be near the exact set, far below total
    assert(candidates < (exact + (total - exact) / 10),
      s"bloom pruned too little: total=$total exact=$exact candidates=$candidates")
  }
}
