package graft

import org.apache.spark.sql.functions._

/** The market-basket pair miner (dm_part_affinity) against the naive
  * self-join formulation: same pairs, same supports, same top-20 cut.
  * The production shape scans the fact once and generates pairs map-side
  * per basket; the naive shape here is the semantic reference.
  */
class AffinitySpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("dm_part_affinity equals the self-join formulation") {
    val mined = SparkEntry.queries("dm_part_affinity")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSet
    val b = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val naive = b.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(b.select(col("l_orderkey"), col("l_partkey").as("part_b")), Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(20)
      .as[(Long, Long, Long)].collect().toSet
    assert(mined == naive,
      s"mined-only: ${mined -- naive}; naive-only: ${naive -- mined}")
  }
}
