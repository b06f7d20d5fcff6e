package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Greedy k-center selection (Gonzalez farthest-point traversal) — the
  * diverse-subset curation primitive: pick k corpus vectors such that
  * every vector is close to some pick (a 2-approximation of the optimal
  * k-center cover). Training pipelines use it for coverage-maximizing
  * data selection, eval-set seeding, and quantizer initialization that
  * spreads where stride seeding clusters.
  *
  * Deterministic and engine-exact end to end: the seed is the lowest
  * id; squared euclidean distances accumulate per element in
  * DECIMAL(38,18) (`SUM(CAST((x−c)²  AS DECIMAL))` — the same pinned
  * element arithmetic as the portable ANN oracles), so the per-round
  * argmax (max coverage distance, ties to the lowest id) compares exact
  * decimals and replays identically in any engine — the registered
  * query's oracle unrolls all k rounds as CTEs.
  *
  * Scale shape per round: ONE 64-row broadcast join of the element
  * stream against the newly picked center's elements + ONE keyed
  * aggregate to (vec_id, d²) + ONE vec-keyed join updating the running
  * min + a TakeOrdered(1) argmax — corpus-sized frames only; driver
  * state is k·dim doubles (the picked vectors), the same bound as the
  * k-means seeding paths. The running-min frame is localCheckpointed
  * per round, so lineage stays O(1) and each round rescans nothing but
  * the checkpoint.
  *
  * Input `el`: the element stream (vec_id, i, x double) — DENSE
  * support required: every vector must carry the same index set (true
  * of exploded fixed-dim embedding arrays), because distances join on
  * the center's indices; a vector sharing no index with the current
  * center would silently drop from the coverage frame. Output: one
  * row per pick in selection order — (rnk, vec_id, radius) where
  * radius is the pick's coverage distance (its min d² to the earlier
  * picks, a round-12 DOUBLE from the exact decimal; NULL for the seed).
  */
object Coreset {

  def kCenters(el: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need at least one center, got $k")
    val spark = el.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    // the exact decimal radius rides to the edge and is cast to DOUBLE
    // by the ENGINE (driver-side BigDecimal.doubleValue measured 1 ULP
    // off DuckDB's decimal cast — the SQL-level cast is the proven-
    // parity conversion)
    val decSchema = StructType(Seq(
      StructField("rnk", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("radius", dec, nullable = true)))
    def centerElements(id: Long) = el.filter(col("vec_id") === id)
      .select(col("i"), col("x").as("cx"))
    def d2To(cel: DataFrame) = el
      .join(broadcast(cel), Seq("i"))
      .groupBy(col("vec_id"))
      .agg(sum(((col("x") - col("cx")) * (col("x") - col("cx"))).cast(dec))
        .as("d2"))
    // round-12 BEFORE the double cast: a DECIMAL(38,18)'s unscaled value
    // exceeds 2^53, and some engines convert via unscaled-int → double →
    // ·10^-scale (two roundings, 1 ULP off the correct cast); at scale 12
    // the unscaled value converts exactly everywhere
    def present(df: DataFrame) =
      df.select(col("rnk"), col("vec_id"),
        round(col("radius"), 12).cast(DoubleType).as("radius"))
    val seed = el.select(col("vec_id")).orderBy(col("vec_id")).limit(1).collect()
    if (seed.isEmpty)
      return present(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], decSchema))
    var picks = Vector[(Long, Long, java.math.BigDecimal)]((1L, seed.head.getLong(0), null))
    var scored = d2To(centerElements(seed.head.getLong(0)))
      .withColumnRenamed("d2", "mind2").localCheckpoint()
    for (r <- 2L to k.toLong) {
      val next = scored
        .filter(!col("vec_id").isInCollection(picks.map(_._2)))
        .orderBy(col("mind2").desc, col("vec_id")).limit(1).collect()
      if (next.nonEmpty) {
        val id = next.head.getLong(0)
        picks :+= ((r, id, next.head.getDecimal(1)))
        scored = scored
          .join(d2To(centerElements(id)), Seq("vec_id"))
          .select(col("vec_id"), least(col("mind2"), col("d2")).as("mind2"))
          .localCheckpoint()
      }
    }
    present(spark.createDataFrame(
      spark.sparkContext.parallelize(picks.map { case (r, id, rad) =>
        Row(r, id, rad)
      }, 1), decSchema))
  }
}
