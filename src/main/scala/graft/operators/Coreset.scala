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
    // materialize the element stream ONCE: every round's distance pass
    // scans it, so k rounds re-ran the upstream parquet scan + dim×
    // posexplode ~k times — localCheckpoint makes those reads stored
    // element blocks (guide §2.4/§5: don't recompute what every
    // iteration re-reads; the element stream is the corpus the caller
    // already scans per round, so this adds no new memory class)
    val elC = el.localCheckpoint()
    // the picked center travels as ONE array literal (dim doubles —
    // driver state the operator already holds: picks are k·dim by
    // contract), so each round's distance pass is a single groupBy over
    // the checkpointed elements: no per-round broadcast-exchange build,
    // no join — the same shuffle-fewer-bytes/remove-the-join move as
    // guide §2.3-2.4. Collected doubles re-enter as literals bit-exactly,
    // and the per-element arithmetic ((x − cx)² cast DECIMAL, decimal
    // SUM) is unchanged, so the result is identical to the broadcast-
    // join formulation the oracle unrolls.
    def d2To(center: Array[Double]) = {
      val cx = element_at(lit(center), (col("i") + 1).cast("int"))
      elC
        .groupBy(col("vec_id"))
        .agg(sum(((col("x") - cx) * (col("x") - cx)).cast(dec))
          .as("d2"))
    }
    def toCenterArray(rows: Array[Row]): Array[Double] = {
      val dim = rows.map(r => r.getAs[Number]("i").intValue()).max + 1
      val arr = new Array[Double](dim)
      rows.foreach(r => arr(r.getAs[Number]("i").intValue()) =
        r.getAs[Number]("x").doubleValue())
      arr
    }
    // round-12 BEFORE the double cast: a DECIMAL(38,18)'s unscaled value
    // exceeds 2^53, and some engines convert via unscaled-int → double →
    // ·10^-scale (two roundings, 1 ULP off the correct cast); at scale 12
    // the unscaled value converts exactly everywhere
    def present(df: DataFrame) =
      df.select(col("rnk"), col("vec_id"),
        round(col("radius"), 12).cast(DoubleType).as("radius"))
    // seed pick fetches id AND elements in one job (limit(1) runs before
    // the join, so the join touches dim rows)
    val seedRows = elC
      .join(elC.select(col("vec_id")).orderBy(col("vec_id")).limit(1)
        .select(col("vec_id").as("__seed")),
        col("vec_id") === col("__seed"))
      .select(col("vec_id"), col("i"), col("x")).collect()
    if (seedRows.isEmpty)
      return present(spark.createDataFrame(spark.sparkContext.emptyRDD[Row], decSchema))
    val seedId = seedRows.head.getLong(0)
    var picks = Vector[(Long, Long, java.math.BigDecimal)]((1L, seedId, null))
    var scored = d2To(toCenterArray(seedRows))
      .withColumnRenamed("d2", "mind2").localCheckpoint()
    for (r <- 2L to k.toLong) {
      // ONE collect per round: the argmax row (rank r's pick + radius)
      // joined back to the checkpointed elements for its dim x-values —
      // replaces the separate argmax collect + center-filter scan
      val next = scored
        .filter(!col("vec_id").isInCollection(picks.map(_._2)))
        .orderBy(col("mind2").desc, col("vec_id")).limit(1)
        .join(elC, Seq("vec_id"))
        .select(col("vec_id"), col("mind2"), col("i"), col("x")).collect()
      if (next.nonEmpty) {
        val id = next.head.getLong(0)
        picks :+= ((r, id, next.head.getDecimal(1)))
        scored = scored
          .join(d2To(toCenterArray(next)), Seq("vec_id"))
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
