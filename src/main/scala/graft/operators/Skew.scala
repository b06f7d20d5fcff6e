package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: salt the hot keys.
  *
  * When one join key carries a disproportionate share of the probe side
  * (and the build side is too big to broadcast), a plain shuffle sends the
  * whole hot key to one task. Salting splits it `saltFactor` ways: the
  * probe side gets a deterministic per-row salt, the build side is
  * replicated once per salt, and the join key becomes (key, salt). AQE's
  * skew-join handles moderate skew automatically; this is the explicit
  * tool for the pathological tail.
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `keys`, salted `saltFactor` ways.
    * Build-side rows are replicated `saltFactor` times — size the factor
    * to the skew, not the cluster.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltExpr: Column =
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(saltFactor)).cast("int")
    val p = probe.withColumn("__salt", saltExpr)
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    p.join(b, keys :+ "__salt", joinType).drop("__salt")
  }
}
