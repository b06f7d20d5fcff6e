package graft.operators

import java.sql.Date

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Constants

/** SCD Type-2 close + insert recipe (reference MERGE statements M1–M8,
  * bl_cl.sql:816-1132), as a pure DataFrame transform.
  *
  * Contract: `target` has columns `keys ++ changeCols ++ (start_dt, end_dt,
  * is_active)`; `source` has `keys ++ changeCols`. One call == one batch:
  *
  *  - an active target row whose key matches a source row with any changed
  *    attribute is **closed** (`end_dt := runDate, is_active := false`);
  *  - a source key absent from the target (any version) is **inserted**
  *    active (`start_dt := runDate, end_dt := 9999-12-31`).
  *
  * Reference quirk Q5 is preserved deliberately (SURVEY.md §8): the insert
  * branch matches on key only (bl_cl.sql:856, 973, 1013, 1121), so a
  * changed row is closed but its replacement is NOT re-inserted in the same
  * run — it arrives on the next batch.
  *
  * `runDate` is injected rather than `current_date()` (F8) so output is
  * deterministic and oracle-checkable.
  */
object Scd2 {
  val StartDt = "start_dt"
  val EndDt = "end_dt"
  val IsActive = "is_active"

  def scd2Apply(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      changeCols: Seq[String],
      runDate: Date): DataFrame = {
    val outCols = target.columns.toSeq
    // the source must carry EVERY attribute column (inserts need them);
    // changeCols is only the change-DETECTION subset (reference M3 vs M4:
    // each source watches its own columns, bl_cl.sql:915-918, 944-947)
    val attrCols = outCols.filterNot(Seq(StartDt, EndDt, IsActive).contains)
    val src = source.dropDuplicates(keys).select(attrCols.map(col): _*)

    val t = target.alias("t")
    val s = src.alias("s")
    val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val changePred = changeCols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c")))
      .reduce(_ || _)

    // M1/M3/M4/M7: active + matched + changed → close.
    val changedOriginals = t
      .filter(col(IsActive) && col(EndDt) === lit(Constants.HighDt))
      .join(s, keyCond && changePred, "left_semi")
    val closed = changedOriginals
      .withColumn(EndDt, lit(runDate))
      .withColumn(IsActive, lit(false))

    // A concrete version is identified by natural key + start_dt.
    val versionKey = keys :+ StartDt
    val untouched = target.join(
      changedOriginals.select(versionKey.map(col): _*), versionKey, "left_anti")

    // M2/M5/M6/M8 (quirk Q5): insert only keys never seen in the target.
    val inserts = src
      .join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .withColumn(StartDt, lit(runDate))
      .withColumn(EndDt, lit(Constants.HighDt))
      .withColumn(IsActive, lit(true))

    untouched.select(outCols.map(col): _*)
      .unionByName(closed.select(outCols.map(col): _*))
      .unionByName(inserts.select(outCols.map(col): _*))
  }

  /** Bootstrap a target from the first batch: every row active from
    * `startDate` (reference initial loads start history at LOW_DT).
    */
  def initial(source: DataFrame, keys: Seq[String], startDate: Date): DataFrame =
    source.dropDuplicates(keys)
      .withColumn(StartDt, lit(startDate))
      .withColumn(EndDt, lit(Constants.HighDt))
      .withColumn(IsActive, lit(true))

  /** POINT-IN-TIME resolution: join each fact row to the dimension
    * version valid at the fact's own date (`start_dt <= d < end_dt`) —
    * the temporal generalization of the active-version lookup (P4), so
    * facts straddling a version change resolve to the attributes that
    * were true WHEN THEY HAPPENED, not the attributes of today.
    *
    * PRECONDITION: version intervals must not overlap per natural key —
    * an overlap makes two versions "valid" at one date and silently
    * DUPLICATES every straddling fact row. Dimensions built by
    * [[scd2Apply]]/[[initial]] satisfy this by construction; for foreign
    * history, assert emptiness of
    * [[QualityChecks.scd2OverlapViolations]] first.
    *
    * Non-key dim attribute names must not collide with fact columns
    * (enforced — a silent duplicate output column would fail far from
    * the cause); rename or prefix dim attributes before resolving.
    *
    * Plan shape: a plain hash equi-join on the natural key with the
    * interval as a residual predicate — per key the dimension holds one
    * row per version, so the join output is bounded by |fact| × history
    * depth and no range-join machinery is needed. `how = "left"` keeps
    * facts with no valid version (they resolve to nulls, the NA-member
    * regime); inner drops them.
    */
  def pointInTime(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factDateCol: String, how: String = "inner"): DataFrame = {
    val dimAttrs = dim.columns.filterNot((keys ++ Seq(StartDt, EndDt)).contains)
    val collisions = dimAttrs.toSet.intersect(fact.columns.toSet)
    require(collisions.isEmpty,
      s"pointInTime would emit duplicate column name(s) ${collisions.mkString(", ")} — " +
        "rename these dim attributes (or drop the fact columns) before resolving")
    fact.join(
      dim,
      keys.map(k => fact(k) === dim(k)).reduce(_ && _) &&
        fact(factDateCol) >= dim(StartDt) && fact(factDateCol) < dim(EndDt),
      how)
      .drop(dim(StartDt)).drop(dim(EndDt))
      .select(fact.columns.map(fact(_)) ++ dimAttrs.map(dim(_)): _*)
  }
}
