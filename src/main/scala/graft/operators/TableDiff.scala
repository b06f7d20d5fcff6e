package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — classify every key of two keyed snapshots of the same
  * table as `added` / `removed` / `changed` / `unchanged`. The warehouse
  * uses this shape everywhere an incremental feed must be reconciled
  * against the previous load (the reference's change-detection predicates,
  * bl_cl.sql SCD blocks, generalized to a whole-table audit), and a
  * training-data pipeline uses it to audit corpus drift between crawl
  * snapshots.
  *
  * Plan shape: ONE full-outer shuffle join on the key columns; the class
  * is a null-safe column compare projected on top, so the whole diff is a
  * single exchange at any scale (no driver materialization, no
  * per-column passes). With both snapshots bucketed/partitioned on the
  * key the exchange disappears entirely.
  */
object TableDiff {

  /** Diff `newDf` against `oldDf` on `keyCols`, comparing `compareCols`.
    *
    * Output: keyCols ++ `diff_class` ++ per-compare-column old/new pairs
    * (`<col>_old`, `<col>_new`). `changed` uses null-safe inequality on
    * every compare column, so a NULL→value transition is a change, not a
    * silent match.
    */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    // one marker per side survives the outer join even when every
    // payload column is legitimately NULL
    val o = oldDf
      .select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(true))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"${c}_old"))
        :+ col("__in_old"): _*)
    val n = newDf
      .select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(true))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"${c}_new"))
        :+ col("__in_new"): _*)
    // no compare columns = presence-only diff: keys classify as
    // added/removed/unchanged, never changed
    val anyChanged = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keyCols, "full_outer")
      .withColumn(
        "diff_class",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }
}
