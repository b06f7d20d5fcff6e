package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** QA surface (reference bl_cl.sql:2191-2255): the duplicate detector and
  * the row-count sweep, as report DataFrames.
  */
object QualityChecks {

  /** C3/A7 — `check_for_duplicates`: natural-key groups with count > 1. */
  def duplicates(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as("n"))
      .filter(col("n") > 1)

  /** A8 — row-count sweep over named tables. */
  def countSweep(tables: Map[String, DataFrame]): DataFrame =
    tables.toSeq.sortBy(_._1)
      .map { case (name, df) =>
        df.agg(count(lit(1)).cast(LongType).as("n"))
          .select(lit(name).as("tbl"), col("n"))
      }
      .reduce(_ union _)

  /** Functional-dependency audit — the profiling step that DISCOVERS
    * (or certifies) det → dep rules before they're baked into a schema:
    * "is customer → priority actually functional, or does the feed
    * violate it?" For each candidate, one row:
    * (fd, n_groups, n_viol_groups, n_rows, n_viol_rows, holds) — a
    * determinant group violates when it maps to > 1 distinct dependent
    * value (NULL dependents are missing data, not a second value — both
    * engines' COUNT(DISTINCT) agrees). Exact integers end to end.
    *
    * Scale shape: one hash aggregate to determinant groups + one 1-row
    * rollup per candidate — each candidate costs one shuffle of its
    * group cardinality; the candidate list is the bounded axis (a real
    * FD miner sweeps column pairs, which is what the Seq is).
    */
  def fdAudit(df: DataFrame, cands: Seq[(String, Column, Column)]): DataFrame = {
    require(cands.nonEmpty, "need at least one candidate dependency")
    cands.map { case (name, det, dep) =>
      df.filter(det.isNotNull)
        .groupBy(det.as("__det"))
        .agg(count(lit(1)).cast(LongType).as("__n"),
          countDistinct(dep).cast(LongType).as("__nd"))
        .agg(
          count(lit(1)).cast(LongType).as("n_groups"),
          coalesce(sum(when(col("__nd") > 1, 1L).otherwise(0L)), lit(0L))
            .cast(LongType).as("n_viol_groups"),
          coalesce(sum(col("__n")), lit(0L)).cast(LongType).as("n_rows"),
          coalesce(sum(when(col("__nd") > 1, col("__n")).otherwise(0L)), lit(0L))
            .cast(LongType).as("n_viol_rows"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_viol_groups"),
          col("n_rows"), col("n_viol_rows"),
          (col("n_viol_groups") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** SCD2 invariant: at most one active row per natural key. Returns the
    * violating keys (empty == healthy).
    */
  def scd2ActiveViolations(dim: DataFrame, keyCols: Seq[String]): DataFrame =
    duplicates(dim.filter(col(Scd2.IsActive)), keyCols)

  /** SCD2 invariant: version intervals per natural key must not overlap
    * ([[Scd2.pointInTime]]'s precondition — overlapping versions silently
    * duplicate fact rows there). Returns one row per violating version
    * pair: the key columns plus the offending (start_dt, prev_end_dt)
    * where a version starts before its predecessor ends. One window over
    * the key — no self-join.
    */
  def scd2OverlapViolations(dim: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(Scd2.StartDt), col(Scd2.EndDt))
    dim
      .select(keyCols.map(col) ++ Seq(col(Scd2.StartDt), col(Scd2.EndDt)): _*)
      .withColumn("prev_end_dt", lag(col(Scd2.EndDt), 1).over(w))
      .filter(col("prev_end_dt").isNotNull && col(Scd2.StartDt) < col("prev_end_dt"))
      .select(keyCols.map(col) ++ Seq(col(Scd2.StartDt), col("prev_end_dt")): _*)
  }
}
