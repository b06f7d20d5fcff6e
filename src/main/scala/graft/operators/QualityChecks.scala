package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
