package graft.operators

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generated date dimension (reference G2 — recursive CTE at
  * bl_cl.sql:1487-1507 producing 2022-01-01 … 2024-12-31 with day ordinal
  * surrogate + day/month/year/quarter attributes).
  *
  * Spark-first: `sequence()` + `explode` — a single literal-range expansion,
  * no recursion, no shuffle; `date_id` is the day ordinal (`datediff + 1`),
  * deterministic without a window.
  */
object DateDim {

  def build(spark: SparkSession, start: Date, end: Date): DataFrame = {
    spark.range(1).select(
      explode(sequence(lit(start), lit(end), expr("INTERVAL 1 DAY")))
        .as("full_date"))
      .select(
        col("full_date"),
        (datediff(col("full_date"), lit(start)).cast(LongType) + 1L)
          .as("date_id"),
        dayofmonth(col("full_date")).cast(LongType).as("day"),
        month(col("full_date")).cast(LongType).as("month"),
        year(col("full_date")).cast(LongType).as("year"),
        quarter(col("full_date")).cast(LongType).as("quarter"))
  }

  /** The reference's exact range: 1,096 rows. */
  def referenceRange(spark: SparkSession): DataFrame =
    build(spark, Date.valueOf("2022-01-01"), Date.valueOf("2024-12-31"))
}
