package graft.model

import java.sql.Date

/** Warehouse-wide constants.
  *
  * Mirrors the reference's sentinel conventions (bl_3nf.sql:225,265 — high
  * date 9999-12-31, low date 1900-01-01, NA default member with PK -1) as
  * named constants so every stage shares one definition.
  */
object Constants {
  /** SCD2 open-row sentinel end date (reference bl_cl.sql:343,352). */
  val HighDt: Date = Date.valueOf("9999-12-31")

  /** Low sentinel / initial-history start date (reference bl_3nf.sql:265). */
  val LowDt: Date = Date.valueOf("1900-01-01")

  /** Default "not available" member string (reference bl_3nf.sql:221-277). */
  val NA: String = "NA"

  /** Surrogate key reserved for the NA member of every dimension. */
  val NaKey: Long = -1L
}
