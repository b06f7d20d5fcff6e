package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-erasure (GDPR-style) key purge with FK cascade and an audit
  * trail — the warehouse-maintenance mirror of the reference's
  * per-load delete/insert discipline (bl_cl.sql merge blocks), and a
  * first-class need for any corpus that ingests user data.
  *
  * Scale shape: the purge key set is assumed small relative to the facts
  * (a deletion request batch); every deletion is a `left_anti` join that
  * Spark plans as a broadcast anti-join when the key set is small and a
  * shuffled one otherwise — never a driver-side collect of keys. Derived
  * keys for cascade levels (e.g. the order keys of purged customers) are
  * computed with a `left_semi` join and stay distributed end to end; the
  * audit counts are plain aggregates.
  */
object Purge {

  /** One cascade level: rows of `df` whose `keyCol` is NOT in `keys`
    * (i.e. the table after the purge).
    */
  def purgeKeys(df: DataFrame, keyCol: String, keys: DataFrame): DataFrame =
    df.join(keys.select(col(keys.columns.head).as(keyCol)).distinct(),
      Seq(keyCol), "left_anti")

  /** The FK-derived purge set one level down: values of `childFkOut`
    * taken from `parent` rows that ARE being purged.
    */
  def derivedKeys(
      parent: DataFrame, parentKeyCol: String, purged: DataFrame,
      childFkOut: String): DataFrame =
    parent
      .join(purged.select(col(purged.columns.head).as(parentKeyCol)).distinct(),
        Seq(parentKeyCol), "left_semi")
      .select(col(childFkOut))

  /** Audit row for one table: (table, rows_before, rows_removed), computed
    * as two aggregates — no driver loop, unionable across tables.
    */
  def audit(name: String, before: DataFrame, keyCol: String,
      keys: DataFrame): DataFrame = {
    val removed = before.join(
      keys.select(col(keys.columns.head).as(keyCol)).distinct(),
      Seq(keyCol), "left_semi")
    before.agg(count(lit(1)).as("rows_before"))
      .crossJoin(removed.agg(count(lit(1)).as("rows_removed")))
      .select(lit(name).as("table_name"),
        col("rows_before").cast("long"),
        col("rows_removed").cast("long"))
  }
}
