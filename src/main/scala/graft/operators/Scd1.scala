package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** SCD Type-1 merge recipes (the reference's `ON CONFLICT DO NOTHING` /
  * `DO UPDATE` workhorse — bl_cl.sql:116 et al., M14/M15 in SURVEY.md §2.4).
  *
  * Spark has no write-side conflict detection on parquet, so the semantics
  * are expressed as declarative plans: dedup + left-anti + union. The
  * anti-join keeps the incoming side shuffled only by the natural key; when
  * the target is dimension-sized, Catalyst/AQE turns it into a broadcast.
  */
object Scd1 {

  /** Rows of `incoming` whose natural key is absent from `target`
    * (insert-if-absent detection, M14). Incoming is deduped on the key
    * first, matching the reference's unique-constraint semantics.
    */
  def newRows(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming
      .dropDuplicates(keys)
      .join(target.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** The merged table: target plus the new rows. Schemas must be
    * union-compatible by name.
    */
  def insertIfAbsent(target: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(newRows(target, incoming, keys))
}
