package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture consumption: collapse an ordered op feed to the
  * latest surviving state, and the soft-delete three-way merge that
  * applies a prepared changeset to a target table.
  *
  * These are the two halves of how a warehouse ingests a transactional
  * source at scale (the reference replays full snapshots into SCD dims —
  * bl_cl.sql's close+insert recipes; a CDC feed is the incremental form
  * of the same contract): `applyChanges` turns a Debezium-shaped
  * (op, seq) stream into current rows, `mergeSoftDelete` folds those
  * rows into the stored table without rewriting unmatched history.
  *
  * Scale shape: `applyChanges` is ONE shuffle on the key (window ranked
  * per key — never a global window); `mergeSoftDelete` is one full outer
  * join on the key (AQE picks broadcast when the changeset is small —
  * the common case: a day's changes vs years of table).
  */
object Cdc {

  /** Latest surviving row per key from a CDC feed.
    *
    * `feed` carries the key columns, a per-key monotone sequence column
    * (LSN / commit ts / batch id), an op column with values
    * 'I' (insert), 'U' (update/upsert), 'D' (delete), and the payload
    * columns. The row with the highest sequence wins; if it is a delete
    * the key is absent from the output. Insert-after-delete (a higher-seq
    * 'I') resurrects the key — ops are interpreted by ORDER, not by
    * pairing, so an out-of-order-arriving feed folds to the same answer.
    *
    * PRECONDITION: (key, seq) should be unique — that is what "ordered
    * feed" means. Equal-seq ties still resolve deterministically
    * (op ascending: 'D' < 'I' < 'U', so a tied delete loses to a tied
    * upsert) rather than by partition luck, but a feed that hits this is
    * usually mis-extracted.
    */
  def applyChanges(feed: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame =
    latestRows(feed, keyCols, seqCol, opCol)
      .filter(col(opCol) =!= "D")
      .drop(seqCol, opCol)

  /** The winning row per key WITH its op and sequence retained — deletes
    * stay as tombstones. This is the mergeable form: `latestRows(a ∪ b)`
    * == `latestRows(latestRows(a) ∪ b)`, which is what lets a stored
    * state fold batch after batch ([[graft.streaming.StreamCdc]])
    * without ever replaying history; [[applyChanges]] is this plus
    * tombstone removal.
    */
  def latestRows(feed: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Three-way soft-delete merge (the Delta-style `MERGE` shape):
    *
    *  - matched, `source.deleteCol`      → row removed
    *  - matched, not deleted             → source values win ("updated")
    *  - source-only, not deleted         → row added ("inserted")
    *  - source-only, deleted             → no-op (delete of absent key)
    *  - target-only                      → row kept ("kept")
    *
    * Target and source must share the key + value schema (source adds
    * the boolean delete flag). Output is the post-merge table plus an
    * `action` column ('updated'/'inserted'/'kept') so a load can audit
    * what it did — drop it to get the plain table.
    */
  def mergeSoftDelete(target: DataFrame, source: DataFrame,
      keyCols: Seq[String], deleteCol: String): DataFrame = {
    val valueCols = target.columns.filterNot(keyCols.contains).toSeq
    val t = target.select(
      keyCols.map(col) ++ valueCols.map(c => col(c).as(s"t_$c")) :+
        lit(true).as("t_present"): _*)
    val sCols = keyCols.map(col) ++ valueCols.map(c => col(c).as(s"s_$c")) :+
      col(deleteCol).as("s_deleted")
    val src = source.select(sCols: _*)
    t.join(src, keyCols, "full_outer")
      .filter(!coalesce(col("s_deleted"), lit(false)))
      .select(
        keyCols.map(col) ++
          valueCols.map(c =>
            when(col("s_deleted").isNotNull, col(s"s_$c"))
              .otherwise(col(s"t_$c")).as(c)) :+
          when(col("t_present").isNotNull && col("s_deleted").isNotNull, "updated")
            .when(col("t_present").isNull, "inserted")
            .otherwise("kept").as("action"): _*)
  }
}
