package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of a JOIN view (the join-level sibling of
  * [[IncrementalAgg]]'s aggregate-level maintenance).
  *
  * For an inner equi-join view `V = A ⋈ B` under append batches `ΔA`,
  * `ΔB`, the new matched pairs partition EXACTLY by which side of each
  * pair is new (classic algebraic view maintenance, Blakeley et al.,
  * SIGMOD 1986):
  *
  * {{{ (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  V  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB }}}
  *
  * — a bag (multiset) identity, so multiplicities from duplicate join
  * keys come out exact, not merely set-equal. The refresh never touches
  * `V` itself: each delta term has at least one delta input, so at
  * 100 TB a day's refresh joins the day's rows against the stored sides
  * (shuffling or broadcasting the DELTA, with partition pruning and
  * bucketed layouts of `A`/`B` doing their usual work) instead of
  * recomputing a history×history join. Catalyst/AQE pick the physical
  * join per term — a small ΔA broadcasts against B, and ΔA⋈ΔB is
  * broadcast on either side.
  */
object IncrementalJoin {

  /** The view delta `ΔV` for appends (`ΔA`, `ΔB`) against stored sides
    * (`aOld`, `bOld`), joining on `keys`. Append `ΔV` to the stored view
    * (and the deltas to their sides) to complete the refresh.
    */
  def delta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** The refreshed view: the stored `view` plus [[delta]]. */
  def maintained(view: DataFrame, aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(delta(aOld, aDelta, bOld, bDelta, keys))

  /** Retractable (weighted) view delta — the join-level sibling of
    * [[IncrementalAgg.mergeRetract]], and the standard ring-weighted IVM
    * treatment (DBToaster; Koch, PODS 2010): every row carries an
    * integer weight `wCol` (+1 insert, −1 delete/retraction), a joined
    * pair's weight is the PRODUCT of its sides' weights, and the same
    * three-term identity holds over weighted bags:
    *
    * {{{ w_{V'}(a⋈b) = w_V(a⋈b) + Δw_A(a)·w_B(b) + w_A(a)·Δw_B(b) + Δw_A(a)·Δw_B(b) }}}
    *
    * so deletes flow through the join as negative weights — deleting an
    * A row retracts exactly the pairs it once produced (its −1 times
    * each matching B weight), with no tombstone scan of the view. The
    * caller's stored sides/view accumulate these weighted rows;
    * [[present]] collapses them to the net bag. Rows whose net weight
    * reaches 0 vanish there — physical reclamation is compaction
    * ([[graft.sources.TableStore.compact]] over the presented frame).
    */
  def weightedDelta(aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame, keys: Seq[String],
      wCol: String = "w"): DataFrame = {
    import org.apache.spark.sql.functions.col
    def term(l: DataFrame, r: DataFrame): DataFrame = {
      val lw = l.withColumnRenamed(wCol, "__wl")
      val rw = r.withColumnRenamed(wCol, "__wr")
      lw.join(rw, keys)
        .withColumn(wCol, col("__wl") * col("__wr"))
        .drop("__wl", "__wr")
    }
    term(aDelta, bOld)
      .unionByName(term(aOld, bDelta))
      .unionByName(term(aDelta, bDelta))
  }

  /** Collapse a weighted view log to its net bag: one row per distinct
    * payload with the summed weight, zero-weight rows gone. The result
    * is the (row, multiplicity) readout of the view — the shape QA and
    * downstream aggregates consume (an aggregate over the bag is
    * `sum(w * measure)` over this frame).
    */
  def present(view: DataFrame, wCol: String = "w"): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    val payload = view.columns.filterNot(_ == wCol)
    view.groupBy(payload.map(col).toIndexedSeq: _*)
      .agg(sum(col(wCol)).cast("long").as(wCol))
      .filter(col(wCol) =!= 0L)
  }
}
