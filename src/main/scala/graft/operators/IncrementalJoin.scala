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
}
