package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction via a Bloom filter — the classic technique for a
  * selective dimension filter against a huge probe side: build a compact
  * bloom filter of the (filtered) build-side keys with one small
  * aggregate, broadcast the single filter row, and drop probe rows that
  * cannot match BEFORE they reach the join shuffle. The bloom pass is a
  * pure optimization — false positives survive it but are removed by the
  * exact semi-join that follows, so the result is identical to the plain
  * semi-join; what changes is that at 100 TB only the candidate fraction
  * of the probe side ever shuffles.
  *
  * Uses Spark's own runtime-filter expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, registered as `bloom_agg` /
  * `bloom_might_contain` by [[graft.plans.GraftExtensions]]) — the same
  * machinery `InjectRuntimeFilters` plans automatically when its
  * heuristics fire; this operator is the explicit form for when they
  * don't (e.g. the build side is only known selective at runtime).
  */
object BloomPrune {

  /** Probe rows whose key passes the build-side bloom filter — exact
    * matches plus bloom false positives. The building block; most callers
    * want [[semiJoin]]. The filter arrives as a SCALAR SUBQUERY
    * (`Dataset.scalar`) — `might_contain` requires a constant or scalar
    * subquery input, and the subquery plans as one tiny aggregate whose
    * single binary row ships to every task, never a per-row join.
    */
  def probeFiltered(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, estimatedItems: Long, numBits: Long): DataFrame = {
    val bloom = build.agg(
      call_function("bloom_agg",
        xxhash64(col(buildKey)), lit(estimatedItems), lit(numBits)).as("graft_bf"))
    probe.filter(call_function("bloom_might_contain",
      bloom.scalar(), xxhash64(col(probeKey))))
  }

  /** The exact semi-join, with the probe side bloom-reduced first.
    * Result ≡ `probe.join(build, probeKey === buildKey, "left_semi")`.
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, estimatedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame =
    probeFiltered(probe, build, probeKey, buildKey, estimatedItems, numBits)
      .join(build.select(col(buildKey)).distinct(),
        col(probeKey) === col(buildKey), "left_semi")
}
