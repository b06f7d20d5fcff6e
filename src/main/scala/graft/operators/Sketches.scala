package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Count–min sketch over a key column — the fixed-size frequency summary
  * a streaming/scale pipeline keeps when exact per-key counts would need
  * unbounded state: `depth` hash rows × `width` buckets of counters,
  * estimate = min over rows of the key's bucket counter (always an
  * OVERestimate, biased by collisions only).
  *
  * Scale shape: the sketch build is one shuffle on (row, bucket) with
  * map-side partial aggregation — at most depth×width rows leave any
  * partition no matter how many input rows it holds, which is the whole
  * point of a sketch. Lookups join the (tiny, broadcastable) sketch.
  *
  * The hash family is md5-derived (high 60 bits of md5("r|" || key) mod
  * width) — deterministic and portable, so sketch contents and estimates
  * are replayable bit-for-bit by an external SQL oracle, same as the
  * portable MinHash/SimHash families.
  */
object Sketches {

  /** Bucket of `key` in hash row `r`. */
  def cmsBucket(key: Column, r: Int, width: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(s"$r|"), key)), 1, 15), 16, 10).cast(LongType),
      lit(width.toLong))

  /** Build the sketch: (r, bucket, n) — at most depth×width rows. */
  def countMin(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    keys
      .select(posexplode(
        array((0 until depth).map(r => cmsBucket(col(keyCol), r, width)): _*)))
      .groupBy(col("pos").as("r"), col("col").as("bucket"))
      .agg(count(lit(1)).cast(LongType).as("n"))

  /** Estimate each probe key's frequency: min over the sketch's rows of
    * its bucket counter. Probes keep their other columns; the sketch side
    * is at most depth×width rows (broadcast). PRECONDITION: probe rows
    * must be distinct — the estimate re-groups by the probe columns, so
    * duplicate rows collapse to one (probe a key once per distinct
    * context, or carry a row key).
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val keyed = probes.select(
      col("*"),
      posexplode(array((0 until depth).map(r => cmsBucket(col(keyCol), r, width)): _*))
        .as(Seq("__cms_r", "__cms_bucket")))
    keyed
      .join(broadcast(
        sketch.select(col("r").as("__cms_r"), col("bucket").as("__cms_bucket"),
          col("n").as("__cms_n"))),
        Seq("__cms_r", "__cms_bucket"), "left")
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("__cms_n"), lit(0L))).as("cms_n"))
  }
}
