package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of attribution — the unbounded-stream twin of
  * [[graft.operators.AsOfJoin.asOfBackward]]: each purchase is attributed
  * to the same user's latest click at-or-before it.
  *
  * Correctness under out-of-order arrival comes from the watermark: a
  * purchase is held in state until the watermark passes its event time —
  * at that point every click at-or-before it has arrived (or been
  * declared late), so the emitted attribution is final and equals the
  * batch answer. State stays bounded: purchases live only inside the
  * watermark window, and clicks at-or-below the watermark collapse to
  * the single dominant one (an older click can never beat a newer one
  * for any future purchase).
  */
object StreamAsOf {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long, is_click: Boolean)
  /** click event-times (µs) + pending (purchase id, event-time µs). */
  final case class Buf(clicks: Seq[Long], purchases: Seq[(Long, Long)])
  final case class Attribution(
      user_id: Long, event_id: Long, ts_us: Long, click_us: Option[Long])

  private def usOf(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000

  /** `events` needs (user_id, ts, event_id, event_type); rows of any
    * other event type are dropped before the stateful stage.
    *
    * Without `maxClickAge`, per-key state is bounded but AGGREGATE state is
    * not: a user with any click keeps their dominant click forever, so
    * total state grows with distinct-user cardinality. Pass `maxClickAge`
    * (the maximum attribution window) to evict the dominant click once
    * `watermark - click_ts` exceeds it — purchases more than `maxClickAge`
    * after the last click then attribute to nothing, and inactive users'
    * state is removed entirely on an event-time timeout.
    */
  def attribute(events: DataFrame, watermark: String = "2 hours",
      clickType: String = "click", purchaseType: String = "purchase",
      maxClickAge: Option[java.time.Duration] = None): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ttlUs = maxClickAge.map(d => d.toMillis * 1000).getOrElse(Long.MaxValue)
    events
      .filter(col("event_type").isin(clickType, purchaseType))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === clickType).as("is_click"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn(ttlUs))
  }

  /** click event-times (id, µs) pending conversion + purchase times (µs). */
  final case class BufC(clicks: Seq[(Long, Long)], purchases: Seq[Long])
  final case class Conversion(
      user_id: Long, event_id: Long, ts_us: Long, purchase_us: Option[Long])

  /** Streaming FORWARD as-of — time-to-convert: each click is resolved to
    * the same user's EARLIEST purchase at-or-after it within
    * `convWindow`, or finalized unconverted once the watermark proves no
    * such purchase can arrive. The unbounded-stream twin of
    * [[graft.operators.AsOfJoin.asOfForward]] with a conversion window.
    *
    * Finality is pure event time: a click with earliest candidate
    * purchase p is final once the watermark passes p (an earlier
    * candidate would be below the watermark, i.e. already arrived or
    * declared late); a click with no candidate is final unconverted once
    * the watermark passes click + convWindow. The window makes state
    * bounded BY CONTRACT (unlike the backward side, where the dominant
    * click collapses to one row): pending clicks live at most convWindow
    * past the watermark, and purchases are kept only while a pending or
    * future click could still claim them.
    */
  def timeToConvert(events: DataFrame, convWindow: java.time.Duration,
      watermark: String = "2 hours",
      clickType: String = "click", purchaseType: String = "purchase"): Dataset[Conversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = convWindow.toMillis * 1000
    events
      .filter(col("event_type").isin(clickType, purchaseType))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === clickType).as("is_click"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fnFwd(winUs))
  }

  private def fnFwd(winUs: Long)(userId: Long, it: Iterator[Ev],
      state: GroupState[BufC]): Iterator[Conversion] = {
    val prev = state.getOption.getOrElse(BufC(Nil, Nil))
    val evs = it.toSeq
    val clicks = prev.clicks ++
      evs.filter(_.is_click).map(e => (e.event_id, usOf(e.ts)))
    val purchases = prev.purchases ++
      evs.filterNot(_.is_click).map(e => usOf(e.ts))
    val wmUs = state.getCurrentWatermarkMs() * 1000

    // earliest candidate within the window; final when the watermark has
    // passed it (match) or passed click+window with no candidate (miss)
    def firstCand(cUs: Long): Option[Long] =
      purchases.filter(p => p >= cUs && p - cUs <= winUs).minOption
    val (ready, pending) = clicks.partition { case (_, cUs) =>
      firstCand(cUs).exists(_ <= wmUs) || (firstCand(cUs).isEmpty && cUs + winUs < wmUs)
    }
    val out = ready.sortBy(identity).map { case (id, cUs) =>
      Conversion(userId, id, cUs, firstCand(cUs).filter(_ <= wmUs))
    }

    // purchases stay relevant for pending clicks (p >= their ts) and for
    // clicks still above the watermark (p >= wm); everything older drops
    val floor = (pending.map(_._2) :+ wmUs).min
    val kept = purchases.filter(_ >= floor).distinct.sorted
    if (pending.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(BufC(pending, kept))
      // wake when the earliest pending click resolves either way; with
      // nothing pending, wake once the watermark passes the kept
      // purchases so an idle user's state still drains to removal
      val wake =
        if (pending.nonEmpty)
          pending.map { case (_, cUs) =>
            firstCand(cUs).getOrElse(cUs + winUs) / 1000 + 1
          }.minOption
        else kept.maxOption.map(_ / 1000 + 1)
      wake.foreach(w => state.setTimeoutTimestamp(
        math.max(w, state.getCurrentWatermarkMs() + 1)))
    }
    out.iterator
  }

  private def fn(ttlUs: Long)(userId: Long, it: Iterator[Ev],
      state: GroupState[Buf]): Iterator[Attribution] = {
    val prev = state.getOption.getOrElse(Buf(Nil, Nil))
    val evs = it.toSeq
    val clicks = prev.clicks ++ evs.filter(_.is_click).map(e => usOf(e.ts))
    val purchases = prev.purchases ++
      evs.filterNot(_.is_click).map(e => (e.event_id, usOf(e.ts)))

    // a purchase is final once the watermark passes it: no click at-or-
    // before it can still arrive
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val (ready, pending) = purchases.partition(_._2 <= wmUs)
    // the TTL applies at emit too, not only via state eviction: otherwise
    // a watermark jump that passes both a click's expiry and a pending
    // purchase in ONE batch would still attribute the purchase to the
    // expired click, making output depend on batch boundaries. With the
    // filter, attribution is a pure event-time function.
    val out = ready.sortBy(identity).map { case (id, pus) =>
      val eligible = clicks.filter(c => c <= pus && pus - c <= ttlUs)
      Attribution(userId, id, pus,
        if (eligible.isEmpty) None else Some(eligible.max))
    }

    // clicks above the watermark must be kept individually; those at-or-
    // below collapse to the dominant (latest) one — which is itself
    // evicted once it ages past the attribution TTL
    val (recent, old) = clicks.partition(_ > wmUs)
    val dominant = old.maxOption.filter(c => wmUs - c <= ttlUs)
    val kept = (recent ++ dominant).distinct
    if (pending.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(Buf(kept, pending))
      // wake when the watermark reaches the earliest pending purchase,
      // or (with a TTL) when the oldest kept click expires, so idle
      // users' state is evicted without waiting for their next event
      val wakes = pending.map(_._2 / 1000 + 1) ++
        (if (ttlUs != Long.MaxValue) kept.map(c => (c + ttlUs) / 1000 + 1) else Nil)
      wakes.minOption.foreach(wake =>
        state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1)))
    }
    out.iterator
  }
}
