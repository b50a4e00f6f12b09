package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Shapes shared by the keyed stateful streaming operators. */
case class KeyedEvent(key: Long, ts: Timestamp, eventType: String, id: Long)
case class FailWarning(key: Long, warnId: Long, firstFail: Long, lastFail: Long)
case class KeyedClick(userId: Long, adId: Long, ts: Timestamp)
case class BlacklistWarning(userId: Long, adId: Long, dayStart: Long, msg: String)
case class OrderResult(key: Long, status: String, eventTs: Long)

private[streaming] case class LastEvent(tsMs: Long, eventType: String)
private[streaming] case class OrderState(createMs: Long, hasCreate: Boolean,
                                         payMs: Long, hasPay: Boolean)
/** `timerMs` records the actual registered cleanup-timer timestamp
  * (which may be clamped above the day end — see BlacklistProcessor), so
  * deletion targets the timer that exists; -1 = none. Unused by the
  * fMGWS form (which has no explicit timers).
  */
private[streaming] case class ClickState(dayStart: Long, cnt: Long, sent: Boolean,
                                         timerMs: Long = -1L)

/** Keyed stateful operators — the Structured Streaming forms of the
  * reference's KeyedProcessFunction / CEP jobs, built on
  * `flatMapGroupsWithState` (SURVEY.md §2.9, §7.3).
  *
  * All operators:
  *  - sort each group's micro-batch slice by (ts, id) before folding, so
  *    results are deterministic at any shuffle partitioning — the
  *    reference relies on parallelism=1 for ordering
  *    (e.g. HotItems.scala:44);
  *  - trust only event time (and the query watermark via
  *    GroupStateTimeout.EventTimeTimeout), never wall-clock, so replays
  *    are reproducible (SURVEY.md §7.4.5);
  *  - keep O(1) state per key — scale is bounded by live key count, not
  *    stream length.
  *
  * The same functions run in batch mode (state lives for the single
  * "batch" invocation; event-time timeouts never fire — batch oracle
  * equivalents live in graft.ops).
  */
object StatefulOps {

  /** Consecutive-fail detection (C2/C3: LoginFail.scala:61-119,
    * LoginFailWithCep.scala:50-57). Two consecutive `failValue` events on
    * the same key within `gapMs` emit a warning carrying both times; any
    * other event type resets the sequence (state cleared on success,
    * LoginFail.scala:97-100). Implements the intended <=gap semantics —
    * the reference's inverted >=2s comparison (LoginFail.scala:86) is a
    * documented bug (SURVEY.md Appendix A.1).
    *
    * State is expired once the watermark passes last-event + gap: beyond
    * that point no future event can pair with the stored one, so idle
    * keys hold no state — live-key-bounded, not total-distinct-key-
    * bounded. Requires an upstream watermark on `ts`.
    */
  def consecutiveFails(ds: Dataset[KeyedEvent], failValue: String,
                       gapMs: Long): Dataset[FailWarning] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastEvent, FailWarning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.id))
            val out = Seq.newBuilder[FailWarning]
            var prev = state.getOption
            sorted.foreach { e =>
              prev match {
                case Some(p) if p.eventType == failValue &&
                    e.eventType == failValue &&
                    e.ts.getTime - p.tsMs <= gapMs =>
                  out += FailWarning(key, e.id, p.tsMs / 1000, e.ts.getTime / 1000)
                case _ =>
              }
              prev = Some(LastEvent(e.ts.getTime, e.eventType))
            }
            prev.foreach { p =>
              state.update(p)
              state.setTimeoutTimestamp(
                Math.max(p.tsMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Create→pay timeout detection (C4/C5: OrderTimeout.scala:50-93,
    * OrderTimeoutWithoutCep.scala:60-156). Per key: a "create" must be
    * followed by a "pay" within `timeoutMs`. Emits the reference's tag
    * vocabulary: "payed successfully" (OrderTimeout.scala:91), "timeout"
    * (:80), "payed but already timeout"
    * (OrderTimeoutWithoutCep.scala:73), "already payed but not found
    * create" (:113). The deadline is create-time + timeout — the
    * reference's zero-state deadline (OrderTimeoutWithoutCep.scala:79) is
    * a documented bug (SURVEY.md Appendix A.2). Requires an upstream
    * watermark on `ts` (timeouts fire when the watermark passes the
    * deadline).
    */
  def orderTimeout(ds: Dataset[KeyedEvent], timeoutMs: Long): Dataset[OrderResult] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[OrderState, OrderResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[OrderState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val res =
              if (s.hasCreate) OrderResult(key, "timeout", s.createMs / 1000)
              else OrderResult(key, "already payed but not found create", s.payMs / 1000)
            Iterator.single(res)
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.id))
            val out = Seq.newBuilder[OrderResult]
            var s = state.getOption.getOrElse(OrderState(0L, false, 0L, false))
            sorted.foreach { e =>
              e.eventType match {
                case "create" =>
                  if (s.hasPay) {
                    out += (if (s.payMs <= e.ts.getTime + timeoutMs)
                      OrderResult(key, "payed successfully", s.payMs / 1000)
                    else OrderResult(key, "payed but already timeout", s.payMs / 1000))
                    s = OrderState(0L, false, 0L, false)
                  } else s = s.copy(createMs = e.ts.getTime, hasCreate = true)
                case "pay" =>
                  if (s.hasCreate) {
                    out += (if (e.ts.getTime <= s.createMs + timeoutMs)
                      OrderResult(key, "payed successfully", e.ts.getTime / 1000)
                    else OrderResult(key, "payed but already timeout", e.ts.getTime / 1000))
                    s = OrderState(0L, false, 0L, false)
                  } else s = s.copy(payMs = e.ts.getTime, hasPay = true)
                case _ => // ignore unknown event types
              }
            }
            if (s.hasCreate || s.hasPay) {
              state.update(s)
              val deadline =
                if (s.hasCreate) s.createMs + timeoutMs else s.payMs + timeoutMs
              // a deadline at/behind the watermark would throw; clamp so the
              // timeout fires on the next micro-batch instead
              state.setTimeoutTimestamp(Math.max(deadline, state.getCurrentWatermarkMs() + 1))
            } else if (state.exists) state.remove()
            out.result().iterator
          }
      }
  }

  /** Click-fraud blacklist (C1: AdStatisticsByGeo.scala:68-113). Per
    * (user, ad): count clicks within each event-time day; on reaching
    * `threshold`, emit one warning for that day and stay silent until the
    * day rolls over. The reference resets state with a processing-time
    * timer at midnight (:86-88,:105-112); here the day boundary is
    * derived from event time, which is deterministic under replay.
    *
    * Day changes only move forward: a late event from an older day than
    * the stored one is ignored rather than resetting dayStart backwards
    * (which would zero the current day's count and re-arm `sent`). State
    * expires once the watermark passes the stored day's end, so idle
    * (user, ad) keys hold no state. Requires an upstream watermark.
    */
  def clickBlacklist(ds: Dataset[KeyedClick], threshold: Long): Dataset[BlacklistWarning] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(c => (c.userId, c.adId))
      .flatMapGroupsWithState[ClickState, BlacklistWarning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[ClickState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (userId, adId) = key
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[BlacklistWarning]
            var s = state.getOption.getOrElse(ClickState(-1L, 0L, sent = false))
            sorted.foreach { c =>
              val day = Math.floorDiv(c.ts.getTime / 1000, 86400L) * 86400L
              if (day >= s.dayStart) {        // ignore regressions to older days
                if (day > s.dayStart) s = ClickState(day, 0L, sent = false)
                s = s.copy(cnt = s.cnt + 1)
                if (s.cnt >= threshold && !s.sent) {
                  out += BlacklistWarning(userId, adId, s.dayStart,
                    s"Click over $threshold times today.")
                  s = s.copy(sent = true)
                }
              }
            }
            state.update(s)
            state.setTimeoutTimestamp(
              Math.max((s.dayStart + 86400L) * 1000L, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** Two-stream reconciliation as a streaming full-outer join (C6:
    * TxMatchDetect.scala:88-138). Watermarks + the time-range condition
    * bound the join state; matched rows have both sides, unmatched rows
    * surface with a null side once the watermark closes the interval —
    * subsuming the reference's manual 5s timers + side outputs.
    * Left columns: (key, left_ts, ...); right: (r_key, right_ts, ...).
    */
  def reconcileStreams(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       tolerance: String, watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs - INTERVAL $tolerance" +
             s" AND $rightTs <= $leftTs + INTERVAL $tolerance"),
        "full_outer")
      .withColumn("tag",
        when(col(leftKey).isNotNull && col(rightKey).isNotNull, "matched")
          .when(col(leftKey).isNotNull, "unmatched_left")
          .otherwise("unmatched_right"))
}
