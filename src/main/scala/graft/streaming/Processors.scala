package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** C2/C3 on the Spark 4 arbitrary-state v2 API — the transformWithState
  * port of [[StatefulOps.consecutiveFails]]: two consecutive `failValue`
  * events on the same key within `gapMs` emit a warning; any other event
  * resets the sequence. An event-time timer at last-event + gap expires
  * idle keys (past that point no future event can pair with the stored
  * one), keeping state bounded by the live key count.
  *
  * Reference: login-fail-detect/.../LoginFail.scala:61-119 and
  * LoginFailWithCep.scala:50-57 (intended <=gap semantics, SURVEY.md
  * Appendix A.1). Requires a watermark and the RocksDB state store.
  */
class ConsecutiveFailsProcessor(failValue: String, gapMs: Long)
    extends StatefulProcessor[Long, KeyedEvent, FailWarning] {

  @transient private var state: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[LastEvent]("last",
      Encoders.product[LastEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                               timerValues: TimerValues): Iterator[FailWarning] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.id))
    val out = Seq.newBuilder[FailWarning]
    var prev = Option(state.get())
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
      getHandle.registerTimer(
        Math.max(p.tsMs + gapMs, timerValues.getCurrentWatermarkInMs + 1))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[FailWarning] = {
    val s = state.get()
    if (s != null && s.tsMs + gapMs <= expiredTimerInfo.getExpiryTimeInMs)
      state.clear()                         // stale timers for newer state no-op
    Iterator.empty
  }
}

object ConsecutiveFailsProcessor {
  def apply(ds: Dataset[KeyedEvent], failValue: String,
            gapMs: Long): Dataset[FailWarning] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new ConsecutiveFailsProcessor(failValue, gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** C4/C5 on the arbitrary-state v2 API — the transformWithState port of
  * [[StatefulOps.orderTimeout]]: per key a "create" must be followed by
  * a "pay" within `timeoutMs`. Emits the reference's tag vocabulary
  * ("payed successfully", "timeout", "payed but already timeout",
  * "already payed but not found create" —
  * OrderTimeout.scala:80,91; OrderTimeoutWithoutCep.scala:73,90,93,113,116).
  * The deadline timer is an explicit event-time timer instead of
  * GroupStateTimeout; expiry emits the timeout/orphan row and clears
  * state. Requires a watermark and the RocksDB state store.
  */
class OrderTimeoutProcessor(timeoutMs: Long)
    extends StatefulProcessor[Long, KeyedEvent, OrderResult] {

  @transient private var state: ValueState[OrderState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[OrderState]("order",
      Encoders.product[OrderState], TTLConfig.NONE)

  private def deadline(s: OrderState): Long =
    (if (s.hasCreate) s.createMs else s.payMs) + timeoutMs

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                               timerValues: TimerValues): Iterator[OrderResult] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.id))
    val out = Seq.newBuilder[OrderResult]
    var s = Option(state.get()).getOrElse(OrderState(0L, false, 0L, false))
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
      getHandle.registerTimer(
        Math.max(deadline(s), timerValues.getCurrentWatermarkInMs + 1))
    } else state.clear()
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[OrderResult] = {
    val s = state.get()
    if (s != null && deadline(s) <= expiredTimerInfo.getExpiryTimeInMs) {
      state.clear()
      Iterator.single(
        if (s.hasCreate) OrderResult(key, "timeout", s.createMs / 1000)
        else OrderResult(key, "already payed but not found create", s.payMs / 1000))
    } else Iterator.empty
  }
}

object OrderTimeoutProcessor {
  def apply(ds: Dataset[KeyedEvent], timeoutMs: Long): Dataset[OrderResult] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new OrderTimeoutProcessor(timeoutMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** One reconciliation verdict — the transformWithState port of C6.
  * `leftId`/`rightId` carry the matched events' ids (None on the
  * missing side of an unmatched verdict).
  */
case class ReconcileResult(key: Long, tag: String,
                           leftId: Option[Long], rightId: Option[Long])

/** At most ONE event is ever in flight per key — every arrival either
  * resolves the held event (matched or freed as unmatched) or
  * replaces it — so the state is a single slot, making the
  * one-in-flight invariant structural rather than implicit (the r18
  * review's simplification of the original two-sided record).
  */
private[streaming] case class ReconcileHeld(isLeft: Boolean, ms: Long,
                                            id: Long)

/** C6 on the arbitrary-state v2 API — the transformWithState port of
  * two-stream reconciliation, and the closest Spark analog of the
  * reference's connected-streams CoProcessFunction with one ValueState
  * per side + unmatched-side timers (TxMatchDetect.scala:88-138):
  * each arrival checks the held event; an opposite-side pair within
  * `toleranceMs` emits "matched", a pair outside it frees the older
  * held event as unmatched (its window can no longer cover the newer
  * arrival — batch rows fold in ts order) and holds the newer one,
  * and an event-time timer at ts + tolerance emits
  * "unmatched_left"/"unmatched_right" once the watermark proves the
  * other side can't arrive in the window — exactly the tag vocabulary
  * of [[StatefulOps.reconcileStreams]] (the stream-join form;
  * StreamingSpec pins the two equal on the same events).
  *
  * One in-flight event per key (the tx-id contract): a second
  * same-side arrival frees the held one as unmatched and takes its
  * place — the reference's ValueState overwrite made observable
  * instead of silent. Requires a watermark and the RocksDB store.
  */
class ReconcileProcessor(toleranceMs: Long)
    extends StatefulProcessor[Long, AsofEvent, ReconcileResult] {

  @transient private var state: ValueState[ReconcileHeld] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ReconcileHeld]("pending",
      Encoders.product[ReconcileHeld], TTLConfig.NONE)

  private def unmatched(key: Long, h: ReconcileHeld): ReconcileResult =
    if (h.isLeft)
      ReconcileResult(key, "unmatched_left", Some(h.id), None)
    else ReconcileResult(key, "unmatched_right", None, Some(h.id))

  override def handleInputRows(key: Long, rows: Iterator[AsofEvent],
                               timerValues: TimerValues): Iterator[ReconcileResult] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.id))
    val out = Seq.newBuilder[ReconcileResult]
    var held = Option(state.get())
    sorted.foreach { e =>
      val ms = e.ts.getTime
      held match {
        case Some(h) if h.isLeft != e.isLeft &&
            Math.abs(ms - h.ms) <= toleranceMs =>
          // opposite-side pair within tolerance — matched, resolved
          out += (if (e.isLeft)
            ReconcileResult(key, "matched", Some(e.id), Some(h.id))
          else ReconcileResult(key, "matched", Some(h.id), Some(e.id)))
          held = None
        case other =>
          // out-of-tolerance cross pair, same-side displacement, or
          // empty slot: free whatever was held, hold the arrival
          other.foreach(h => out += unmatched(key, h))
          held = Some(ReconcileHeld(e.isLeft, ms, e.id))
          getHandle.registerTimer(Math.max(ms + toleranceMs,
            timerValues.getCurrentWatermarkInMs + 1))
      }
    }
    held match {
      case Some(h) => state.update(h)
      case None => state.clear()
    }
    out.result().iterator
  }

  /** Watermark passed the held event's window end: the other side can
    * no longer arrive within tolerance — emit the unmatched verdict.
    * Timers for already-resolved or displaced events see cleared or
    * newer state and no-op (the ConsecutiveFailsProcessor convention).
    */
  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[ReconcileResult] = {
    val h = state.get()
    if (h != null && h.ms + toleranceMs <= expiredTimerInfo.getExpiryTimeInMs) {
      state.clear()
      Iterator.single(unmatched(key, h))
    } else Iterator.empty
  }
}

object ReconcileProcessor {
  /** transformWithState wiring: `ds` is the UNION of both sides tagged
    * with isLeft (the [[AsofEvent]] shape) carrying one watermark —
    * the connected-streams topology of the reference, flattened.
    */
  def apply(ds: Dataset[AsofEvent], toleranceMs: Long): Dataset[ReconcileResult] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new ReconcileProcessor(toleranceMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
