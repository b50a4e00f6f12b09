package graft.cep

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** CEP on transformWithState with the two capabilities the v2 API adds
  * over fMGWS and that the single-timer [[CepProcessor]] doesn't use
  * (the r13 verdict's port target): LIST state and PER-RUN timers.
  *
  * - `ListState[Run]`: each live run is its own state-store element
  *   (RocksDB encodes list elements as separate KVs), so a hot key's
  *   run list is not one monolithic value — no single-value size cliff,
  *   and an append-only batch writes only its appended elements.
  * - Per-RUN timers: every run registers an event-time timer at ITS
  *   OWN deadline (firstTs + within + 1, clamped above the watermark).
  *   A run's deadline is immutable (firstTs never changes as it
  *   advances), so timers are append-only — no deleteTimer
  *   bookkeeping, no min-deadline recompute on every batch (the
  *   [[CepProcessor]] churn), and a fire wakes the key exactly when
  *   SOME run may have expired rather than re-arming a single rolling
  *   deadline. Registration is idempotent per (key, timestamp), and a
  *   timer whose run died early self-validates at fire: expiry
  *   re-checks real deadlines against the watermark, so a stray fire
  *   emits nothing and rewrites nothing.
  *
  * Semantics are identical to [[CEP.detectBatch]] / [[CEP.detectStream]]
  * / [[CepProcessor]] — all four forms fold the ONE shared NFA
  * ([[CEP.advance]]); CepSpec runs the streaming forms to identical
  * matches on the reference patterns (LoginFailWithCep.scala:50-57,
  * OrderTimeout.scala:50-64). Patterns without `within` run in
  * TimeMode.None with no timers.
  */
class CepListProcessor(pattern: Pattern, emitTimeouts: Boolean)
    extends StatefulProcessor[String, CepEvent, PatternMatch] {

  @transient private var runsState: ListState[Run] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    runsState = getHandle.getListState[Run]("runs",
      Encoders.product[Run], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CepEvent],
                               timerValues: TimerValues): Iterator[PatternMatch] = {
    val out = ListBuffer[PatternMatch]()
    val prev = runsState.get().toList
    val runs = CEP.advance(pattern, prev,
      rows.toSeq.sortBy(e => (e.ts.getTime, e.id)), emitTimeouts, out, key)
    if (runs.isEmpty) { if (prev.nonEmpty) runsState.clear() }
    else {
      // append-only fast path (what ListState buys over a ValueState):
      // when no existing run advanced, died, or reordered — the common
      // batch on a key that only STARTS runs — the surviving prefix is
      // the same Run objects in the same order, and only the new runs
      // are written; otherwise rewrite the list
      val prefixUnchanged = runs.lengthCompare(prev.length) >= 0 &&
        runs.iterator.zip(prev.iterator).forall {
          case (a, b) => a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef]
        }
      if (prev.nonEmpty && prefixUnchanged) {
        val appended = runs.drop(prev.length)
        if (appended.nonEmpty) runsState.appendList(appended.toArray)
      } else runsState.put(runs.toArray)
      pattern.withinMs.foreach { w =>
        val wmFloor = timerValues.getCurrentWatermarkInMs + 1
        // one timer per DISTINCT live-run deadline; registration is
        // idempotent per (key, ts), so re-registering a surviving
        // run's deadline next batch is a no-op
        runs.iterator.map(r => Math.max(r.firstTs + w + 1, wmFloor))
          .toSet.foreach(getHandle.registerTimer)
      }
    }
    out.iterator
  }

  /** Some run's deadline passed (or a stray fire from a run that died
    * early): expire exactly the runs the watermark really covers;
    * surviving runs keep their own, later timers.
    */
  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[PatternMatch] = {
    val out = ListBuffer[PatternMatch]()
    val runs = runsState.get().toList
    if (runs.nonEmpty) pattern.withinMs.foreach { w =>
      val wm = timerValues.getCurrentWatermarkInMs
      val (dead, live) = runs.partition(r => r.firstTs + w <= wm)
      if (dead.nonEmpty) {
        if (emitTimeouts)
          dead.foreach(r => out += PatternMatch(key, r.events.reverse, timedOut = true))
        if (live.isEmpty) runsState.clear() else runsState.put(live.toArray)
      }
    }
    out.iterator
  }
}

object CepListProcessor {
  /** transformWithState wiring; `within` patterns need a watermark on
    * `ts` (event-time timers) and the RocksDB state store provider.
    */
  def apply(ds: Dataset[CepEvent], pattern: Pattern,
            emitTimeouts: Boolean = false): Dataset[PatternMatch] = {
    import ds.sparkSession.implicits._
    if (ds.isStreaming && pattern.withinMs.isDefined)
      require(graft.streaming.Watermarks.hasEventTimeWatermark(ds),
        "CepListProcessor: a pattern with `within` uses event-time timers — " +
          "call .withWatermark(...) on the input's `ts` column")
    val timeMode =
      if (pattern.withinMs.isDefined) TimeMode.EventTime() else TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(new CepListProcessor(pattern, emitTimeouts),
        timeMode, OutputMode.Append())
  }
}
