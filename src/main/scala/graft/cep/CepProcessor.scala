package graft.cep

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** CEP on the Spark 4 arbitrary-state v2 API (`transformWithState`) —
  * the third form of pattern detection next to [[CEP.detectBatch]] and
  * the fMGWS [[CEP.detectStream]], completing the same three-form
  * coverage the other stateful operators have (cf.
  * streaming.ConsecutiveFailsProcessor / OrderTimeoutProcessor).
  *
  * Same NFA, same semantics: live runs in a named ValueState
  * (RocksDB-backed), `within` deadlines as ONE explicit event-time
  * timer per key at the earliest pending run's deadline (clamped above
  * the watermark). The registered timestamp is tracked in its own
  * ValueState so a superseded timer is deleted before its replacement
  * registers — the BlacklistProcessor idiom; without it timers would
  * accumulate with run churn. Timer fires still re-check actual run
  * deadlines against the watermark, so any stray fire is a no-op.
  * Patterns without `within` run in TimeMode.None with no timers
  * (state then lives until a run completes or dies — bound patterns
  * with `within` or `maxRuns` in production).
  *
  * Reference: LoginFailWithCep.scala:50-57, OrderTimeout.scala:50-64.
  */
class CepProcessor(pattern: Pattern, emitTimeouts: Boolean)
    extends StatefulProcessor[String, CepEvent, PatternMatch] {

  @transient private var state: ValueState[CepState] = _
  @transient private var timerState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[CepState]("runs",
      Encoders.product[CepState], TTLConfig.NONE)
    timerState = getHandle.getValueState[Long]("deadline",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def clearTimer(): Unit =
    if (timerState.exists()) {
      getHandle.deleteTimer(timerState.get())
      timerState.clear()
    }

  private def persist(runs: List[Run], timerValues: TimerValues): Unit =
    if (runs.isEmpty) {
      if (state.exists()) state.clear()
      clearTimer()
    } else {
      state.update(CepState(runs))
      pattern.withinMs.foreach { w =>
        val t = Math.max(runs.map(_.firstTs + w).min + 1,
          timerValues.getCurrentWatermarkInMs + 1)
        val prev = if (timerState.exists()) Some(timerState.get()) else None
        if (!prev.contains(t)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(t)
          timerState.update(t)
        }
      }
    }

  override def handleInputRows(key: String, rows: Iterator[CepEvent],
                               timerValues: TimerValues): Iterator[PatternMatch] = {
    val out = ListBuffer[PatternMatch]()
    val prev = Option(state.get()).map(_.runs).getOrElse(Nil)
    val runs = CEP.advance(pattern, prev,
      rows.toSeq.sortBy(e => (e.ts.getTime, e.id)), emitTimeouts, out, key)
    persist(runs, timerValues)
    out.iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[PatternMatch] = {
    // the fired timer no longer exists — drop the tracked timestamp
    // FIRST so persist() registers fresh instead of deleteTimer()-ing a
    // nonexistent timer, and no stale deadline survives an empty-state
    // fire (ADVICE r3)
    timerState.clear()
    val out = ListBuffer[PatternMatch]()
    val runs = Option(state.get()).map(_.runs).getOrElse(Nil)
    if (runs.nonEmpty) pattern.withinMs.foreach { w =>
      val wm = timerValues.getCurrentWatermarkInMs
      val (dead, live) = runs.partition(r => r.firstTs + w <= wm)
      if (emitTimeouts)
        dead.foreach(r => out += PatternMatch(key, r.events.reverse, timedOut = true))
      persist(live, timerValues)
    }
    out.iterator
  }
}

object CepProcessor {
  /** transformWithState wiring; `within` patterns need a watermark on
    * `ts` (event-time timers) and the RocksDB state store provider.
    */
  def apply(ds: Dataset[CepEvent], pattern: Pattern,
            emitTimeouts: Boolean = false): Dataset[PatternMatch] = {
    import ds.sparkSession.implicits._
    if (ds.isStreaming && pattern.withinMs.isDefined)
      require(graft.streaming.Watermarks.hasEventTimeWatermark(ds),
        "CepProcessor: a pattern with `within` uses event-time timers — " +
          "call .withWatermark(...) on the input's `ts` column")
    val timeMode =
      if (pattern.withinMs.isDefined) TimeMode.EventTime() else TimeMode.None()
    ds.groupByKey(_.key)
      .transformWithState(new CepProcessor(pattern, emitTimeouts),
        timeMode, OutputMode.Append())
  }
}
