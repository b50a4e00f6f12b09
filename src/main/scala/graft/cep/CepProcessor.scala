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
  * (RocksDB-backed), `within` deadlines as explicit event-time timers
  * at the earliest pending run's deadline (clamped above the watermark).
  * Timer fires re-check actual run deadlines against the current
  * watermark, so stale timers from earlier batches are no-ops — the
  * idiom BlacklistProcessor documents. Patterns without `within` run in
  * TimeMode.None with no timers (state then lives until a run completes
  * or dies — bound patterns with `within` or `maxRuns` in production).
  *
  * Reference: LoginFailWithCep.scala:50-57, OrderTimeout.scala:50-64.
  */
class CepProcessor(pattern: Pattern, emitTimeouts: Boolean)
    extends StatefulProcessor[String, CepEvent, PatternMatch] {

  @transient private var state: ValueState[CepState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CepState]("runs",
      Encoders.product[CepState], TTLConfig.NONE)

  private def persist(runs: List[Run], timerValues: TimerValues): Unit =
    if (runs.isEmpty) { if (state.exists()) state.clear() }
    else {
      state.update(CepState(runs))
      pattern.withinMs.foreach { w =>
        val deadline = runs.map(_.firstTs + w).min + 1
        getHandle.registerTimer(
          Math.max(deadline, timerValues.getCurrentWatermarkInMs + 1))
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
