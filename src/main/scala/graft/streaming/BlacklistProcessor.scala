package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** C1 on the Spark 4 arbitrary-state v2 API (`transformWithState`) — the
  * direct analog of the reference's KeyedProcessFunction with ValueState
  * (AdStatisticsByGeo.scala:68-113): explicit named ValueState, the
  * processor object owning lifecycle (init/handleInputRows), RocksDB-
  * backed. Same semantics as StatefulOps.clickBlacklist (the
  * flatMapGroupsWithState form): per (user, ad) count clicks within each
  * event-time day, one-shot warning at the threshold, day-rollover reset.
  *
  * Day changes only move forward (late events from an older day are
  * ignored, mirroring StatefulOps.clickBlacklist), and an event-time
  * timer at the stored day's end expires idle keys — the analog of the
  * reference's midnight cleanup timer (AdStatisticsByGeo.scala:105-112),
  * but driven by the watermark instead of wall clock. Requires an
  * upstream watermark and the RocksDB state store provider.
  */
class BlacklistProcessor(threshold: Long)
    extends StatefulProcessor[(Long, Long), KeyedClick, BlacklistWarning] {

  @transient private var state: ValueState[ClickState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ClickState]("clicks",
      Encoders.product[ClickState], TTLConfig.NONE)

  override def handleInputRows(key: (Long, Long), rows: Iterator[KeyedClick],
                               timerValues: TimerValues): Iterator[BlacklistWarning] = {
    val (userId, adId) = key
    val sorted = rows.toSeq.sortBy(_.ts.getTime)
    val out = Seq.newBuilder[BlacklistWarning]
    var s = Option(state.get()).getOrElse(ClickState(-1L, 0L, sent = false))
    val dayBefore = s.dayStart
    val timerBefore = s.timerMs
    sorted.foreach { c =>
      val day = Math.floorDiv(c.ts.getTime / 1000, 86400L) * 86400L
      if (day >= s.dayStart) {              // ignore regressions to older days
        if (day > s.dayStart) s = ClickState(day, 0L, sent = false)
        s = s.copy(cnt = s.cnt + 1)
        if (s.cnt >= threshold && !s.sent) {
          out += BlacklistWarning(userId, adId, s.dayStart,
            s"Click over $threshold times today.")
          s = s.copy(sent = true)
        }
      }
    }
    if (s.dayStart != dayBefore) {
      // delete the timer at the timestamp it was actually registered at
      // (possibly clamped above the day end) — deleting at the unclamped
      // day end would silently miss it (ADVICE r2)
      if (timerBefore >= 0) getHandle.deleteTimer(timerBefore)
      val t = Math.max((s.dayStart + 86400L) * 1000L,
        timerValues.getCurrentWatermarkInMs + 1)
      getHandle.registerTimer(t)
      s = s.copy(timerMs = t)
    }
    state.update(s)
    out.result().iterator
  }

  /** Watermark passed the stored day's end: the key is idle — drop its
    * state (a newer day's state keeps its own, later timer).
    */
  override def handleExpiredTimer(key: (Long, Long), timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[BlacklistWarning] = {
    val s = state.get()
    if (s != null && (s.dayStart + 86400L) * 1000L <= expiredTimerInfo.getExpiryTimeInMs)
      state.clear()
    Iterator.empty
  }
}

object BlacklistProcessor {
  /** transformWithState wiring for [[BlacklistProcessor]] (event-time
    * mode: the input stream must carry a watermark on `ts`).
    */
  def apply(ds: Dataset[KeyedClick], threshold: Long): Dataset[BlacklistWarning] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(c => (c.userId, c.adId))
      .transformWithState(new BlacklistProcessor(threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
