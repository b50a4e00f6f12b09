package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of either side of a streaming as-of join (tag left rows
  * with isLeft = true).
  */
case class AsofEvent(key: Long, ts: Timestamp, isLeft: Boolean, id: Long)

/** One matched left row: the latest right id/ts at-or-before it (None
  * when the key had no earlier right event). Timestamps are epoch
  * MILLISECONDS — full event-time resolution, so output joins back to
  * the source and agrees with the batch as-of forms.
  */
case class AsofPair(key: Long, leftId: Long, leftTsMs: Long,
                    rightId: Option[Long], rightTsMs: Option[Long])

private[streaming] case class AsofState(
    pendingLefts: List[(Long, Long)],          // (tsMs, id), kept sorted
    rights: List[(Long, Long)])                // (tsMs, id), kept sorted

/** Streaming as-of join — the third form of the operator (batch
  * composable: ops.StreamMatch.asofJoin; batch native:
  * plans.AsofJoin). Spark's stream-stream joins cannot express "the
  * single LATEST right row at-or-before each left row": an interval
  * join returns every right row in the window and append-mode streams
  * allow no post-join ranking. This keyed state machine can:
  *
  *  - both sides are union-tagged into one keyed stream ([[AsofEvent]]);
  *  - a left row is emittable once the watermark passes its timestamp —
  *    at that point every right row at-or-before it has arrived (any
  *    later arrival would itself be late and dropped);
  *  - state keeps the un-emitted lefts plus the rights that can still
  *    win for some future left: all rights after the watermark and the
  *    single latest right at-or-before it. Per-key state is O(pending
  *    lefts within the watermark delay + rights within the same bound) —
  *    watermark-bounded like a stream-stream join's buffers. Both lists
  *    are maintained sorted: each batch sorts only its new events and
  *    merges them in;
  *  - an event-time timer at the earliest pending left fires emission
  *    even when the key receives no further events.
  *
  * Same tie semantics as the batch forms: equal timestamps match
  * (<=); right rows should be unique per (key, ts).
  */
object AsofStream {

  /** Merge two (tsMs, id)-sorted lists. */
  private def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] = {
    val out = List.newBuilder[(Long, Long)]
    var (x, y) = (a, b)
    while (x.nonEmpty && y.nonEmpty) {
      if (implicitly[Ordering[(Long, Long)]].lteq(x.head, y.head)) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
    }
    out ++= x; out ++= y
    out.result()
  }

  private def saturatingAdd(a: Long, b: Long): Long =
    if (b > Long.MaxValue - a) Long.MaxValue else a + b

  /** `rightRetentionMs` bounds how long the latest right row is kept
    * for a key that has no pending lefts: true as-of semantics would
    * keep it forever (a future left may still match it), which is one
    * row per key ever seen — pass a retention to expire idle keys, at
    * the cost of unmatched lefts arriving later than the retention.
    */
  def asofJoinStream(ds: Dataset[AsofEvent],
                     rightRetentionMs: Long = Long.MaxValue): Dataset[AsofPair] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[AsofState]) =>
          var s = state.getOption.getOrElse(AsofState(Nil, Nil))
          if (!state.hasTimedOut) {
            val batch = it.toSeq
            s = AsofState(
              merge(s.pendingLefts, batch.filter(_.isLeft)
                .map(e => (e.ts.getTime, e.id)).sorted.toList),
              merge(s.rights, batch.filter(!_.isLeft)
                .map(e => (e.ts.getTime, e.id)).sorted.toList))
          }
          val wm = state.getCurrentWatermarkMs()
          val (emit, stillPending) = s.pendingLefts.partition(_._1 <= wm)
          val out = emit.map { case (lts, lid) =>
            val best = s.rights.takeWhile(_._1 <= lts).lastOption
            AsofPair(key, lid, lts, best.map(_._2), best.map(_._1))
          }
          // rights that can still win: everything after the watermark,
          // plus the single latest one at-or-before it (unless idle past
          // the retention; subtraction avoids ts + retention overflow)
          val (before, after) = s.rights.partition(_._1 <= wm)
          val expired = rightRetentionMs != Long.MaxValue &&
            stillPending.isEmpty && after.isEmpty &&
            before.lastOption.exists(_._1 <= wm - rightRetentionMs)
          val keptRights =
            if (expired) Nil else before.lastOption.toList ++ after
          if (stillPending.isEmpty && keptRights.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(AsofState(stillPending, keptRights))
            if (stillPending.nonEmpty)
              state.setTimeoutTimestamp(
                Math.max(stillPending.head._1, wm + 1))
            else if (rightRetentionMs != Long.MaxValue)
              state.setTimeoutTimestamp(Math.max(
                saturatingAdd(keptRights.last._1, rightRetentionMs), wm + 1))
          }
          out.iterator
      }
  }
}
