package graft.cep

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed event consumed by the CEP engine. String keys cover both the
  * reference's Long keys (userId, orderId) and String keys (txId).
  */
case class CepEvent(key: String, ts: Timestamp, eventType: String, id: Long)

/** One event bound to a pattern step. */
case class MatchedEvent(step: String, id: Long, tsMs: Long, eventType: String)

/** A completed (or, with timeouts enabled, expired-partial) match. */
case class PatternMatch(key: String, events: Seq[MatchedEvent], timedOut: Boolean)

private[cep] case class Run(nextStep: Int, firstTs: Long, events: List[MatchedEvent])
private[cep] case class CepState(runs: List[Run])

/** Pattern step: `next` = strict contiguity (a non-matching event kills
  * the run — Flink CEP `next`, LoginFailWithCep.scala:50-53), `followedBy`
  * = relaxed (non-matching events are skipped and the FIRST matching
  * event advances the run — Flink `followedBy`, OrderTimeout.scala:52-55;
  * the branching `followedByAny` variant is intentionally not
  * implemented — the reference never uses it and it makes state size
  * per key combinatorial). Verified against a brute-force semantics
  * oracle on randomized inputs in CepPropertySpec.
  */
private[cep] case class Step(name: String, pred: CepEvent => Boolean, strict: Boolean)

/** Mini CEP pattern DSL (SURVEY.md §7.2 step 7):
  * {{{
  * val p = Pattern.begin("first", _.eventType == "fail")
  *   .next("second", _.eventType == "fail")
  *   .within("2 seconds")
  * }}}
  * Compiled by [[CEP]] onto `flatMapGroupsWithState` — no Flink-style
  * runtime, just a small NFA folded over each key's events in event-time
  * order. Reproduces the semantics of the reference's two CEP jobs
  * (LoginFailWithCep.scala:50-57, OrderTimeout.scala:50-64).
  */
final class Pattern private (private[cep] val steps: Vector[Step],
                             private[cep] val withinMs: Option[Long],
                             private[cep] val maxRunsPerKey: Int)
    extends Serializable {

  def next(name: String, pred: CepEvent => Boolean): Pattern =
    new Pattern(steps :+ Step(name, pred, strict = true), withinMs, maxRunsPerKey)

  def followedBy(name: String, pred: CepEvent => Boolean): Pattern =
    new Pattern(steps :+ Step(name, pred, strict = false), withinMs, maxRunsPerKey)

  def within(duration: String): Pattern =
    withinMillis(Pattern.parseMillis(duration))

  def withinMillis(ms: Long): Pattern = new Pattern(steps, Some(ms), maxRunsPerKey)

  /** Bound concurrent partial matches per key (state-size guard for
    * hot keys at scale; oldest runs are dropped first).
    */
  def maxRuns(n: Int): Pattern = new Pattern(steps, withinMs, n)
}

object Pattern {
  def begin(name: String, pred: CepEvent => Boolean): Pattern =
    new Pattern(Vector(Step(name, pred, strict = false)), None, 1000)

  private[cep] def parseMillis(duration: String): Long = {
    val Array(n, unit) = duration.trim.toLowerCase.split("\\s+")
    val v = n.toLong
    unit.stripSuffix("s") match {
      case "millisecond" | "milli" | "ms" => v
      case "second" | "sec"               => v * 1000L
      case "minute" | "min"               => v * 60000L
      case "hour"                         => v * 3600000L
      case "day"                          => v * 86400000L
      case other => throw new IllegalArgumentException(s"unknown unit: $other")
    }
  }
}

/** Compiles a [[Pattern]] to keyed stateful execution.
  *
  * The NFA: each partial run records the next expected step and its
  * events so far. Every event may (a) advance runs whose next step it
  * matches (within the time bound), (b) kill strict-contiguity runs it
  * fails to match, (c) start a new run at step 0. Completed runs emit
  * immediately; expired runs emit as `timedOut` when requested (the
  * analog of Flink's PatternTimeoutFunction side output,
  * OrderTimeout.scala:59-64). Overlapping matches are all emitted
  * (Flink's default no-skip strategy).
  */
object CEP {

  /** Fold one key's events (already sorted) through the NFA. Shared by
    * all three detection forms (batch fold, fMGWS, CepProcessor).
    */
  private[cep] def advance(pattern: Pattern, runs: List[Run], events: Seq[CepEvent],
                      emitTimeouts: Boolean, out: ListBuffer[PatternMatch],
                      key: String): List[Run] = {
    val steps = pattern.steps
    var live = runs
    events.foreach { e =>
      val kept = ListBuffer[Run]()
      live.foreach { r =>
        val expired = pattern.withinMs.exists(w => e.ts.getTime - r.firstTs > w)
        if (expired) {
          if (emitTimeouts) out += PatternMatch(key, r.events.reverse, timedOut = true)
        } else {
          val step = steps(r.nextStep)
          if (step.pred(e)) {
            val ev = MatchedEvent(step.name, e.id, e.ts.getTime, e.eventType) :: r.events
            if (r.nextStep == steps.size - 1)
              out += PatternMatch(key, ev.reverse, timedOut = false)
            else kept += Run(r.nextStep + 1, r.firstTs, ev)
          } else if (!step.strict) kept += r
          // strict + no match → run killed (Flink `next` contiguity)
        }
      }
      if (steps(0).pred(e)) {
        val ev = List(MatchedEvent(steps(0).name, e.id, e.ts.getTime, e.eventType))
        if (steps.size == 1) out += PatternMatch(key, ev, timedOut = false)
        else kept += Run(1, e.ts.getTime, ev)
      }
      live = if (kept.size > pattern.maxRunsPerKey)
        kept.toList.sortBy(_.firstTs).takeRight(pattern.maxRunsPerKey)
      else kept.toList
    }
    live
  }

  /** Test hook: run the pure NFA fold over a pre-sorted event sequence. */
  private[graft] def advanceForTest(pattern: Pattern, events: Seq[CepEvent],
      out: ListBuffer[PatternMatch]): List[Run] =
    advance(pattern, Nil, events, emitTimeouts = false, out, "k")

  /** Bounded-input detection: end-of-input expires all pending runs
    * (every deadline eventually passes on a bounded stream).
    *
    * Executed as a secondary sort — `repartition(key)` +
    * `sortWithinPartitions(key, ts, id)` + a streaming `mapPartitions`
    * fold — so a key's events are NEVER materialized in memory: the
    * sort spills through Spark's ExternalSorter and the fold holds only
    * the live runs (bounded by `maxRuns`) plus matches not yet pulled
    * downstream. A hot key with millions of events (bot traffic) costs
    * disk in the sort, not task heap. Per-key event order (ts, id)
    * matches the streaming form's micro-batch sort.
    */
  def detectBatch(ds: Dataset[CepEvent], pattern: Pattern,
                  emitTimeouts: Boolean = false): Dataset[PatternMatch] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    ds.repartition(col("key"))
      .sortWithinPartitions(col("key"), col("ts"), col("id"))
      .mapPartitions { events =>
        new Iterator[PatternMatch] {
          private val in = events.buffered
          // `started` marks an open group — curKey alone can't, because a
          // null key is itself a valid group (groupBy semantics: nulls
          // group together, matching the previous groupByKey form)
          private var started = false
          private var curKey: String = null
          private var runs: List[Run] = Nil
          private val out = scala.collection.mutable.Queue.empty[PatternMatch]

          /** End-of-key: expire pending runs (bounded input ⇒ every
            * deadline eventually passes).
            */
          private def flushKey(): Unit = {
            if (emitTimeouts && pattern.withinMs.isDefined)
              runs.foreach(r => out += PatternMatch(curKey, r.events.reverse, timedOut = true))
            runs = Nil
          }

          private def fill(): Unit = {
            while (out.isEmpty && (in.hasNext || started)) {
              if (!in.hasNext) { flushKey(); started = false }
              else if (started && !java.util.Objects.equals(in.head.key, curKey)) {
                flushKey(); curKey = in.head.key
              } else {
                val e = in.next()
                if (!started) { started = true; curKey = e.key }
                val lb = ListBuffer[PatternMatch]()
                runs = advance(pattern, runs, e :: Nil, emitTimeouts, lb, curKey)
                out ++= lb
              }
            }
          }

          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): PatternMatch = { fill(); out.dequeue() }
        }
      }
  }

  /** Streaming detection; patterns carrying `within` require an
    * upstream watermark on `ts` — the event-time timeout both emits
    * timed-out runs (when `emitTimeouts`) and prunes dead runs on idle
    * keys, so state is bounded by keys with live runs, not by every key
    * ever seen (an idle key's pending runs would otherwise outlive
    * their deadline forever; cf. ADVICE r1 on StatefulOps).
    *
    * Consequence of event-time timeouts: Spark drops input rows older
    * than the current watermark BEFORE they reach the NFA, so events
    * arriving later than the configured watermark delay are not matched
    * (batch detection has no such drop). Size the delay to the source's
    * real out-of-orderness — a "0 seconds" watermark only matches batch
    * output when arrival order is event-time order per micro-batch.
    */
  def detectStream(ds: Dataset[CepEvent], pattern: Pattern,
                   emitTimeouts: Boolean = false): Dataset[PatternMatch] = {
    import ds.sparkSession.implicits._
    if (ds.isStreaming && pattern.withinMs.isDefined) {
      // Fail at plan time, not at stream start: the event-time timeout
      // backing `within` needs a watermark, and without this check the
      // failure surfaces only when the query is started (ADVICE r2).
      require(graft.streaming.Watermarks.hasEventTimeWatermark(ds),
        "CEP.detectStream: a pattern with `within` uses an event-time timeout, " +
          "which requires .withWatermark(...) on the input stream's `ts` column. " +
          "Note events older than the watermark are dropped before the NFA — " +
          "size the watermark delay to the source's real out-of-orderness.")
    }
    val timeoutConf =
      if (pattern.withinMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[CepState, PatternMatch](OutputMode.Append, timeoutConf) {
        (key, it, state: GroupState[CepState]) =>
          val out = ListBuffer[PatternMatch]()
          var runs = state.getOption.map(_.runs).getOrElse(Nil)
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (dead, live) = runs.partition(r =>
              pattern.withinMs.exists(w => r.firstTs + w <= wm))
            if (emitTimeouts)
              dead.foreach(r => out += PatternMatch(key, r.events.reverse, timedOut = true))
            runs = live
          } else {
            runs = advance(pattern, runs,
              it.toSeq.sortBy(e => (e.ts.getTime, e.id)), emitTimeouts, out, key)
          }
          if (runs.isEmpty) { if (state.exists) state.remove() }
          else {
            state.update(CepState(runs))
            pattern.withinMs.foreach { w =>
              val deadline = runs.map(_.firstTs + w).min + 1
              if (timeoutConf == GroupStateTimeout.EventTimeTimeout)
                state.setTimeoutTimestamp(
                  Math.max(deadline, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }
}
