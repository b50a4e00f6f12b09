package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-sequence assembly for a LIVE behavior stream — the streaming
  * twin of [[graft.ops.Behavior.sessionSequences]]: gap-closed sessions
  * emit one row per (user, session) with the session's item sequence in
  * (ts, id) order, the corpus row a next-item-prediction trainer
  * consumes as it forms.
  *
  * Built on `session_window` (the engine-native gap sessionizer the
  * reference's event-time heritage maps to —
  * hot-item-analysis/.../HotItems.scala:79 windowing,
  * login-fail-detect/.../LoginFail.scala:44 watermarks): state is the
  * per-(user, open-session) aggregation buffer, windows merge as events
  * arrive, and the watermark closing a session flushes its row in
  * append mode — no timer code, no manual state. [[sessionSequences]]
  * builds the IDENTICAL plan on a batch frame, so batch ≡ streaming is
  * a property of ONE code path (StreamingSpec pins it), the
  * StreamingDrift/StreamingScore convention; the batch mode also gets
  * its own DuckDB oracle (q151).
  *
  * Boundary semantics (measured, spec-pinned): `session_window`
  * merges an event landing EXACTLY on the previous close — a new
  * session starts only when the gap strictly exceeds `gap` — i.e. the
  * same strict-`>` rule as the lag-based q148 op, but compared at
  * FULL timestamp precision where q148 compares floored epoch seconds
  * (identical on whole-second data; sub-second corpora can differ at
  * the flooring boundary). The oracle replays the full-precision rule.
  *
  * Scale shape: one shuffle on user_id (high-cardinality), per-session
  * state bounded by the gap (a session's events fit a row by
  * construction — the q148 argument); the sequence assembles in-row
  * via array_sort over (ts, id) structs, a total order, so output is
  * engine- and arrival-order-deterministic.
  */
object StreamingSessions {

  /** One code path for batch AND streaming frames (streaming callers
    * watermark `tsCol` upstream). Output: (user_id, session_start_s,
    * session_end_s, n_items, item_seq) — start = first event's epoch
    * second, end = last event + gap (the half-open close), both floored
    * to seconds AFTER windowing so the gap math itself stays full-
    * precision.
    */
  def sessionSequences(events: DataFrame, userCol: String, itemCol: String,
                       tsCol: String, idCol: String,
                       gap: String = "30 minutes"): DataFrame =
    events
      .filter(col(itemCol).isNotNull)
      .select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        col(idCol).as("eid"), col(itemCol).as("item"))
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_items"),
        expr("""array_join(transform(
               |  array_sort(collect_list(named_struct('ts', ts, 'eid', eid, 'item', item))),
               |  s -> cast(s.item as string)), ' ')""".stripMargin)
          .as("item_seq"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("session_start_s"),
        unix_timestamp(col("sw.end")).as("session_end_s"),
        col("n_items"), col("item_seq"))
}
