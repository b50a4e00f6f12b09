package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis over an event log: per user, how deep an ordered
  * step sequence (view → click → purchase, …) was completed within a
  * time horizon — the windowFunnel aggregate of the ClickHouse /
  * product-analytics world, absent from the reference's seven use
  * cases but the first thing its users ask of an event table.
  *
  * Semantics: EARLIEST-CHAIN. Step 1 anchors at the user's earliest
  * step-1 event (t1); step i+1 anchors at the earliest step-(i+1)
  * event strictly after t_i and no later than t1 + horizon. Depth is
  * the last anchored step. This greedy chain is deterministic and
  * fully declarative (k-1 join+min-aggregate rounds, partial aggs, no
  * per-user scan); it can under-report versus ClickHouse's any-start
  * maximization (which re-anchors on every step-1 event) — a user who
  * misses the chain from their FIRST step-1 event but completes one
  * from a later event counts shallower here. Re-anchoring needs a
  * per-user ordered scan: compose [[graft.cep.CEP]]'s NFA over the
  * same events when those semantics matter; this operator is the
  * aggregate-only scale shape.
  *
  * Scale: each round filters the event table to one step (pushed to
  * the scan), joins on user_id and min-aggregates — work ∝ matching
  * events, state ∝ users, never a window sort over the full log. Each
  * tier frame is referenced twice (by the next tier and by the final
  * assembly), so `pinTiers` (default) lazily checkpoints it
  * ([[Checkpoints.pin]], eager=false — no collect, no materialization
  * pass; the q40 AQE caveat applies to construction): the event log
  * is scanned once per step instead of O(steps²) times, and each
  * tier's aggregate (∝ users who reached it) materializes exactly
  * once. `checkpointDir` switches to the reliable root for cluster
  * runs.
  *
  * Output: (user_id, depth, t1_us .. tk_us) — anchor times as epoch
  * micros (nullable past the reached depth).
  */
object Funnel {

  /** `horizon` whitelist: the parameter is spliced into an INTERVAL
    * literal, so an arbitrary string would reach the SQL parser — a
    * typo surfaced as an opaque Catalyst error deep in plan
    * construction, and the parameter accepted arbitrary fragments
    * (ADVICE r7). Accepts one or more "<n> <unit>" groups ("2 DAY",
    * "1 DAY 12 HOUR", "3 MONTHS"), units millisecond..year.
    */
  private val HorizonRe =
    ("(?i)^\\d+ (MILLISECOND|SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)S?" +
      "( \\d+ (MILLISECOND|SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)S?)*$").r

  def windowFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   horizon: String, pinTiers: Boolean = true,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val hz = horizon.trim.replaceAll("\\s+", " ")
    require(HorizonRe.matches(hz),
      s"""windowFunnel: horizon "$horizon" is not "<n> <unit> [...]" with unit """ +
        "MILLISECOND/SECOND/MINUTE/HOUR/DAY/WEEK/MONTH/YEAR " +
        "(e.g. \"2 DAY\", \"15 MINUTE\", \"1 DAY 12 HOUR\")")
    val e = events.select(col(userCol).as("user_id"),
      col(typeCol).as("step"), col(tsCol).as("ts"))
    val iv = expr(s"INTERVAL $hz") // e.g. "2 DAY", "15 MINUTE"
    def pin(df: DataFrame): DataFrame =
      if (pinTiers) Checkpoints.pin(df, checkpointDir, eager = false) else df
    val t1 = pin(e.filter(col("step") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1")))
    // tiers(i): users who reached step i+1, carrying t1..t_{i+1}
    val tiers = steps.zipWithIndex.drop(1).scanLeft(t1) {
      case (prev, (s, i)) =>
        val carry = (1 to i).map(j => col(s"t$j"))
        pin(prev.join(e.filter(col("step") === s), "user_id")
          .filter(col("ts") > col(s"t$i") && col("ts") <= col("t1") + iv)
          .groupBy(col("user_id") +: carry: _*)
          .agg(min(col("ts")).as(s"t${i + 1}")))
    }
    val assembled = tiers.tail.zipWithIndex.foldLeft(tiers.head) {
      case (acc, (tier, i)) =>
        acc.join(tier.select(col("user_id"), col(s"t${i + 2}")),
          Seq("user_id"), "left")
    }
    val depth = steps.indices.drop(1).foldLeft(lit(1)) { (d, i) =>
      d + when(col(s"t${i + 1}").isNotNull, 1).otherwise(0)
    }
    val tsCols: Seq[Column] = steps.indices.map(i =>
      unix_micros(col(s"t${i + 1}")).as(s"t${i + 1}_us"))
    assembled.select(col("user_id") +: depth.as("depth") +: tsCols: _*)
  }
}
