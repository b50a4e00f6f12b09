package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consecutive-event sequence detection (C2/C3:
  * login-fail-detect/.../LoginFail.scala:61-119 and
  * LoginFailWithCep.scala:50-57).
  *
  * Reference semantics: per user, two *consecutive* "fail" events (no
  * intervening success — state is cleared on success,
  * LoginFail.scala:97-100) within `maxGap` → warning carrying the first
  * and last fail time. We implement the *intended* within-gap semantics;
  * the reference's `>= 2000ms` comparison (LoginFail.scala:86) is a
  * documented bug (SURVEY.md Appendix A.1) and is not replicated.
  *
  * Batch form: lag() over (partition by key order by ts, id) — strict
  * contiguity falls out of the window ordering; one shuffle on the key,
  * sort within partition. Streaming form: graft.streaming.StatefulOps
  * keeps the last event per key in GroupState.
  */
object SequenceDetect {

  /** Pairs of consecutive events both matching `failValue` within `gap`.
    * Output: (key, warn_id = id of the second event, first_fail, last_fail)
    * with times as epoch-second longs.
    */
  def consecutiveFails(df: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String, idCol: String, failValue: String,
                       gap: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .filter(col(typeCol) === failValue && col("prev_type") === failValue &&
        col(tsCol) <= col("prev_ts") + expr(s"INTERVAL $gap"))
      .select(col(keyCol), col(idCol).as("warn_id"),
        unix_timestamp(col("prev_ts")).as("first_fail"),
        unix_timestamp(col(tsCol)).as("last_fail"))
  }
}
