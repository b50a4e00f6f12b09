package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Create→pay timeout detection (C4/C5:
  * order-pay-detect/.../OrderTimeout.scala:50-93 and
  * OrderTimeoutWithoutCep.scala:60-156).
  *
  * Reference semantics: per order, a "create" must be followed by a "pay"
  * within the timeout, else emit a timeout result. Tag strings follow the
  * reference ("payed successfully" / "timeout", OrderTimeout.scala:80,91).
  * The deadline is create-time + timeout (the reference's zero-state
  * deadline bug, OrderTimeoutWithoutCep.scala:79, is documented in
  * SURVEY.md Appendix A.2 and not replicated).
  *
  * Batch form: left join create-side to pay-side on the key with a time
  * range predicate, then group back to one row per create. The join keys
  * co-partition both sides in one shuffle; at scale AQE handles skew.
  * Streaming form: graft.streaming.StatefulOps stores the create
  * timestamp in GroupState with an EventTimeTimeout.
  */
object Timeout {

  /** One row per create event: matched within `timeout` → "payed
    * successfully", else "timeout".
    * creates: (id, key, create_ts:timestamp); pays: (key, pay_ts:timestamp).
    */
  def detect(creates: DataFrame, pays: DataFrame, timeout: String): DataFrame = {
    val c = creates.select(col("id"), col("key").as("c_key"), col("create_ts"))
    val p = pays.select(col("key").as("p_key"), col("pay_ts"))
    c.join(p,
        col("c_key") === col("p_key") &&
        col("pay_ts") > col("create_ts") &&
        col("pay_ts") <= col("create_ts") + expr(s"INTERVAL $timeout"),
        "left")
      .groupBy(col("id"), col("c_key"), col("create_ts"))
      .agg(count(col("pay_ts")).as("pays"))
      .select(col("id"), col("c_key").as("key"),
        unix_timestamp(col("create_ts")).as("create_ts"),
        when(col("pays") > 0, lit("payed successfully"))
          .otherwise(lit("timeout")).as("status"))
  }
}
