package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stream matching (C6/C7:
  * order-pay-detect/.../TxMatchDetect.scala:88-138 and
  * TxMatchByJoin.scala:68-88).
  *
  * C6 (reconciliation): the reference connects two keyed streams in a
  * CoProcessFunction holding one pending event per side, emitting matched
  * pairs plus unmatched-side outputs on timers. In Spark that is exactly
  * a full-outer join: matched = both sides present, unmatched = one side
  * null; in streaming mode the watermark + time-range condition bound the
  * join state and emission — no hand-rolled timers. Side outputs become a
  * `tag` column (SURVEY.md §7.4.2).
  *
  * C7 (interval join): a plain join with an equality key and a time-range
  * predicate; Spark plans a hash join co-partitioned on the key (batch)
  * or StreamingSymmetricHashJoin (streaming).
  */
object StreamMatch {

  /** Full-outer reconciliation of two pre-aggregated sides sharing key
    * columns. Tags: matched / unmatched_left / unmatched_right.
    * `leftCnt`/`rightCnt` name one non-key column per side used for
    * presence tests; they are coalesced to 0 in the output.
    */
  def reconcile(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                leftCnt: String, rightCnt: String): DataFrame =
    left.join(right, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        coalesce(col(leftCnt), lit(0L)).as(leftCnt),
        coalesce(col(rightCnt), lit(0L)).as(rightCnt),
        when(col(leftCnt).isNotNull && col(rightCnt).isNotNull, lit("matched"))
          .when(col(leftCnt).isNotNull, lit("unmatched_left"))
          .otherwise(lit("unmatched_right")).as("tag")): _*)

  /** Interval join: rows of `left` paired with rows of `right` with equal
    * key and right.ts in [left.ts - lower, left.ts + upper]
    * (TxMatchByJoin.scala:68-71 uses between(-5s, +5s)).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   lower: String, upper: String): DataFrame = {
    val l = left.withColumnRenamed(keyCol, "l_key")
    val r = right.withColumnRenamed(keyCol, "r_key")
    l.join(r,
      col("l_key") === col("r_key") &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lower") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upper"))
  }
}
