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

  /** As-of join (absent from both the reference and Spark's built-ins):
    * each left row is paired with the single latest right row of the same
    * key whose `rightTs` <= `leftTs`; left rows with no such right row
    * keep nulls (left-outer as-of). The canonical "state as of event
    * time" lookup — last click before a purchase, last quote before a
    * trade.
    *
    * Physical shape — union + keyed sort, not a join: tag both sides,
    * union, and carry the latest right attributes forward with
    * last(ignoreNulls) over (key ORDER BY ts, side ROWS UNBOUNDED
    * PRECEDING), then keep left rows. One shuffle on the key and a
    * per-key sort — the same cost class as a sort-merge join, with state
    * bounded by one row's attributes per partition during the scan. The
    * naive alternative (theta-join on rightTs <= leftTs + argmax)
    * explodes to |matches-per-key|² intermediate rows; this stays linear.
    * Right rows must be unique per (key, rightTs) for a deterministic
    * winner — pre-aggregate ties upstream.
    *
    * `rightCols` are the right attribute columns to carry (names must not
    * collide with left's); the right timestamp surfaces as
    * `asof_$rightTs`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val carried = rightCols :+ s"asof_$rightTs"
    val lTagged = left.withColumn("_sort_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_carried", lit(null))
    // all carried attributes travel in ONE struct, so the window fill
    // below always takes them from the same right row — per-column
    // last(ignoreNulls) would mix rows whenever a carried value is null
    // (an older row's value with a newer row's timestamp)
    val rTagged = right
      .withColumn(s"asof_$rightTs", col(rightTs))
      .withColumn("_sort_ts", col(rightTs)).withColumn("_side", lit(0))
      .withColumn("_carried", struct(carried.map(col): _*))
    val unioned = lTagged.select(
      (Seq(keyCol, "_sort_ts", "_side", "_carried")
        ++ left.columns.filterNot(_ == keyCol)).distinct.map(col): _*)
      .unionByName(rTagged.select(
        Seq(keyCol, "_sort_ts", "_side", "_carried").map(col): _*),
        allowMissingColumns = true)
    import org.apache.spark.sql.expressions.Window
    // right rows (_side 0) sort before left rows at equal ts, so an
    // equal-timestamp right row is visible to the left row (<= semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_sort_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL never equals NULL in SQL join semantics: partitionBy groups
    // null keys together, so mask the fill for them (matches the native
    // AsofJoinExec and the DuckDB ASOF oracle)
    val filled = unioned.withColumn("_carried",
      when(col(keyCol).isNull, lit(null))
        .otherwise(last(col("_carried"), ignoreNulls = true).over(w)))
    carried.foldLeft(filled.filter(col("_side") === 1)) { (df, c) =>
        df.withColumn(c, col(s"_carried.$c"))
      }
      .drop("_sort_ts", "_side", "_carried")
  }
}
