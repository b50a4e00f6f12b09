package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-N (T1: the reference's TopNHotItems,
  * hot-item-analysis/.../HotItems.scala:132-175).
  *
  * The reference re-keys window results by windowEnd, buffers them in
  * ListState, and sorts+takes on an event-time timer. In Spark the same
  * semantics is a rank window function over the windowed-count result:
  * one shuffle on the partition columns, sort within partition, no
  * global sort, no driver-side buffering. Ties are broken by explicit
  * tie-break columns so output is deterministic at any parallelism
  * (the reference's sortWith is stable only because parallelism=1).
  *
  * Streaming: ranking over an update stream is unsupported, so the
  * streaming form runs this inside foreachBatch on the windowed-agg
  * output (see graft.streaming.StreamingTopN).
  */
object TopN {
  def perGroup(df: DataFrame, partitionCols: Seq[String], orderCol: String,
               tieBreakCols: Seq[String], n: Int, rankName: String = "rank"): DataFrame = {
    val ordering: Seq[Column] = col(orderCol).desc +: tieBreakCols.map(col(_).asc)
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= n)
  }

  /** GLOBAL ranked top-k, scale-safe: `orderBy().limit(k)` plans as
    * TakeOrderedAndProject (per-partition top-k, one k-row merge) and
    * the rank Window runs over the ≤ k survivors only — never the
    * Exchange(SinglePartition) → Sort → Window funnel a bare
    * `row_number().over(Window.orderBy(...))` + `filter(rk <= k)`
    * compiles to, which pushes EVERY candidate row through one task.
    * `sort` must carry a full tie-break (end on a unique column) so
    * the emitted rk is identical to the global form's. The one shared
    * implementation of the repo's "never a single-task global Window
    * over a data-scale dimension" rule (retrieval/phrase family,
    * topMovers, journeyPaths).
    */
  def globalRanked(df: DataFrame, k: Int, sort: Column*): DataFrame =
    df.orderBy(sort: _*).limit(k)
      .withColumn("rk", row_number()
        .over(Window.orderBy(sort: _*)).cast("long"))
}
