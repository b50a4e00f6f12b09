package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Distribution-drift monitor for a metric STREAM — the online form of
  * [[graft.ops.Drift.histogramShift]]: decile cut points are computed
  * IN BATCH over a reference slice and frozen; arriving events are
  * bucketed by the same cuts and counted per event-time window. The
  * per-window histogram is the PSI input a monitoring job compares
  * against the reference's (uniform-by-construction) proportions —
  * the ln() fold stays with the consumer, as in Drift.
  *
  * Division of labor is the [[StreamingGate]] contract: the expensive
  * corpus-wide part (exact global ntile — a shuffle + prefix-sum job)
  * runs offline; the online path is a STATELESS projection (the cuts
  * ride along as a literal array — at most buckets−1 longs in the
  * plan, no join at all) feeding ONE windowed count aggregate, so the
  * stream needs only the windowed-agg state and emits in append mode
  * once the watermark closes a window. Recalibration = refreeze and
  * restart, the same operational story as swapping a model.
  *
  * [[windowedHistogram]] builds the identical plan on a batch frame,
  * so batch ≡ streaming is a property of ONE code path
  * (StreamingSpec), the StreamingScore convention.
  */
object StreamingDrift {

  /** Freeze the reference cut points: the decile (bucket) maxima of
    * `metricCol` over the reference slice, exact global ntile over
    * (metric, id) via the PrefixSum core — no single-task Window sort.
    * Returns the ≤ `buckets`−1 cuts ascending — dimension-sized, the
    * frozen model artifact (the one driver-side collect, the
    * StreamingScore precedent). Integer metrics only: the cut compare
    * must be exact (score-like doubles should be pre-scaled to longs).
    */
  def freezeCuts(ref: DataFrame, idCol: String, metricCol: String,
                 buckets: Int = 10): Seq[Long] = {
    require(buckets >= 2, "buckets must be >= 2")
    // integral metrics only, enforced (not just doc'd): a fractional
    // metric would be long-truncated HERE while windowedHistogram
    // buckets the raw value — frozen cuts silently diverging from the
    // batch histogram's would break the one-code-path parity contract
    ref.schema(metricCol).dataType match {
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"freezeCuts: $metricCol must be integral (pre-scale doubles to " +
          s"longs upstream), got $other")
    }
    Quantiles.exactNtileGlobal(
        ref.select(col(idCol).as("id"), col(metricCol).cast("long").as("m")),
        orderCols = Seq("m", "id"), buckets = buckets)
      .groupBy(col("bucket")).agg(max(col("m")).as("cut"))
      .filter(col("bucket") < buckets)
      .orderBy(col("cut"))
      .select(col("cut")).collect().map(_.getLong(0)).toSeq
  }

  /** Bucket of `metric` under frozen ascending `cuts`: 1 + the number
    * of cuts strictly below it (ties stay low, the Drift convention) —
    * a pure codegen'd projection over a literal array.
    */
  def bucketOf(metric: Column, cuts: Seq[Long]): Column =
    (size(filter(typedLit(cuts), c => metric > c)) + 1).cast("long")

  /** Per-event-time-window histogram of `metricCol` under the frozen
    * `cuts`, for a streaming OR batch frame (one code path; streaming
    * callers watermark `tsCol` upstream). Output: (window_start,
    * bucket, cnt) — empty buckets are absent here (a streaming append
    * sink can't emit rows for nothing); the consumer joins against its
    * bucket dimension, which it has anyway for the reference side.
    */
  def windowedHistogram(events: DataFrame, tsCol: String,
                        metricCol: String, cuts: Seq[Long],
                        windowDur: String): DataFrame =
    events.select(col(tsCol).as("ts"),
        bucketOf(col(metricCol), cuts).as("bucket"))
      .groupBy(window(col("ts"), windowDur), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("bucket"), col("cnt"))
}
