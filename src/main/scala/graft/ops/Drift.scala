package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus slices (dump N vs
  * dump N+1, train vs serving traffic): the histogram input of a
  * PSI / KL drift alarm.
  *
  * Design choice: this op emits per-bucket COUNTS and 6-digit
  * proportions — everything bit-reproducible — and leaves the final
  * `Σ (p_b − p_a)·ln(p_b/p_a)` to the consumer, because `ln` is not
  * correctly rounded across engines/libms and would break the oracle
  * hash for zero analytical gain (the alarm thresholds on the same
  * information either way).
  */
object Drift {

  /** Per-bucket population shift of `metricCol` between `ref` and
    * `cmp`: cut points are the decile (bucket) maxima of the REFERENCE
    * slice — exact global ntile over (metric, id) via the PrefixSum
    * core ([[Quantiles.exactNtileGlobal]]: range partition +
    * distributed offsets, no single-task Window sort) — and BOTH
    * slices are then bucketed by those same cuts (`value > cut` moves
    * up; above the top cut ⇒ bucket `buckets`). Every bucket emits a
    * row even when empty (the dimension frame is `spark.range`), so
    * the output schema is fixed at `buckets` rows.
    *
    * Scale shape: one exact-ntile pass over the reference (the cut
    * derivation — the only shuffle of reference rows), then bucketing
    * is a broadcast of ≤ buckets−1 cut rows onto narrow (id, metric)
    * projections + one hash aggregate each. Output: (bucket, cnt_ref,
    * cnt_cmp, p_ref, p_cmp).
    */
  def histogramShift(ref: DataFrame, cmp: DataFrame, idCol: String,
                     metricCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val spark = ref.sparkSession
    val deciled = Quantiles.exactNtileGlobal(
      ref.select(col(idCol).as("id"), col(metricCol).as("m")),
      orderCols = Seq("m", "id"), buckets = buckets)
    // one row holding the sorted cut array: bucketing becomes a pure
    // projection (count of cuts below the value) — no per-row shuffle,
    // just the final 10-group aggregate with map-side combine
    val cutArr = deciled.groupBy(col("bucket")).agg(max(col("m")).as("cut"))
      .filter(col("bucket") < buckets)
      .agg(sort_array(collect_list(col("cut"))).as("cuts"))
    def bucketed(df: DataFrame, cntName: String): DataFrame =
      df.select(col(metricCol).as("m"))
        .crossJoin(broadcast(cutArr))
        .select((size(expr("filter(cuts, c -> m > c)")) + 1).cast("long")
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as(cntName))
    val ca = bucketed(ref, "cnt_ref")
    val cb = bucketed(cmp, "cnt_cmp")
    val dim = spark.range(1, buckets + 1).select(col("id").as("bucket"))
    val joined = dim.join(ca, Seq("bucket"), "left")
      .join(cb, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("cnt_ref"), lit(0L)).as("cnt_ref"),
        coalesce(col("cnt_cmp"), lit(0L)).as("cnt_cmp"))
    val totals = joined.agg(sum(col("cnt_ref")).as("tr"),
      sum(col("cnt_cmp")).as("tc"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("cnt_ref"), col("cnt_cmp"),
        round(col("cnt_ref").cast("double") / col("tr"), 6).as("p_ref"),
        round(col("cnt_cmp").cast("double") / col("tc"), 6).as("p_cmp"))
  }
}
