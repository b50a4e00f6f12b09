package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact rank statistics.
  *
  * The naive formulation of per-group deciles — `ntile(k) OVER
  * (PARTITION BY group ORDER BY v)` — moves EVERY row of a group to one
  * task and sorts it there; with a low-cardinality group key (TPC-H
  * `o_orderpriority` has 5 values) that is a 5-task sort of the whole
  * table, the classic WindowExec scale-killer. [[exactNtile]] computes
  * the identical assignment with bounded per-task work: the global rank
  * and group total come from [[PrefixSum.runningTotals]] (range
  * partition + distributed two-pass prefix offsets — the mechanics,
  * pinning discipline, and AQE construction caveat live there), then
  * the standard ntile split (first `n mod k` buckets get `⌈n/k⌉` rows)
  * derives the bucket from the rank and total.
  *
  * No Window over the data anywhere (PlanShapeSpec pins this), no
  * global single-task sort, no driver collect. The assignment is
  * EXACTLY SQL `ntile(k)` as long as `orderCols` is a total order
  * (include a unique tie-break column — with ties left unbroken,
  * bucket COUNTS still match but which tied row lands in which bucket
  * is arbitrary, same as SQL).
  *
  * Helper columns are collision-proofed: every internal name is
  * suffixed until it clashes with nothing in the input
  * (case-insensitively — Spark's default resolver is), so inputs
  * already carrying `_rank`/`_n`/... pass through untouched.
  *
  * Callers should project to the columns they need first: the prefix
  * pass round-trips rows through the JVM (off the columnar path), so
  * width costs.
  */
object Quantiles {

  /** `df` + a `bucket` column (1..k): exact per-group ntile over
    * `orderCols`, computed with range partitioning + broadcast prefix
    * offsets instead of a per-group Window sort.
    *
    * @param partitions    range-partition count; 0 ⇒ session
    *                      `spark.sql.shuffle.partitions`
    * @param checkpointDir reliable checkpoint root for the pinned
    *                      frame; None ⇒ executor-local (see
    *                      [[Checkpoints]])
    */
  def exactNtile(df: DataFrame, groupCol: String, orderCols: Seq[String],
                 buckets: Int, partitions: Int = 0,
                 checkpointDir: Option[String] = None): DataFrame =
    ntileAssign(df, Seq(groupCol), orderCols, buckets, partitions, checkpointDir)

  /** Keyless form of [[exactNtile]]: SQL `ntile(k) OVER (ORDER BY
    * orderCols)` — with no PARTITION BY at all, the Window formulation
    * moves the ENTIRE table through one task (the worst WindowExec
    * case; q40's per-group variant at least splits across the group
    * values). Same PrefixSum machinery over one global sequence.
    */
  def exactNtileGlobal(df: DataFrame, orderCols: Seq[String],
                       buckets: Int, partitions: Int = 0,
                       checkpointDir: Option[String] = None): DataFrame =
    ntileAssign(df, Nil, orderCols, buckets, partitions, checkpointDir)

  private def ntileAssign(df: DataFrame, groupCols: Seq[String],
                          orderCols: Seq[String], buckets: Int,
                          partitions: Int,
                          checkpointDir: Option[String]): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    // collision-free helper names: one shared suffix, probed
    // case-insensitively against the input (same trick as
    // Dedup.keepFirst — an input already carrying "_rank" or "_N" must
    // pass through untouched; PrefixSum probes its own internals)
    val bases = Seq("_rank", "_n", "_base", "_rem")
    val sfx = Iterator.iterate("")(_ + "_").find { s =>
      bases.forall(b => !df.columns.exists(_.equalsIgnoreCase(b + s)))
    }.get
    def h(b: String): String = b + sfx
    val rank = h("_rank"); val n = h("_n")
    val base = h("_base"); val rem = h("_rem")

    // (per-group) rank (running count) + total from the shared
    // prefix-sum core: range partition, lazy pin, two passes, no Window
    val ranked = PrefixSum.runningTotals(df, groupCols, orderCols,
      valueCol = None, runCol = rank, totCol = Some(n),
      partitions = partitions, checkpointDir = checkpointDir)

    // standard SQL ntile split from the global rank: base = n div k,
    // rem = n mod k; the first rem buckets hold base+1 rows.
    // greatest(base, 1) keeps the (unreachable when base = 0) else
    // branch free of a division by zero under ANSI evaluation.
    ranked
      .withColumn(base, expr(s"`$n` div $buckets"))
      .withColumn(rem, col(n) % buckets)
      .withColumn("bucket",
        when(col(rank) <= col(rem) * (col(base) + lit(1L)),
          expr(s"(`$rank` - 1) div (`$base` + 1) + 1"))
          .otherwise(expr(
            s"`$rem` + (`$rank` - `$rem` * (`$base` + 1) - 1) div greatest(`$base`, 1) + 1")))
      .drop(rank, n, base, rem)
  }

  /** Exact interpolated per-group percentiles with a scale guard.
    *
    * Spark's `percentile` is a sort-based aggregate that buffers every
    * value of a group in the aggregation buffer — exact and correct,
    * but memory-linear in the largest group. This wrapper makes the
    * limit explicit: a count-only pre-pass (column-pruned scan +
    * partial agg; the collect returns at most one row) raises before
    * the percentile pass if any group exceeds `maxGroupRows`, naming
    * the fixed-memory alternative (`approx_percentile`, q53's shape)
    * instead of OOMing an executor mid-aggregate.
    *
    * @param pcts (fraction, output column name) pairs
    */
  def guardedExactPercentiles(df: DataFrame, groupCol: String,
                              valueCol: String,
                              pcts: Seq[(Double, String)],
                              roundTo: Int = 2,
                              maxGroupRows: Long = 50L * 1000 * 1000): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    val offending = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxGroupRows)
      .limit(1)
      .collect()
    if (offending.nonEmpty) {
      val r = offending.head
      throw new IllegalArgumentException(
        s"guardedExactPercentiles: group ${r.get(0)} has ${r.getLong(1)} rows " +
          s"(> maxGroupRows=$maxGroupRows); exact percentile buffers the whole " +
          "group in one aggregation buffer. Use approx_percentile (fixed-memory " +
          "mergeable sketch — see SparkEntry q53_price_percentiles_approx) or " +
          "raise maxGroupRows if the executors are sized for it.")
    }
    val aggs = pcts.map { case (p, name) =>
      round(percentile(col(valueCol), lit(p)), roundTo).as(name)
    } :+ count(lit(1)).as("cnt")
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
