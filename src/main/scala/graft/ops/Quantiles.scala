package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed exact rank statistics.
  *
  * The naive formulation of per-group deciles — `ntile(k) OVER
  * (PARTITION BY group ORDER BY v)` — moves EVERY row of a group to one
  * task and sorts it there; with a low-cardinality group key (TPC-H
  * `o_orderpriority` has 5 values) that is a 5-task sort of the whole
  * table, the classic WindowExec scale-killer. [[exactNtile]] computes
  * the identical assignment with bounded per-task work:
  *
  *  1. `repartitionByRange` on (group, orderCols) — Spark's range
  *     partitioner (sampled boundaries) gives globally ordered
  *     partitions, each a bounded slice of the sort order, sorted
  *     within via `sortWithinPartitions`;
  *  2. the frame is pinned ([[Checkpoints.pin]], LAZILY — it
  *     materializes at the result's first action) so both passes that
  *     follow read the SAME materialized partitioning: one shared RDD,
  *     so the range sampler draws its boundaries exactly once;
  *  3. pass 1: per-(partition, group) row counts — a partial-aggregated
  *     shuffle of numPartitions × |groups| tiny rows — folded into
  *     prefix offsets + group totals DISTRIBUTED, via a self-join on
  *     the group key over that tiny counts frame (≤ |groups| ×
  *     partitions² rows flow through it; nothing is collected — the
  *     driver is not in the data path at any size);
  *  4. pass 2: a per-partition streaming scan assigns each row
  *     `rank = prefix_offset(partition, group) + local_index`, then the
  *     standard ntile split (first `n mod k` buckets get `⌈n/k⌉` rows)
  *     derives the bucket from the global rank and the broadcast-joined
  *     (partition, group) offset/total row.
  *
  * No Window over the data anywhere (PlanShapeSpec pins this), no
  * global single-task sort, no driver collect; wall-clock is two scans
  * of the pinned frame plus the range shuffle. The assignment is
  * EXACTLY SQL `ntile(k)` as long as `orderCols` is a total order
  * (include a unique tie-break column — with ties left unbroken,
  * bucket COUNTS still match but which tied row lands in which bucket
  * is arbitrary, same as SQL).
  *
  * Construction cost: building the result DataFrame launches no
  * collect and no materialization pass, but translating the pinned
  * frame to an RDD is not free — the range sampler runs, and under AQE
  * the pinned frame's upstream stages execute at construction (Spark
  * executes query stages to pick the final plan). Construct it when
  * you intend to run it.
  *
  * Helper columns are collision-proofed: every internal name is
  * suffixed until it clashes with nothing in the input
  * (case-insensitively — Spark's default resolver is), so inputs
  * already carrying `_pid`/`_n`/... pass through untouched.
  *
  * Callers should project to the columns they need first: pass 2
  * round-trips rows through the JVM (off the columnar path), so width
  * costs.
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
                 checkpointDir: Option[String] = None): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // collision-free helper names: one shared suffix, probed
    // case-insensitively against the input (same trick as
    // Dedup.keepFirst — an input already carrying "_pid" or "_N" must
    // pass through untouched)
    val bases = Seq("_pid", "_cnt", "_opid", "_og", "_bpid", "_bg", "_bcnt",
      "_off", "_n", "_lrank", "_rank", "_base", "_rem")
    val sfx = Iterator.iterate("")(_ + "_").find { s =>
      bases.forall(b => !df.columns.exists(_.equalsIgnoreCase(b + s)))
    }.get
    def h(b: String): String = b + sfx
    val pid = h("_pid"); val cnt = h("_cnt")
    val opid = h("_opid"); val og = h("_og")
    val bpid = h("_bpid"); val bg = h("_bg"); val bcnt = h("_bcnt")
    val off = h("_off"); val n = h("_n"); val lrank = h("_lrank")
    val rank = h("_rank"); val base = h("_base"); val rem = h("_rem")

    val sortCols = (groupCol +: orderCols).map(col)
    // LAZY pin: one shared internal RDD for both passes (sampler runs
    // once, boundaries identical), materialized at the first action on
    // the result instead of at construction
    val parted = Checkpoints.pin(
      df.repartitionByRange(nParts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn(pid, spark_partition_id()),
      checkpointDir, eager = false)

    // pass 1: per-(partition, group) counts → prefix offsets + group
    // totals, computed distributed via a self-join on the group key
    // over the tiny counts frame. Range partitions are ordered by key,
    // so the sum of same-group counts with a smaller partition id IS
    // the (partition, group) slice's global starting offset. The join
    // fans out to at most |groups| × partitions² rows — for analytic
    // group keys (|groups| ≪ rows) that is dust; the driver never
    // touches the data.
    val counts = parted.groupBy(col(pid), col(groupCol))
      .agg(count(lit(1)).as(cnt))
    val offsetsDf = counts
      .select(col(pid).as(opid), col(groupCol).as(og))
      .join(counts.select(col(pid).as(bpid), col(groupCol).as(bg),
          col(cnt).as(bcnt)),
        col(og) <=> col(bg))
      .groupBy(col(opid), col(og))
      .agg(
        sum(when(col(bpid) < col(opid), col(bcnt)).otherwise(lit(0L))).as(off),
        sum(col(bcnt)).as(n))

    // pass 2: streaming local index per (partition, group) — the frame
    // is sorted by (group, orderCols) within each partition, so a
    // running counter that resets on group change IS the local rank
    val gIdx = parted.schema.fieldIndex(groupCol)
    val schema2 = parted.schema.add(lrank, LongType, nullable = false)
    val ranked = spark.createDataFrame(
      parted.rdd.mapPartitions { it =>
        var cur: Any = null
        var started = false
        var c = 0L
        it.map { r =>
          val g = r.get(gIdx)
          if (!started || !java.util.Objects.equals(g, cur)) {
            started = true; cur = g; c = 0L
          }
          c += 1
          Row.fromSeq(r.toSeq :+ c)
        }
      }, schema2)

    // standard SQL ntile split from the global rank: base = n div k,
    // rem = n mod k; the first rem buckets hold base+1 rows.
    // greatest(base, 1) keeps the (unreachable when base = 0) else
    // branch free of a division by zero under ANSI evaluation.
    ranked
      .join(broadcast(offsetsDf),
        col(pid) === col(opid) && col(groupCol) <=> col(og))
      .withColumn(rank, col(off) + col(lrank))
      .withColumn(base, expr(s"`$n` div $buckets"))
      .withColumn(rem, col(n) % buckets)
      .withColumn("bucket",
        when(col(rank) <= col(rem) * (col(base) + lit(1L)),
          expr(s"(`$rank` - 1) div (`$base` + 1) + 1"))
          .otherwise(expr(
            s"`$rem` + (`$rank` - `$rem` * (`$base` + 1) - 1) div greatest(`$base`, 1) + 1")))
      .drop(pid, opid, og, off, n, lrank, rank, base, rem)
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
