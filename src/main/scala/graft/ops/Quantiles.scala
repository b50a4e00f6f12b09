package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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
  *  2. the frame is pinned ([[Checkpoints.pin]]) so the two passes that
  *     follow see the SAME partitioning — without the pin, pass 2 would
  *     re-run the range sampler and could draw different boundaries
  *     than the pass the offsets were computed from;
  *  3. pass 1: per-(partition, group) row counts — a partial-aggregated
  *     shuffle of numPartitions × |groups| tiny rows, collected and
  *     folded into prefix offsets + group totals on the driver (this is
  *     the only collect: its size is partitions × groups, independent
  *     of row count — the operator is for ANALYTIC group keys, i.e.
  *     |groups| ≪ rows);
  *  4. pass 2: a per-partition streaming scan assigns each row
  *     `rank = prefix_offset(partition, group) + local_index`, then the
  *     standard ntile split (first `n mod k` buckets get `⌈n/k⌉` rows)
  *     derives the bucket from the global rank and the broadcast group
  *     total.
  *
  * No Window over the data anywhere (PlanShapeSpec pins this), no
  * global single-task sort; wall-clock is two scans of the pinned
  * frame plus the range shuffle. The assignment is EXACTLY SQL
  * `ntile(k)` as long as `orderCols` is a total order (include a unique
  * tie-break column — with ties left unbroken, bucket COUNTS still
  * match but which tied row lands in which bucket is arbitrary, same
  * as SQL).
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
    val sortCols = (groupCol +: orderCols).map(col)
    val parted = Checkpoints.pin(
      df.repartitionByRange(nParts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn("_pid", spark_partition_id()),
      checkpointDir)

    // pass 1: per-(partition, group) counts → driver-side prefix fold.
    // Range partitions are ordered by key, so accumulating counts in
    // _pid order per group yields each (partition, group) slice's
    // global starting offset.
    val gIdx = parted.schema.fieldIndex(groupCol)
    val counts = parted.groupBy(col("_pid"), col(groupCol))
      .agg(count(lit(1)).as("_cnt"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    val totals: Map[Any, Long] =
      counts.groupBy(_._2).map { case (g, rs) => g -> rs.map(_._3).sum }
    val offsetRows = counts.sortBy(_._1).groupBy(_._2).toSeq
      .flatMap { case (g, rs) =>
        var acc = 0L
        rs.map { case (pid, _, c) =>
          val off = acc; acc += c; Row(pid, g, off, totals(g))
        }.toSeq
      }
    val groupField = parted.schema(groupCol)
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1),
      StructType(Seq(
        StructField("_opid", IntegerType, nullable = false),
        StructField("_og", groupField.dataType, groupField.nullable),
        StructField("_off", LongType, nullable = false),
        StructField("_n", LongType, nullable = false))))

    // pass 2: streaming local index per (partition, group) — the frame
    // is sorted by (group, orderCols) within each partition, so a
    // running counter that resets on group change IS the local rank
    val schema2 = parted.schema.add("_lrank", LongType, nullable = false)
    val ranked = spark.createDataFrame(
      parted.rdd.mapPartitions { it =>
        var cur: Any = null
        var started = false
        var cnt = 0L
        it.map { r =>
          val g = r.get(gIdx)
          if (!started || !java.util.Objects.equals(g, cur)) {
            started = true; cur = g; cnt = 0L
          }
          cnt += 1
          Row.fromSeq(r.toSeq :+ cnt)
        }
      }, schema2)

    // standard SQL ntile split from the global rank: base = n div k,
    // rem = n mod k; the first rem buckets hold base+1 rows.
    // greatest(_base, 1) keeps the (unreachable when _base = 0) else
    // branch free of a division by zero under ANSI evaluation.
    ranked
      .join(broadcast(offsetsDf),
        col("_pid") === col("_opid") && col(groupCol) <=> col("_og"))
      .withColumn("_rank", col("_off") + col("_lrank"))
      .withColumn("_base", expr(s"_n div $buckets"))
      .withColumn("_rem", col("_n") % buckets)
      .withColumn("bucket",
        when(col("_rank") <= col("_rem") * (col("_base") + lit(1L)),
          expr("(_rank - 1) div (_base + 1) + 1"))
          .otherwise(expr(
            "_rem + (_rank - _rem * (_base + 1) - 1) div greatest(_base, 1) + 1")))
      .drop("_pid", "_opid", "_og", "_off", "_n", "_lrank", "_rank",
        "_base", "_rem")
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
