package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The shared distributed prefix-sum core of [[Quantiles.exactNtile]]
  * (group-keyed ranks) and [[Packing.packSequences]] (keyless running
  * token offsets) — extracted per the round-7 verdict before a third
  * copy appeared.
  *
  * The naive formulation — `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED
  * PRECEDING)`, or `row_number()` over a low-cardinality partition key
  * — moves an entire (group's) table through ONE task and sorts it
  * there: the classic WindowExec scale-killer. This core computes the
  * identical inclusive running totals with bounded per-task work:
  *
  *  1. `repartitionByRange` on (groupCols ++ orderCols) — Spark's
  *     range partitioner (sampled boundaries) yields globally ordered
  *     partitions, each a bounded slice of the sort order, sorted
  *     within via `sortWithinPartitions`;
  *  2. the frame is pinned ([[Checkpoints.pin]], LAZILY — it
  *     materializes at the result's first action) so both passes read
  *     the SAME materialized partitioning: one shared RDD, the range
  *     sampler draws its boundaries exactly once;
  *  3. pass 1: per-(partition, group) value sums — a partial-aggregated
  *     shuffle of numPartitions × |groups| tiny rows — folded into
  *     prefix offsets (and group totals, when asked) DISTRIBUTED, via a
  *     self-join on the group key over that tiny sums frame (≤ |groups|
  *     × partitions² rows of dust; keyless callers cross-join the two
  *     partition-count-sized frames — partitions² rows). The driver is
  *     never in the data path;
  *  4. pass 2: a per-partition streaming scan accumulates the local
  *     running value (resetting on group change — the frame is sorted
  *     by group first), and the broadcast-joined offset completes it to
  *     the global inclusive total.
  *
  * No Window over the data anywhere, no global single-task sort, no
  * driver collect; wall-clock is two scans of the pinned frame plus the
  * range shuffle (PlanShapeSpec pins the Window-free shapes via q40 and
  * q77). Construction cost: building the result launches no collect and
  * no materialization pass, but translating the pinned frame to an RDD
  * runs the range sampler, and under AQE the pin's upstream stages
  * execute at construction — construct it when you intend to run it.
  *
  * Helper columns are collision-proofed: every internal name is
  * suffixed until it clashes with nothing in the input or the caller's
  * output names (case-insensitively — Spark's default resolver is).
  */
object PrefixSum {

  /** `df` + `runCol` (the inclusive running total of `valueCol` — or of
    * 1 per row when None, i.e. the 1-based rank — over the (groupCols,
    * orderCols) total order, per group) + optionally `totCol` (the
    * group's grand total).
    *
    * `valueCol`, when given, must be a non-null integral column (pass 2
    * reads it as Long). `groupCols` empty ⇒ one global sequence.
    * `orderCols` must make (groupCols ++ orderCols) a total order for
    * the assignment to be deterministic (ties are partition-arbitrary,
    * same as SQL).
    *
    * @param partitions    range-partition count; 0 ⇒ session
    *                      `spark.sql.shuffle.partitions`
    * @param checkpointDir reliable checkpoint root for the pinned
    *                      frame; None ⇒ executor-local (see
    *                      [[Checkpoints]])
    */
  def runningTotals(df: DataFrame, groupCols: Seq[String],
                    orderCols: Seq[String], valueCol: Option[String],
                    runCol: String, totCol: Option[String] = None,
                    partitions: Int = 0,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(orderCols.nonEmpty || groupCols.nonEmpty,
      "runningTotals needs at least one group or order column")
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // collision-free helper names: one shared suffix, probed
    // case-insensitively against the input AND the caller's outputs
    val gBases = groupCols.indices.flatMap(i => Seq(s"_og$i", s"_bg$i"))
    val bases = Seq("_pid", "_val", "_opid", "_bpid", "_bval", "_off",
      "_lrun") ++ gBases
    val taken = df.columns.toSeq ++ (runCol +: totCol.toSeq)
    val sfx = Iterator.iterate("")(_ + "_").find { s =>
      bases.forall(b => !taken.exists(_.equalsIgnoreCase(b + s)))
    }.get
    def h(b: String): String = b + sfx
    val pid = h("_pid"); val bval = h("_bval")
    val opid = h("_opid"); val bpid = h("_bpid")
    val off = h("_off"); val lrun = h("_lrun")
    val ogs = groupCols.indices.map(i => h(s"_og$i"))
    val bgs = groupCols.indices.map(i => h(s"_bg$i"))

    val sortCols = (groupCols ++ orderCols).map(col)
    // LAZY pin: one shared internal RDD for both passes (the sampler
    // runs once, boundaries identical), materialized at the first
    // action on the result instead of at construction
    val parted = Checkpoints.pin(
      df.repartitionByRange(nParts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
        .withColumn(pid, spark_partition_id()),
      checkpointDir, eager = false)

    // pass 1: per-(partition, group) sums → prefix offsets (+ group
    // totals). Range partitions are ordered by (group, order), so the
    // sum of same-group values with a smaller partition id IS the
    // (partition, group) slice's global starting offset.
    val valueExpr = valueCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    val sums = parted.groupBy(col(pid) +: groupCols.map(col): _*)
      .agg(valueExpr.cast("long").as(bval))
    val oSide = sums.select(col(pid).as(opid) +:
      groupCols.zip(ogs).map { case (g, o) => col(g).as(o) }: _*)
    val bSide = sums.select(col(pid).as(bpid) +: col(bval) +:
      groupCols.zip(bgs).map { case (g, b) => col(g).as(b) }: _*)
    val joined =
      if (groupCols.isEmpty) oSide.crossJoin(bSide)
      else oSide.join(bSide,
        ogs.zip(bgs).map { case (o, b) => col(o) <=> col(b) }.reduce(_ && _))
    val aggs = sum(when(col(bpid) < col(opid), col(bval)).otherwise(lit(0L)))
      .as(off) +: totCol.map(t => sum(col(bval)).as(t)).toSeq
    val offsets = joined.groupBy(col(opid) +: ogs.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // pass 2: streaming per-(partition, group) running total — the
    // frame is sorted by (group, orderCols) within each partition, so
    // an accumulator that resets on group change IS the local total
    val gIdxs = groupCols.map(parted.schema.fieldIndex)
    val vIdx = valueCol.map(parted.schema.fieldIndex)
    val schema2 = parted.schema.add(lrun, LongType, nullable = false)
    val summed = spark.createDataFrame(
      parted.rdd.mapPartitions { it =>
        var cur: Seq[Any] = null
        var started = false
        var acc = 0L
        it.map { r =>
          if (gIdxs.nonEmpty) {
            val g = gIdxs.map(r.get)
            val changed = !started ||
              !g.zip(cur).forall { case (a, b) => java.util.Objects.equals(a, b) }
            if (changed) { started = true; cur = g; acc = 0L }
          }
          acc += vIdx.map(r.getLong).getOrElse(1L)
          Row.fromSeq(r.toSeq :+ acc)
        }
      }, schema2)

    val joinCond = ((col(pid) === col(opid)) +:
      groupCols.zip(ogs).map { case (g, o) => col(g) <=> col(o) })
      .reduce(_ && _)
    summed.join(broadcast(offsets), joinCond)
      .withColumn(runCol, col(off) + col(lrun))
      .drop((pid +: opid +: off +: lrun +: ogs): _*)
  }
}
