package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact table profiling — the data-quality audit every warehouse runs
  * before trusting a feed: per column, row/null/distinct counts and
  * min/max, emitted one row per column. The engine-native analog of
  * `DataFrame.summary`, but EXACT and cross-engine deterministic (no
  * approx quantiles, no float formatting: numeric bounds stay numeric
  * doubles rounded at 6, string bounds stay strings, timestamps
  * project to epoch seconds — double→string casts would differ between
  * engines, so the two families ride separate columns).
  */
object Profile {

  /** One profiling pass over `df`: `numCols` (numeric), `strCols`
    * (string), `tsCols` (timestamp) each yield a row
    * (column, n_rows, n_null, n_distinct, min_num, max_num, min_str,
    * max_str) — bounds of the other family are null.
    *
    * Shape: ONE aggregate over one scan. The exact per-column
    * distincts make Spark plan an Expand (one input row fans to one
    * row per distinct-aggregate) — cost ∝ columns profiled, the price
    * of exactness; profile a 100 TB feed with a column subset, or use
    * [[approxTable]] (the Expand-free HLL++ sibling, band-audited by
    * its own oracle entry) when ±5% is fine (this oracle needs exact).
    */
  def table(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
            tsCols: Seq[String]): DataFrame =
    profileBody(df, numCols, strCols, tsCols, exact = true, rsd = 0.0)

  /** [[table]] with `approx_count_distinct` (HLL++, relative sd
    * `rsd`) in place of the exact per-column distincts — the form a
    * 100 TB feed profiles with: the exact table's Expand (one input
    * row fans to one row per distinct aggregate) disappears, the scan
    * aggregates once with constant-size sketch state per column. Same
    * output schema, so it is a drop-in swap; `n_distinct` is an
    * ESTIMATE here (deterministic — HLL register merges are
    * order-independent — but engine-specific, so the correctness
    * story is the band audit against [[table]], the q110 pattern).
    * Row/null counts and bounds stay exact in both forms.
    */
  def approxTable(df: DataFrame, numCols: Seq[String],
                  strCols: Seq[String], tsCols: Seq[String],
                  rsd: Double = 0.05): DataFrame =
    profileBody(df, numCols, strCols, tsCols, exact = false, rsd = rsd)

  private def profileBody(df: DataFrame, numCols: Seq[String],
                          strCols: Seq[String], tsCols: Seq[String],
                          exact: Boolean, rsd: Double): DataFrame = {
    val all = numCols ++ strCols ++ tsCols
    require(all.nonEmpty, "profile at least one column")
    require(all.distinct.size == all.size, "a column may appear once")
    def proj(c: String): Column =
      if (tsCols.contains(c)) unix_timestamp(col(c)) else col(c)
    def nd(c: String): Column =
      if (exact) countDistinct(proj(c))
      else approx_count_distinct(proj(c), rsd)
    val aggs = Seq(count(lit(1)).as("_n")) ++ all.flatMap { c =>
      Seq(count(proj(c)).as(s"_cnt_$c"),
        nd(c).as(s"_nd_$c"),
        min(proj(c)).as(s"_min_$c"), max(proj(c)).as(s"_max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { c =>
      val isStr = strCols.contains(c)
      struct(
        lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        (if (isStr) lit(null).cast("double")
         else round(col(s"_min_$c").cast("double"), 6)).as("min_num"),
        (if (isStr) lit(null).cast("double")
         else round(col(s"_max_$c").cast("double"), 6)).as("max_num"),
        (if (isStr) col(s"_min_$c").cast("string")
         else lit(null).cast("string")).as("min_str"),
        (if (isStr) col(s"_max_$c").cast("string")
         else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Hierarchical ROLLUP datasheet — per-dimension-prefix totals in
    * one pass (the (source), (source, lang), () levels every dataset
    * card's "composition" table wants): `rollup` plans ONE Expand +
    * ONE hash aggregate, not |dims|+1 scans, which is why the SQL
    * construct exists. Rolled-up dimension values print "(all)" and
    * `gid` (the standard grouping bitmask, leftmost dim = most
    * significant bit) keeps them distinguishable from a genuine
    * "(all)" value in the data. Counts and the weight sum are exact
    * integers — every engine agrees bit-for-bit.
    */
  def rollupSheet(df: DataFrame, dims: Seq[String],
                  weightCol: String): DataFrame = {
    require(dims.nonEmpty, "need at least one rollup dimension")
    df.rollup(dims.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col(weightCol)).as("w_sum"))
      .select(dims.map(c =>
        coalesce(col(c).cast("string"), lit("(all)")).as(c)) ++
        Seq(col("gid"), col("n_rows"), col("w_sum")): _*)
  }

  /** Key-skew audit — the operability read behind every "why is one
    * task still running" page: per-key row counts, the top-`k` keys by
    * count with their exact share in parts-per-million
    * (`cnt · 1e6 div total` — integer division, no float folds), and
    * the running concentration (top-1..r cumulative ppm), plus the
    * table-level totals on every row so the audit is self-contained.
    * A key at rank 1 holding 50,000+ ppm of a 32-partition shuffle is
    * the salting signal (the q96 salted-join remedy).
    *
    * Shape: ONE hash aggregate to the per-key counts (dimension
    * scale), a 1-row total broadcast, and a sort-limit top-k
    * (TakeOrderedAndProject — never a global Window over the key
    * dimension); the cumulative sum is a window over k rows only.
    * Ties break by key ascending, so the rank is deterministic.
    */
  def skewAudit(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key").asc)))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .select(col("rank").cast("long").as("rank"), col("key"),
        col("cnt"), col("total_rows"), col("n_keys"),
        expr("cnt * 1000000L div total_rows").as("share_ppm"),
        expr("cum_cnt * 1000000L div total_rows").as("cum_ppm"))
  }

  /** Small-file compaction planner — the lakehouse maintenance read:
    * within each `groupCol` partition, files ordered by `idCol` are
    * chained into bins of ≈`targetBytes` by START-offset binning
    * (`bin = running_bytes_before_file div target`), the standard
    * ordered bin packing that keeps every bin a contiguous id range
    * (so compaction rewrites preserve clustering/sort order — the
    * property greedy first-fit would destroy). A file larger than the
    * target gets its own bin by the same rule. Emits one row per
    * planned output bin with its id range, file count, and bytes.
    *
    * Shape: one window per group partition (running sum — Spark
    * sorts within the hash partition, no driver loop) + one hash
    * aggregate; work ∝ the file MANIFEST, never the data. Bins are
    * a deterministic function of the manifest, so two engines agree
    * exactly.
    */
  def compactionPlan(files: DataFrame, groupCol: String, idCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id"))
    files.select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("bytes"))
      .withColumn("_before",
        coalesce(sum(col("bytes")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"_before div ${targetBytes}L"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        min(col("id")).as("id_lo"), max(col("id")).as("id_hi"))
  }

  /** Referential-integrity audit — ONE summary row for a declared FK
    * edge: child row/key counts, null-key rows (legal SQL that joins
    * to nothing silently — flagged, not folded into orphans), and
    * orphan rows/keys (non-null child keys absent from the parent).
    * The anti-join every warehouse runs before trusting a feed; a
    * zero-orphan row is the point — the audit's value is the green,
    * not just the alarm. Union several calls for the FK matrix.
    *
    * Shape: ONE left hash equi-join child ⋈ distinct parent keys
    * (shuffles on the key like any join, work ∝ child) and ONE
    * aggregate computing all five counters — a single child scan (the
    * r16 review replaced a three-pass form).
    */
  def fkAudit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String, label: String): DataFrame = {
    val c = child.select(col(childKey).as("k"))
    val p = parent.select(col(parentKey).as("_pk"))
      .filter(col("_pk").isNotNull).distinct()
    val orphan = col("k").isNotNull && col("_pk").isNull
    c.join(p, col("k") === col("_pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("k").isNull, lit(1))).as("n_null_rows"),
        countDistinct(col("k")).as("n_keys"),
        count(when(orphan, lit(1))).as("n_orphan_rows"),
        countDistinct(when(orphan, col("k"))).as("n_orphan_keys"))
      .select(lit(label).as("fk"), col("n_rows"), col("n_null_rows"),
        col("n_keys"), col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** Store-slice DATASHEET — the freshness/size audit every
    * log-structured store needs before its compaction decisions: per
    * slice, the row count, distinct-key count, and weight sum; the
    * read that tells an operator "how many generations, how big, how
    * skewed — is it compaction time". Works on ANY of the engine's
    * slice frames (index/positional/edge/hour-count stores share the
    * (slice, keys..., weight) shape).
    *
    * Shape: ONE hash aggregate over the slices frame (store scale,
    * never corpus scale) — the per-slice exact distinct plans an
    * Expand over one frame, acceptable at store cadence; negative
    * weights (pending tombstones) are COUNTED separately rather than
    * folded invisibly into the sum — a slice holding retractions is
    * exactly what the audit must surface.
    */
  def sliceDatasheet(slices: DataFrame, sliceCol: String,
                     keyCols: Seq[String], weightCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    slices.groupBy(col(sliceCol).as("slice"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(keyCols.head, keyCols.tail: _*).as("n_keys"),
        sum(col(weightCol)).as("w_sum"),
        count(when(col(weightCol) < 0, lit(1))).as("n_tombstone_rows"))
  }
}
