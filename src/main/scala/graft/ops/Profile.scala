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
    * of exactness; profile a 100 TB feed with a column subset, or
    * swap `approx_count_distinct` in at the call site when ±2% is
    * fine (the oracle needs exact).
    */
  def table(df: DataFrame, numCols: Seq[String], strCols: Seq[String],
            tsCols: Seq[String]): DataFrame = {
    val all = numCols ++ strCols ++ tsCols
    require(all.nonEmpty, "profile at least one column")
    require(all.distinct.size == all.size, "a column may appear once")
    def proj(c: String): Column =
      if (tsCols.contains(c)) unix_timestamp(col(c)) else col(c)
    val aggs = Seq(count(lit(1)).as("_n")) ++ all.flatMap { c =>
      Seq(count(proj(c)).as(s"_cnt_$c"),
        countDistinct(proj(c)).as(s"_nd_$c"),
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
}
