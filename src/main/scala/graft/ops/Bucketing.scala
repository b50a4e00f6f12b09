package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed tables: the pre-shuffled, co-located-join primitive for
  * fact-to-fact joins that recur on the same key (SURVEY §6 scale
  * notes; e.g. orders⋈customer, lineitem⋈orders, candidate-pairs⋈docs
  * in the dedup pipeline).
  *
  * A big-to-big equi-join normally shuffles BOTH sides on the join key
  * every time it runs. Writing each side once with `bucketBy(n, key)`
  * pre-hashes rows into n buckets at write time; any later join (or
  * groupBy) on that key between tables bucketed with the SAME bucket
  * count reads bucket i against bucket i directly — zero Exchange in
  * the plan, on every downstream run (BucketingSpec pins the
  * Exchange-free plan). At 100 TB that converts the recurring
  * full-table shuffle — the single most expensive stage in the plan —
  * into a one-time write-side cost.
  *
  * Sizing: buckets is fixed at write time; pick it so one bucket of
  * the LARGER table fits an executor core's working memory at target
  * scale (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket — too big;
  * 32768 ≈ 3 GB — workable), and share the count across every table
  * that joins on the key. Adding `sortBy(key)` makes the downstream
  * sort-merge join skip its per-bucket sort too when files-per-bucket
  * is 1.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet table
    * registered as `table`. With `path` set the table is external (its
    * files live — and stay — at `path`); otherwise it is managed under
    * the session warehouse. Spark-native bucketing (hash of `keyCols`
    * mod `buckets`, one file set per bucket) — readable back with
    * `spark.table(table)`, where joins/aggs on `keyCols` against any
    * same-bucket-count table plan with no Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, keyCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(buckets > 0, "buckets must be positive")
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Morton (Z-order) value of two non-negative integer columns: the
    * low `bits` bits of `x` and `y` interleaved (x even positions, y
    * odd). Points close in (x, y) get close z-values, so RANGE
    * partitioning + sorting by z clusters BOTH dimensions at once —
    * the multi-column data-layout trick behind file skipping on two
    * filter columns (a plain sort clusters only its leading column;
    * min/max footer stats on the second column then span the whole
    * range in every file and nothing prunes).
    *
    * Built as a fold of codegen'd bit arithmetic (shift/and/or — no
    * UDF, stays inside WholeStageCodegen) and reproducible in any
    * engine, so layouts are auditable cross-engine (the q136 oracle).
    * Values above 2^bits fold onto the curve by truncation — pick
    * `bits` to cover the domain (2·bits <= 62).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val z = (0 until bits).map { b =>
      shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
    // fail loudly on negative coordinates (the lshBuckets guard
    // convention): arithmetic shiftright drags sign bits in, which
    // would silently collapse every negative point onto the all-ones
    // curve corner and void the layout's pruning promise
    when(x >= 0 && y >= 0, z).otherwise(raise_error(
      concat(lit("zValue: negative coordinate (x="), x.cast("string"),
        lit(", y="), y.cast("string"), lit(")"))))
  }

  /** Z-order layout write: range-partition on [[zValue]] into
    * `numFiles` contiguous curve segments, sort within each, write one
    * parquet file per segment. Each file then covers a compact (x, y)
    * region, so a scan filtering on EITHER dimension (or a box on
    * both) skips most files on min/max footer stats — the layout step
    * a 100 TB table does once at ingest to make every later
    * two-dimensional filter cheap. The range exchange samples z-values
    * (one extra pass) — the standard cost of a layout job, paid at
    * write time, never at read.
    */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  path: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    // partition and sort on the z EXPRESSION directly — no temp column
    // to collide with (or clobber) a user column named "zval"
    val z = zValue(col(xCol), col(yCol), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
