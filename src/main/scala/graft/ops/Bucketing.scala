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

  /** The APPEND form of [[writeBucketed]] — the one write recipe every
    * incremental store ingest shares (index, positional, edge, PQ
    * code slices): append new rows as bucket files against the
    * table's EXISTING spec. Spark validates bucket count and sort
    * columns against the catalog entry, so a mismatched layout fails
    * loudly instead of corrupting the store. Centralized so a future
    * spec change edits one place, not one per store family.
    */
  def appendBucketed(df: DataFrame, table: String, keyCols: Seq[String],
                     buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(buckets > 0, "buckets must be positive")
    var w = df.write.mode("append").format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
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
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** N-column Morton value: the low `bits` bits of each column
    * interleaved round-robin — column i owns bit positions
    * b·N + i, so for N = 2 this IS [[zValue]]'s layout bit-for-bit
    * (x even positions, y odd; the q136 oracle is unchanged). Real
    * layout jobs z-order 3–4 dimensions (source × time × length);
    * the same fold generalizes: still pure codegen'd shift/and
    * arithmetic, still engine-reproducible (the q154 oracle), and a
    * scan filtering any SUBSET of the columns prunes on footer stats
    * (BucketingSpec proves the 3-dim box). N·bits ≤ 62 keeps the key
    * in a positive BIGINT; negative coordinates raise (arithmetic
    * shiftright would silently collapse them onto the all-ones curve
    * corner and void the pruning promise).
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "zValueN needs at least 2 columns")
    require(bits >= 1 && n * bits <= 62,
      s"need bits >= 1 and n*bits <= 62, got n=$n bits=$bits")
    val z = (for { b <- 0 until bits; (c, i) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_ + _)
    // fail loudly on negative coordinates (the lshBuckets guard
    // convention)
    when(cols.map(_ >= 0).reduce(_ && _), z).otherwise(raise_error(
      concat((lit("zValueN: negative coordinate (") +:
        cols.zipWithIndex.flatMap { case (c, i) =>
          (if (i == 0) Nil else Seq(lit(", "))) :+ c.cast("string")
        } :+ lit(")")): _*)))
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
                  path: String, numFiles: Int): Unit =
    zOrderWriteN(df, Seq(xCol, yCol), bits, path, numFiles)

  /** [[zOrderWrite]] over N dimensions ([[zValueN]]): each written file
    * covers a compact N-dimensional region, so a scan filtering on ANY
    * subset of the layout columns skips most files on min/max footer
    * stats.
    */
  def zOrderWriteN(df: DataFrame, colNames: Seq[String], bits: Int,
                   path: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    // partition and sort on the z EXPRESSION directly — no temp column
    // to collide with (or clobber) a user column named "zval"
    val z = zValueN(colNames.map(col), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
