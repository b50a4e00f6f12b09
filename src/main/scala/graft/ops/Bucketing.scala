package graft.ops

import org.apache.spark.sql.DataFrame

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
}
