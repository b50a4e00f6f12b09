package graft.sources

import org.apache.spark.sql.DataFrame

/** Batch sink helpers for cluster-scale layouts. */
object Writers {

  /** Partition-pruned parquet layout: directory partitioning on
    * `partitionCols` (so downstream filters prune whole directories)
    * with bounded file sizes (`maxRecordsPerFile` guards against the
    * one-giant-file-per-partition failure mode on skewed partitions).
    */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCols: Seq[String],
                         maxRecordsPerFile: Long = 5000000L,
                         mode: String = "overwrite"): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(mode)
      .parquet(path)
}
