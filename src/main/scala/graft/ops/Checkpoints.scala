package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation helper shared by the iterative / multi-pass
  * operators ([[Dedup.connectedComponents]], [[Quantiles.exactNtile]]).
  *
  * Two modes:
  *  - `None` (default): `localCheckpoint(eager = true)` — blocks live in
  *    executor storage. Fastest, and fine on a single machine or for
  *    short-lived pins, but an executor loss mid-job loses the blocks
  *    and kills the job (no lineage left to recompute from).
  *  - `Some(dir)`: reliable checkpoint into `dir` (HDFS/S3/local path) —
  *    survives executor loss at the cost of a write+read through the
  *    checkpoint filesystem. What a long-running job on a real cluster
  *    should use.
  */
object Checkpoints {

  /** Materialize `df` and truncate its lineage, either executor-locally
    * or reliably into `checkpointDir`.
    */
  def pin(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates a fresh UUID subdir per call; only
        // (re)set when the configured root actually changed
        val current = sc.getCheckpointDir
        if (!current.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
}
