package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation helper shared by the iterative / multi-pass
  * operators ([[Dedup.connectedComponents]], [[Quantiles.exactNtile]]).
  *
  * Two modes:
  *  - `None` (default): `localCheckpoint` — blocks live in executor
  *    storage. Fastest, and fine on a single machine or for short-lived
  *    pins, but an executor loss mid-job loses the blocks and kills the
  *    job (no lineage left to recompute from).
  *  - `Some(dir)`: reliable checkpoint into `dir` (HDFS/S3/local path) —
  *    survives executor loss at the cost of a write+read through the
  *    checkpoint filesystem. What a long-running job on a real cluster
  *    should use. NOTE: this mode MUTATES the session-global checkpoint
  *    root (`SparkContext.setCheckpointDir`) when the currently
  *    configured root is not already inside `dir` — every subsequent
  *    `rdd.checkpoint` in the session, from any caller, writes under
  *    `dir` afterwards.
  */
object Checkpoints {

  /** Materialize `df` (or, with `eager = false`, mark it to materialize
    * and truncate at its first action) and cut its lineage, either
    * executor-locally or reliably into `checkpointDir`.
    */
  def pin(df: DataFrame, checkpointDir: Option[String],
          eager: Boolean = true): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates a fresh UUID subdir per call; only
        // (re)set when the configured root actually changed
        if (!sc.getCheckpointDir.exists(isWithin(_, dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager = eager)
      case None =>
        df.localCheckpoint(eager = eager)
    }

  /** True iff `current` (a possibly fs-qualified URI string such as
    * `file:/tmp/root/<uuid>`, as `SparkContext.getCheckpointDir`
    * returns) lies within the root `dir`, compared COMPONENT-WISE — a
    * raw string prefix would false-match an existing root `/a/bc`
    * against `dir = /a/b` and silently skip the re-set, leaving
    * checkpoints in the wrong root (VERDICT r6). Scheme and authority
    * must agree when both sides carry them; a bare path is compatible
    * with any filesystem (the common case: `dir = /tmp/x` vs the
    * qualified `file:/tmp/x/<uuid>`).
    */
  private[graft] def isWithin(current: String, dir: String): Boolean = {
    def parse(s: String): (Option[String], java.nio.file.Path) = {
      val uri = try Option(new java.net.URI(s)) catch { case _: Exception => None }
      uri match {
        case Some(u) if u.getScheme != null && u.getPath != null && u.getPath.nonEmpty =>
          (Some(u.getScheme + Option(u.getAuthority).map("//" + _).getOrElse("")),
            java.nio.file.Paths.get(u.getPath).normalize())
        case _ => (None, java.nio.file.Paths.get(s).normalize())
      }
    }
    val (curFs, curPath) = parse(current)
    val (dirFs, dirPath) = parse(dir)
    val fsOk = (curFs, dirFs) match {
      case (Some(a), Some(b)) => a == b
      case _                  => true
    }
    fsOk && curPath.startsWith(dirPath)
  }
}
