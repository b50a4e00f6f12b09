package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-shard manifest — the WRITE-SIDE planning step
  * after selection: a 100 TB corpus ships to trainers as ~10³–10⁵
  * fixed-role shard files, and every document needs (which shard, where
  * inside it) decided reproducibly BEFORE any file is written, so the
  * writer job, the index/manifest file, and any re-run all agree.
  *
  * Two decisions, both layout-independent:
  *  - shard   = md5₆₀(salt ‖ id) mod nShards — the [[Sampling]] hash
  *    convention (no RNG, no round-robin dependence on partition
  *    layout); salting keeps shard assignment decorrelated from any
  *    upstream hash-sample on the same ids.
  *  - offset  = the inclusive running token total within the shard in
  *    doc_id order, via the range-partitioned two-pass
  *    [[PrefixSum.runningTotals]] core — NOT `sum() OVER (PARTITION BY
  *    shard)`: nShards is small by construction, so the Window
  *    formulation would move the whole corpus through nShards tasks
  *    and sort each shard's slice in one (the classic low-cardinality
  *    WindowExec scale-killer the PrefixSum core exists to avoid).
  *
  * Output = input id/carry columns + n_tokens + shard + token_start /
  * token_end (the doc's half-open token interval inside its shard) +
  * shard_tokens (the shard's grand total — the writer's preallocation
  * size). A downstream writer partitions by `shard` and writes rows in
  * `doc_id` order; equal manifests in, equal files out.
  */
object Sharding {

  /** Build the manifest. `tokenCol` must be a non-null integral column
    * (token/byte counts); `carryCols` ride along unchanged (source,
    * lang, …). `nShards` is the file count, not a parallelism knob —
    * the PrefixSum core's range partitioning keeps per-task work
    * bounded regardless.
    */
  def shardManifest(df: DataFrame, idCol: String, tokenCol: String,
                    nShards: Int, salt: String = "shard:",
                    carryCols: Seq[String] = Nil,
                    partitions: Int = 0,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val withShard = df.select(
        col(idCol).as("doc_id") +: carryCols.map(col) :+
          col(tokenCol).cast("long").as("n_tokens"): _*)
      .withColumn("shard",
        graft.functions.Md5Long60(df.sparkSession,
          concat(lit(salt), col("doc_id").cast("string")).cast("binary"))
          % nShards)
    PrefixSum.runningTotals(withShard, Seq("shard"), Seq("doc_id"),
        valueCol = Some("n_tokens"), runCol = "token_end",
        totCol = Some("shard_tokens"), partitions = partitions,
        checkpointDir = checkpointDir)
      .withColumn("token_start", col("token_end") - col("n_tokens"))
  }

  /** Execute a [[shardManifest]]: join the full-width corpus onto the
    * (narrow) manifest and write one parquet file per shard, rows in
    * `doc_id` order — the layout the manifest's token intervals
    * describe, so a trainer can seek `token_start` inside shard `k`
    * and find the document the manifest promised.
    *
    * The plan pays exactly ONE full-width shuffle: `repartition(shard)`
    * hash-clusters every shard's rows into a single task (so
    * `partitionBy` emits exactly one file per shard), and the
    * within-partition sort orders them by (shard, doc_id). That
    * shuffle IS the operation — shard files are a physical re-layout
    * of the corpus; nothing else (the manifest join is a size-planned
    * equi-join on doc_id, narrow side dimension-free). Determinism:
    * equal manifests in, byte-equal shard files out — no round-robin,
    * no RNG, no task-order dependence.
    */
  def writeShards(manifest: DataFrame, fullWidth: DataFrame, idCol: String,
                  path: String): Unit = {
    // the manifest's carry columns may duplicate corpus columns
    // (source, n_tokens) and a duplicate name fails the parquet write:
    // keep the corpus's copy, and from the manifest only the columns
    // the corpus lacks (shard + the token intervals in the usual case)
    require(!fullWidth.columns.exists(_.equalsIgnoreCase("shard")),
      "fullWidth must not already carry a 'shard' column")
    val clash = fullWidth.columns.map(_.toLowerCase).toSet
    val fromManifest = manifest.columns.filter(c =>
      c.equalsIgnoreCase("doc_id") || !clash.contains(c.toLowerCase))
    manifest.select(fromManifest.map(col).toSeq: _*)
      .join(fullWidth.withColumnRenamed(idCol, "doc_id"), Seq("doc_id"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }
}
