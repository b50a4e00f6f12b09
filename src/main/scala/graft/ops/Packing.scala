package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining data prep — the concat-and-chunk
  * scheme: documents are concatenated in id order into one token
  * stream, which is cut into fixed `ctxLen` windows ("bins"); a
  * document's tokens land in the half-open global interval
  * [start, start+cnt), possibly spanning bins. Downstream writers read
  * off exactly which context windows a document feeds and at what
  * offset — the metadata a packed-batch writer needs.
  *
  * The global running sum is computed WITHOUT a single-partition
  * Window (the naive `sum over (order by id rows unbounded preceding)`
  * moves the whole table through one task): it is the keyless form of
  * [[PrefixSum.runningTotals]] — range partition by id, lazy pin,
  * distributed two-pass prefix offsets (mechanics and the AQE
  * construction caveat documented there; [[Checkpoints]] for the
  * reliable-cluster mode).
  *
  * Output: (doc_id, token_cnt, start, first_bin, last_bin,
  * offset_in_first) — bins are `ctxLen`-sized, `div`/`%` integer math,
  * zero-token documents are excluded (they occupy no interval).
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, cntCol: String,
                    ctxLen: Int, partitions: Int = 0,
                    checkpointDir: Option[String] = None): DataFrame = {
    require(ctxLen >= 1, "ctxLen must be >= 1")
    val proj = df
      .select(col(idCol).as("doc_id"), col(cntCol).cast("long").as("token_cnt"))
      .filter(col("token_cnt") > 0)
    // inclusive running token total over id order (keyless: one global
    // sequence); start = total minus own count
    PrefixSum.runningTotals(proj, groupCols = Nil, orderCols = Seq("doc_id"),
        valueCol = Some("token_cnt"), runCol = "_rsum",
        partitions = partitions, checkpointDir = checkpointDir)
      .withColumn("start", col("_rsum") - col("token_cnt"))
      .select(col("doc_id"), col("token_cnt"), col("start"),
        expr(s"start div $ctxLen").as("first_bin"),
        expr(s"(start + token_cnt - 1) div $ctxLen").as("last_bin"),
        expr(s"start % $ctxLen").as("offset_in_first"))
  }

  /** Training-batch EXPORT — the pipeline's last mile, chaining the
    * three already-oracled stages into ONE op (the r13 verdict's
    * composition item): epoch-deterministic shuffle
    * ([[Sampling.epochShuffle]], q162) → concat-and-chunk packing IN
    * SHUFFLE ORDER ([[packSequences]]' interval math, q91) → shard
    * assignment (q119's data-parallel split, here round-robin over the
    * packed sequence index so every shard holds an equal, interleaved
    * slice of the epoch's stream). Output row per document:
    *
    *   (doc_id, epoch, shuffle_rank, token_cnt, start, sequence,
    *    last_sequence, offset_in_first, shard, batch)
    *
    * where `sequence` = the ctxLen window its first token lands in
    * (the trainer's global sequence index for this epoch), `shard` =
    * sequence % nShards (which worker reads it), `batch` = sequence
    * div nShards (that worker's step). Everything is hash-derived /
    * integer math — zero RNG, layout-independent, replayable
    * relationally (the q170 oracle nests the three stages' own oracle
    * bodies as CTEs).
    *
    * Scale shape: two chained [[PrefixSum.runningTotals]] passes (the
    * rank, then the running token total over that rank's order) — each
    * a range shuffle of a NARROW (id, cnt) projection plus two scans
    * of a pinned frame; never a single-task row_number/Window sort.
    * Re-keying the second pass on `shuffle_rank` is exact because the
    * rank is already a total order.
    */
  def trainingExport(df: DataFrame, idCol: String, cntCol: String,
                     epoch: Int, ctxLen: Int, nShards: Int,
                     checkpointDir: Option[String] = None): DataFrame = {
    require(ctxLen >= 1, "ctxLen must be >= 1")
    require(nShards >= 1, "nShards must be >= 1")
    val proj = df
      .select(col(idCol).as("doc_id"), col(cntCol).cast("long").as("token_cnt"))
      .filter(col("token_cnt") > 0)
    val ordered = Sampling.epochShuffle(proj, "doc_id", epoch,
      checkpointDir = checkpointDir)
    PrefixSum.runningTotals(ordered, groupCols = Nil,
        orderCols = Seq("shuffle_rank"), valueCol = Some("token_cnt"),
        runCol = "_rsum", checkpointDir = checkpointDir)
      .withColumn("start", col("_rsum") - col("token_cnt"))
      .select(col("doc_id"), lit(epoch.toLong).as("epoch"),
        col("shuffle_rank"), col("token_cnt"), col("start"),
        expr(s"start div $ctxLen").as("sequence"),
        expr(s"(start + token_cnt - 1) div $ctxLen").as("last_sequence"),
        expr(s"start % $ctxLen").as("offset_in_first"))
      .withColumn("shard", col("sequence") % nShards)
      .withColumn("batch", expr(s"sequence div $nShards"))
  }
}
