package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.jobs.SelectionPipeline

/** Per-micro-batch data selection — the CONTINUOUS-INGESTION form of
  * [[graft.jobs.SelectionPipeline]], closing the batch/streaming story
  * for the selection layer the way [[StreamingScore]]/[[StreamingGate]]
  * do for scoring and gating.
  *
  * The pipeline cannot run as one continuous query: its stages are
  * multi-action (the sem-dedup self-join, grouped exact quantiles, a
  * corpus-trained DSIR LM — each an aggregation over the WHOLE stage
  * input, not a watermark-bounded window), so the streaming form is the
  * foreachBatch one: every micro-batch is a complete corpus snapshot
  * and the FULL chain runs on it, batch-exactly. That makes the
  * semantics honest and simple — **selection is per batch**: quantile
  * cuts, the DSIR LM, and epoch budgets are all computed within the
  * arriving batch (the bounded-recalibration posture: each ingest slice
  * selects against its own statistics). Cross-batch semantic dedup is
  * explicitly out of scope here — run the watermark-bounded
  * fingerprint dedup (Dedup.streamingFingerprint) upstream, or the
  * full batch pipeline over the accumulated store.
  *
  * Determinism carries over verbatim: every membership decision in the
  * chain is hash-deterministic, so a micro-batch selects EXACTLY what
  * [[SelectionPipeline.run]] selects on the same rows as a static
  * frame — StreamingSpec asserts that equality per batch.
  *
  * `persistStages = true` is the right mode here even though batches
  * are small: the caller's sink reads the kept frame AND the counts,
  * i.e. multiple actions per batch — the exact multi-consumer case the
  * flag exists for. The runner unpersists after the sink returns.
  */
object StreamingSelection {

  /** Build a `foreachBatch` function running the full selection chain
    * on each micro-batch against the static `emb` frame, handing
    * (batchId, kept, stage counts, allocation) to `sink`. The kept
    * frame is persisted while `sink` runs and unpersisted after —
    * consume it inside the sink (write/collect), don't leak it.
    *
    * Usage:
    * {{{
    * docsStream.writeStream
    *   .foreachBatch(StreamingSelection.perBatchSelector(emb, ..., sink))
    *   .start()
    * }}}
    */
  def perBatchSelector(
      emb: DataFrame,
      centroidIds: Seq[Long], semThreshold: Double,
      targetFilter: Column, budget: Long,
      epochWeights: Map[String, Long],
      temperature: Double = 0.01,
      qualityBuckets: Int = 4,
      defaultWeight: Long = 1L,
      sink: (Long, DataFrame, Seq[(String, Long)], DataFrame) => Unit)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val (kept, counts, alloc) = SelectionPipeline.run(
        batch, emb, centroidIds, semThreshold, targetFilter, budget,
        epochWeights, temperature, qualityBuckets, defaultWeight,
        persistStages = true)
      try sink(batchId, kept, counts, alloc)
      finally kept.unpersist()
    }
}
