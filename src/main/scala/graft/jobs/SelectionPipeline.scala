package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Bucketing, Checkpoints, Dedup, Quantiles, Sampling, TextAnalysis}

/** The data-SELECTION pipeline end-to-end — the companion of
  * [[CorpusPipeline]] (which cleans a corpus) for the stage AFTER
  * cleaning: decide WHICH of the clean documents to train on, and how
  * often. One composable flow chaining the engine's selection
  * operators:
  *
  *   1. semantic dedup      (Dedup.semDedupLosers over the embeddings —
  *                           drop every doc with a lower-id
  *                           near-identical cluster-mate, q102)
  *   2. per-domain quality  (keep each source's own top quality
  *      gate                 quantile — Quantiles.exactNtile over the
  *                           carried qualityScore, q107)
  *   3. DSIR resample       (importance-score against the target
  *                           slice's LM, keep with probability
  *                           exp(llr/T) by id hash, q103)
  *   4. epoch allocation    (how many passes of each source a token
  *                           budget buys, plus the hash-picked
  *                           fractional remainder, q104)
  *
  * Every membership decision is hash-deterministic (no RNG anywhere),
  * so the same selection comes out at any parallelism and the DuckDB
  * oracle replays the WHOLE chain as CTEs (the q117 entry, which
  * nests the SAME parameterized SQL bodies the per-stage oracles
  * q102/q107/q103/q104 use). Stages gate by anti/semi joins on NARROW
  * id sets, the CorpusPipeline discipline, in one of two modes:
  *
  *  - default (`bucketStore = None`): the id frames carry one long
  *    per row and are EXPLICITLY broadcast (SelectionPipelineSpec
  *    pins zero text-carrying Exchange — left to stats the optimizer
  *    estimates the gate subtrees as unbroadcastable and SMJ-shuffles
  *    the corpus), so the full-width corpus never shuffles. Right for
  *    corpora whose survivor-id sets fit executor memory.
  *  - bucketed (`bucketStore = Some(path)`): the gates' id frames are
  *    SURVIVOR sets — O(corpus cardinality), not dimension-sized — so
  *    at 100 TB a forced broadcast is an executor OOM. Instead the
  *    corpus is written ONCE bucketed by doc_id
  *    ([[graft.ops.Bucketing.writeBucketed]], the [[CorpusPipeline]]
  *    bucket-store shape) and the gates carry NO broadcast hint: the
  *    bucketed scan reports HashPartitioning(doc_id), anti/semi joins
  *    preserve the left side's partitioning through the chain, so
  *    every gate shuffles only its one-column id frame into the
  *    corpus's bucket layout — zero corpus-side Exchange, zero
  *    broadcast (SelectionPipelineSpec pins both, with
  *    autoBroadcastJoinThreshold = -1). The mode changes the PLAN
  *    only, never the selection (spec-pinned equal to default mode).
  *
  * Each stage is persisted so its count and the next stage read the
  * materialized survivors instead of replaying the upstream lineage.
  *
  * `persistStages = false` (the single-consumer mode, e.g. a
  * foreachBatch micro-batch whose sink materializes the result once)
  * also SKIPS the per-stage counts: each count() is an action, and
  * without the cache every one would replay the entire upstream
  * lineage — including the semDedup self-join — making the "cheap"
  * mode quadratic in pipeline depth. Counts require persistStages.
  * (Contract note: sibling [[CorpusPipeline]]'s same-named flag still
  * COMPUTES counts with the cache off, replaying lineage — divergence
  * is deliberate and cross-referenced there.)
  *
  * Returns (kept docs — persisted when persistStages, caller
  * unpersists; per-stage counts — empty when !persistStages;
  * per-stratum epoch allocation frame).
  */
object SelectionPipeline {

  def run(docs: DataFrame, emb: DataFrame,
          centroidIds: Seq[Long], semThreshold: Double,
          targetFilter: Column, budget: Long,
          epochWeights: Map[String, Long],
          temperature: Double = 0.01,
          qualityBuckets: Int = 4,
          defaultWeight: Long = 1L,
          embIdCol: String = "vec_id", embVecCol: String = "embedding",
          persistStages: Boolean = true,
          checkpointDir: Option[String] = None,
          bucketStore: Option[String] = None,
          bucketCount: Int = 32,
          bucketTable: String = "graft_selection_corpus")
      : (DataFrame, Seq[(String, Long)], DataFrame) = {
    // cache(), deliberately NOT the CorpusPipeline pin: this pipeline
    // was measured BOTH ways at sf0.1 (r21) — pinning its stages made
    // q117 ~50% slower (the selection gates re-read each stage with
    // narrow projections, which the columnar cache serves pruned while
    // a localCheckpoint hands back full serialized rows), while the
    // corpus pipeline's pin was a 2× win. Planning depth here is
    // bounded (3 gates), so lineage growth never dominates.
    def cached(df: DataFrame): DataFrame = if (persistStages) df.cache() else df
    val counts = Seq.newBuilder[(String, Long)]
    def count(name: String, df: DataFrame): Unit =
      if (persistStages) counts += name -> df.count()

    // bucketed mode: one bucketed write, then every doc_id gate joins
    // bucket-to-bucket — only the narrow id frames shuffle, and the
    // broadcast hint (an OOM at survivor-id scale) is dropped
    val corpus = bucketStore match {
      case Some(path) =>
        Bucketing.writeBucketed(docs, bucketTable, Seq("doc_id"),
          bucketCount, sortCols = Seq("doc_id"), path = Some(path))
        docs.sparkSession.table(bucketTable)
      case None => docs
    }
    def gate(ids: DataFrame): DataFrame =
      if (bucketStore.isEmpty) broadcast(ids) else ids
    count("input", corpus)

    // 1. semantic dedup: the loser set is vec_id-sized; the corpus is
    // gated by a doc_id anti-join, never shuffled by any dedup key
    val semLosers = Dedup.semDedupLosers(emb, embIdCol, embVecCol,
        centroidIds, semThreshold, checkpointDir)
      .select(col("vec_id").as("sem_loser"))
    val semKept = cached(corpus.join(gate(semLosers),
      col("doc_id") === col("sem_loser"), "left_anti"))
    count("sem_dedup", semKept)

    // 2. per-domain quality gate: quality + source in ONE projection
    // (qualityScore carryCols — the q107 single-scan shape); the ntile
    // runs on the NARROW (doc_id, source, quality) frame and only the
    // surviving ids come back
    val gateIds = Quantiles.exactNtile(
        TextAnalysis.qualityScore(semKept, "doc_id", "text",
            carryCols = Seq("source"))
          .select(col("doc_id"), col("source"), col("quality")),
        "source", Seq("quality", "doc_id"), qualityBuckets,
        checkpointDir = checkpointDir)
      .filter(col("bucket") === qualityBuckets)
      .select(col("doc_id").as("q_id"))
    val qualityKept = cached(semKept.join(gate(gateIds),
      col("doc_id") === col("q_id"), "left_semi"))
    count("quality_gate", qualityKept)

    // 3. DSIR importance resampling: LM trained on the SURVIVORS (the
    // stage's own corpus — target slice included by construction),
    // keep with probability exp(llr/T) decided by the salted id hash
    val scored = TextAnalysis.importanceScore(qualityKept, "doc_id", "text",
      targetFilter, checkpointDir)
    val dsirIds = Sampling.weightedHashSample(scored, "doc_id",
        round(exp(col("llr") / temperature), 6), salt = "dsir")
      .select(col("doc_id").as("d_id"))
    val dsirKept = cached(qualityKept.join(gate(dsirIds),
      col("doc_id") === col("d_id"), "left_semi"))
    count("dsir", dsirKept)

    // 4. epoch allocation over the final kept set's token counts —
    // dimension-sized output, integer-exact keep decisions
    val alloc = Sampling.epochAllocation(
      dsirKept.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words")),
      "doc_id", "source", "n_words", epochWeights, defaultWeight, budget,
      checkpointDir = checkpointDir)

    if (persistStages) {
      semKept.unpersist()
      qualityKept.unpersist()
      // dsirKept stays cached: its count materialized it and both the
      // caller's consumption AND the allocation read it
    }
    (dsirKept, counts.result(), alloc)
  }
}
