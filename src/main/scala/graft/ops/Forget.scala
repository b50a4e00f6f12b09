package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade over the serving warehouse.
  *
  * A forget request (a bounded list of document ids — GDPR erasure,
  * takedown, opt-out) must be applied to EVERY derived artifact, not
  * just the corpus: postings, positional lists, norms, metadata,
  * facet lists, vector codes, and dup-cluster membership all carry
  * the document. Each family already has its delete mechanism
  * (content-addressed tombstones for the index/positional stores —
  * q212/q254; id-addressed anti-joins for the vector stores — q213;
  * plain row deletes for the id-keyed tables); what a deployment
  * additionally needs is the AUDIT: for a given forget set, how many
  * rows does each family shed — the record an erasure request is
  * answered with, and the pre-flight sizing for the tombstone write.
  *
  * Scale posture: the forget set is request-bounded (broadcast); each
  * family audit is ONE scan of its store with the set broadcast into
  * it and a two-value aggregate out — no shuffle wider than the final
  * single-row agg, no family touched twice, the corpus touched never.
  */
object Forget {

  /** One family's audit row: (family, rows_before, rows_removed,
    * rows_after), counting `weight` per store row (rows by default;
    * pass e.g. the tf column to count position entries). One
    * broadcast left join + one aggregate per family.
    */
  def familyAudit(family: String, store: DataFrame, keyCol: String,
                  forget: DataFrame,
                  weight: Column = lit(1L)): DataFrame = {
    val f = broadcast(forget.select(col("doc_id").as("_fid")).distinct())
    store.join(f, col(keyCol) === col("_fid"), "left")
      .agg(coalesce(sum(weight), lit(0L)).as("rows_before"),
        coalesce(sum(when(col("_fid").isNotNull, weight)), lit(0L))
          .as("rows_removed"))
      .select(lit(family).as("family"),
        col("rows_before").cast("long").as("rows_before"),
        col("rows_removed").cast("long").as("rows_removed"),
        (col("rows_before") - col("rows_removed")).cast("long")
          .as("rows_after"))
  }

  /** Generic id-addressed row erasure — the execution form of
    * [[familyAudit]] for every id-keyed family (norms, doc metadata,
    * facet lists, vector codes, chunk stored-fields): the store
    * anti-joined against the broadcast forget set. One broadcast hash
    * anti-join, store scanned once, no shuffle — the
    * [[TextAnalysis.positionalApplyTombstones]] shape generalized to
    * any key column.
    */
  def rowErase(store: DataFrame, keyCol: String,
               forget: DataFrame): DataFrame = {
    val f = broadcast(forget.select(col("doc_id").as("_fid")).distinct())
    store.join(f, col(keyCol) === col("_fid"), "left_anti")
  }

  /** Dup-cluster erasure with REP REASSIGNMENT — the one family where
    * dropping member rows is not enough: a forgotten document that was
    * its component's label (rep = the component's min doc_id) would
    * otherwise persist as every surviving member's group id (the
    * ADVICE-r18 finding the `dup_map_reps` audit surfaces). Execution:
    * drop forgotten members, relabel each surviving group by its new
    * min surviving doc_id, and drop groups that shrink below two
    * members (singletons are ABSENT from the store by contract — the
    * collapse read coalesces them to themselves).
    *
    * Contract note: reassignment keeps the ORIGINAL component
    * partition. A from-scratch rebuild over the surviving corpus could
    * additionally SPLIT a component whose only bridge document was
    * erased — the erasure guarantee (no forgotten id survives anywhere,
    * as member or label) holds either way, and the two agree whenever
    * no forgotten doc was a cut vertex (the q289/q291 oracles replay
    * this same reassignment).
    *
    * Shape: one broadcast anti-join + one membership-scale group-by +
    * one membership-scale hash join — never corpus scale.
    */
  def dupMapErase(dupMap: DataFrame, forget: DataFrame): DataFrame = {
    val surv = rowErase(dupMap, "doc_id", forget)
    val groups = surv.groupBy(col("rep"))
      .agg(min(col("doc_id")).as("_newRep"), count(lit(1)).as("_n"))
      .filter(col("_n") >= 2)
      .select(col("rep"), col("_newRep"))
    surv.join(groups, Seq("rep"))
      .select(col("doc_id"), col("_newRep").as("rep"))
  }

  /** Every family's post-forget frame — [[erase]]'s result. The index
    * families come back as SLICE frames (tombstones appended / deletes
    * applied, merge NOT yet folded) so reads keep their pushed-token
    * prefilters before the merge; the id-keyed families come back
    * row-erased.
    */
  case class Erased(index: DataFrame, positional: DataFrame,
                    chunks: DataFrame, norms: DataFrame,
                    docMeta: DataFrame, facets: DataFrame,
                    pqCodes: DataFrame, dupMap: DataFrame)

  /** The single-call right-to-be-forgotten CASCADE — one erasure
    * request applied to EVERY warehouse family through each family's
    * native delete mechanism (execution of what [[familyAudit]] sizes):
    *
    *   - exact index: content-addressed tombstone slices appended
    *     ([[TextAnalysis.indexTombstones]] — tf cancels to exactly 0
    *     at merge, the q212 contract);
    *   - chunk index: the same tombstone derivation over the shared
    *     guarded chunk projection ([[graft.Stores.chunkCids]] — one
    *     code path with the store build);
    *   - positional index: the id-addressed delete log applied
    *     ([[TextAnalysis.positionalApplyTombstones]] — position sets
    *     don't cancel arithmetically);
    *   - norms / doc metadata / facet lists / vector codes: plain
    *     row erasure ([[rowErase]]; vector codes erase by vec_id —
    *     the id spaces align by construction. The PQ CODEBOOKS stay:
    *     a trained model is not per-row data, retraining is a store
    *     rewrite — the erasure contract covers the codes);
    *   - dup-cluster map: member drop + rep reassignment
    *     ([[dupMapErase]]);
    *   - term dictionary / df statistics: DERIVED families — they
    *     re-derive from the erased index frames, so no separate
    *     delete exists to forget.
    *
    * `forgotten` is the request's (doc_id, text) rows — the content
    * tombstones need the text AS INGESTED (one pushed broadcast
    * semi-join of the doc store at the call site; request-bounded).
    * Everything here is LAZY: a read that serves one family executes
    * only that family's erasure (the other frames cost nothing), and
    * [[graft.jobs.ServingWarehouse.forgetApply]] writes the same
    * tombstone derivations through the live-table slice machinery.
    */
  /** `forgetIds`: the request's bare id list, when the caller already
    * holds it — the id-addressed families (positional deletes, row
    * erasure, dup map) then never touch the doc store; only the
    * content-tombstone families read `forgotten`'s text. Defaults to
    * deriving ids from `forgotten`.
    */
  def erase(index: DataFrame, positional: DataFrame, chunks: DataFrame,
            norms: DataFrame, docMeta: DataFrame, facets: DataFrame,
            pqCodes: DataFrame, dupMap: DataFrame,
            forgotten: DataFrame, tombSlice: Long,
            forgetIds: Option[DataFrame] = None): Erased = {
    val ids = forgetIds.getOrElse(forgotten.select(col("doc_id")))
    val tagged = forgotten.withColumn("slice", lit(tombSlice))
    Erased(
      index = index.unionByName(
        graft.ops.TextAnalysis.indexTombstones(tagged, "doc_id", "text",
          "slice")),
      positional =
        graft.ops.TextAnalysis.positionalApplyTombstones(positional, ids),
      chunks = chunks.unionByName(
        graft.ops.TextAnalysis.indexTombstones(
          graft.Stores.chunkCids(tagged).withColumn("slice",
            lit(tombSlice)),
          "cid", "chunk", "slice")),
      norms = rowErase(norms, "doc_id", ids),
      docMeta = rowErase(docMeta, "doc_id", ids),
      facets = rowErase(facets, "doc_id", ids),
      pqCodes = rowErase(pqCodes, "vec_id", ids),
      dupMap = dupMapErase(dupMap, ids))
  }

  /** Dictionary EXTINCTION audit: a term vanishes from the vocabulary
    * iff EVERY posting it has belongs to the forget set — the one
    * family where the removed-row count is not a per-row predicate
    * but a per-group all-quantifier (df == df-within-forget-set).
    * One pass over the posting frame, vocabulary-scale intermediate.
    */
  def vocabAudit(postings: DataFrame, forget: DataFrame): DataFrame = {
    val f = broadcast(forget.select(col("doc_id").as("_fid")).distinct())
    postings.join(f, col("doc_id") === col("_fid"), "left")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("_df"), count(col("_fid")).as("_dff"))
      .agg(count(lit(1)).as("rows_before"),
        count(when(col("_df") === col("_dff"), 1)).as("rows_removed"))
      .select(lit("vocab_terms").as("family"),
        col("rows_before").cast("long").as("rows_before"),
        col("rows_removed").cast("long").as("rows_removed"),
        (col("rows_before") - col("rows_removed")).cast("long")
          .as("rows_after"))
  }
}
