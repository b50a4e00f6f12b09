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
