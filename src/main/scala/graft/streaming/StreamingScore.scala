package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frozen-LM scoring of a document stream — the ONLINE deployment of
  * the corpus-internal quality filters (q80 unigram, q103 DSIR): the
  * language model is trained IN BATCH over a reference corpus and
  * frozen; arriving documents are scored against it continuously.
  *
  * Streaming shape: the token explode is narrow; the LM lookup is a
  * stream-STATIC left equi-join (stateless — no stream-stream state,
  * no join watermark); the model totals ride as literals resolved at
  * query build ("loading the model"), not a cross join. Only the
  * per-document aggregation carries watermark-bounded state, emitted
  * in append mode when the event-time window closes. Unseen terms take
  * the add-one floor 1/(total + |V|) — scoring FOREIGN text needs
  * smoothing, unlike the self-scoring batch ops where every term is in
  * the counts.
  *
  * [[scoreDocs]] builds the identical plan on a batch frame (the
  * watermark is a no-op there), so batch ≡ streaming is a property of
  * ONE code path, asserted in StreamingSpec. The per-doc sum is the
  * ordered fold (q80 convention) — mode- and partitioning-stable.
  */
object StreamingScore {

  /** The frozen model: (term, cnt) unigram counts over a reference
    * corpus — one explode + one hash aggregate.
    */
  def unigramLm(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))

  /** Model totals (total token count, vocabulary size) — the one
    * dimension-sized driver-side step, done once when the model is
    * loaded, never per batch.
    */
  def lmTotals(lm: DataFrame): (Long, Long) = {
    val r = lm.agg(sum(col("cnt")), count(lit(1))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Score `docs` (streaming OR batch) under the frozen `lm`:
    * mean add-one-smoothed unigram log-probability per document,
    * aggregated per event-time window. Output: (doc_id, window_start,
    * n_words, avg_logprob).
    */
  def scoreDocs(docs: DataFrame, lm: DataFrame, total: Long, vocab: Long,
                idCol: String, tsCol: String, textCol: String,
                watermark: String = "10 seconds",
                windowLen: String = "10 seconds"): DataFrame = {
    val terms = docs.withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        explode(split(col(textCol), " ")).as("term"))
    terms.join(broadcast(lm), Seq("term"), "left")
      .select(col("doc_id"), col("ts"), col("term"),
        log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          lit(total + vocab).cast("double")).as("v"))
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        expr("""round(aggregate(array_sort(collect_list(named_struct('term', term, 'v', v))),
               |               cast(0.0 as double), (a, s) -> a + s.v) / count(1), 6)""".stripMargin)
          .as("avg_logprob"))
      .select(col("doc_id"), col("window.start").as("window_start"),
        col("n_words"), col("avg_logprob"))
  }
}
