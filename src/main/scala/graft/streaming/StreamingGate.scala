package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Quantiles, TextAnalysis}

/** Per-domain quality gate for a document STREAM — the online
  * deployment of the batch adaptive gate (q107, the FineWeb-style
  * per-dump threshold): quartile cut points are computed IN BATCH over
  * a calibration corpus and frozen; arriving documents are scored with
  * the same per-row quality projection and kept iff they clear their
  * own domain's frozen cut.
  *
  * Division of labor mirrors [[StreamingScore]] (frozen LM → live
  * scorer): the expensive, corpus-wide part — grouped exact quantiles,
  * a shuffle + prefix-sum job — runs offline where it belongs; the
  * online path is STATELESS (per-row projection + stream-static
  * broadcast equi-join on the domain + filter), so it needs no
  * watermark, no state store, and emits in append mode with per-batch
  * latency. Recalibration is "swap the cuts frame and restart", the
  * same operational contract as swapping StreamingScore's model.
  *
  * [[gateDocs]] builds the identical plan on a batch frame, so
  * batch ≡ streaming is a property of ONE code path (StreamingSpec),
  * the StreamingScore convention.
  *
  * Reference semantics: the batch gate (SparkEntry q107) keeps each
  * source's top quality quartile with (quality, doc_id) ordering;
  * the frozen form necessarily thresholds on the quality VALUE alone
  * (a future document's id has no rank among the calibration ids), so
  * calibration-boundary ties that q107's id tie-break splits are all
  * kept here — the documented, deterministic difference between the
  * adaptive and frozen gates.
  */
object StreamingGate {

  /** Freeze the per-domain cut points: for each `domainCol` value in
    * the calibration corpus, the smallest quality score inside its top
    * quartile (`buckets` = 4 → keep-fraction 1/4, same knob as q107).
    * Grouped exact ntile rides the PrefixSum core — range partition +
    * distributed offsets, no low-cardinality Window sort. Output:
    * (domain, q_cut) — dimension-sized (one row per domain), the
    * broadcast side of every subsequent gate.
    */
  def freezeCutPoints(corpus: DataFrame, idCol: String, textCol: String,
                      domainCol: String, buckets: Int = 4): DataFrame = {
    val scored = TextAnalysis.qualityScore(corpus, idCol, textCol,
        carryCols = Seq(domainCol))
      .select(col("doc_id"), col(domainCol), col("quality"))
    Quantiles.exactNtile(scored, domainCol, Seq("quality", "doc_id"),
        buckets = buckets)
      .filter(col("bucket") === buckets)
      .groupBy(col(domainCol).as("domain"))
      .agg(min(col("quality")).as("q_cut"))
  }

  /** Gate `docs` (streaming OR batch) against frozen `cuts`
    * ((domain, q_cut), from [[freezeCutPoints]]): score each document
    * with the shared per-row quality projection and keep it iff
    * quality ≥ its domain's cut. Documents from a domain ABSENT from
    * the calibration corpus have no threshold yet; `keepUnknown`
    * decides their fate (default false — quarantine-new-dumps-until-
    * calibrated, the conservative production posture).
    *
    * Stateless end to end: the only join is stream-static against the
    * dimension-sized cuts frame (broadcast — no shuffle, no state).
    * Output: (doc_id, domain, quality), survivors only.
    */
  def gateDocs(docs: DataFrame, cuts: DataFrame,
               idCol: String, textCol: String, domainCol: String,
               keepUnknown: Boolean = false): DataFrame =
    TextAnalysis.qualityScore(docs, idCol, textCol,
        carryCols = Seq(domainCol))
      .select(col("doc_id"), col(domainCol).as("domain"), col("quality"))
      .join(broadcast(cuts.select(col("domain"), col("q_cut"))),
        Seq("domain"), "left")
      .filter(
        if (keepUnknown) col("q_cut").isNull || col("quality") >= col("q_cut")
        else col("q_cut").isNotNull && col("quality") >= col("q_cut"))
      .select(col("doc_id"), col("domain"), col("quality"))
}
