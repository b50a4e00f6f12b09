package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frozen Naive Bayes classification of a document stream — the ONLINE
  * deployment of the q125/q126 classifier, completing the batch ≡
  * streaming story for the classifier family the way [[StreamingScore]]
  * did for LM scoring and [[StreamingGate]] for the quality gate.
  *
  * The model is trained IN BATCH ([[freeze]]) and shipped as one
  * term-keyed frame with a count column per class plus driver-held
  * dimension values (class totals, priors, |V| — the "load the model"
  * step, done once, never per batch). Streaming shape: narrow token
  * explode → stream-STATIC broadcast left join on term (stateless) →
  * per-class per-token log-likelihoods as literal arithmetic (an unseen
  * term's null count coalesces to 0, which IS the add-one floor
  * 1/(tot_c+|V|) — smoothing falls out of the same formula) → ONE
  * watermark-bounded aggregation per (event-time window, doc) with an
  * ordered fold per class → argmax as greatest-of-structs, score-then-
  * label, the exact tie-break of the batch scorer's max-of-struct.
  * A single stateful aggregate means clean append-mode emission — the
  * per-class sums ride the same grouped state, not a second agg.
  *
  * [[classifyDocs]] builds the identical plan on a batch frame (the
  * watermark is a no-op there), so batch ≡ streaming is a property of
  * ONE code path, asserted in StreamingSpec alongside agreement with
  * the batch scorer's predictions ([[graft.ops.TextAnalysis.nbClassify]]).
  */
object StreamingClassify {

  /** The frozen model: `terms` has one row per training-vocabulary term
    * with columns cnt_0..cnt_{K-1} (class-conditional counts, null when
    * the class never saw the term); `labels`/`totals`/`priors` are the
    * K-row class dimension held on the driver; `vocab` = |V|.
    */
  case class NbModel(terms: DataFrame, labels: Seq[String],
                     totals: Seq[Long], priors: Seq[Double], vocab: Long)

  /** Train in batch: one explode + one (label, term) hash aggregate,
    * pivoted to term rows (the pivot is over the K class labels — a
    * dimension-sized column expansion, not a shuffle per class); class
    * totals and priors are two dimension-sized driver collects.
    */
  def freeze(train: DataFrame, labelCol: String, textCol: String): NbModel = {
    val counts = train.select(col(labelCol).as("label"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("label"), col("term")).agg(count(lit(1)).as("cnt"))
    counts.persist()
    val labels = counts.select(col("label")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val totals = {
      val m = counts.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      labels.map(m)
    }
    val vocab = counts.select(col("term")).distinct().count()
    val priors = {
      val m = train.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = m.values.sum.toDouble
      labels.map(l => math.log(m(l) / n))
    }
    val terms = counts.groupBy(col("term")).pivot("label", labels)
      .agg(first(col("cnt")))
      .select(col("term") +: labels.zipWithIndex.map { case (l, i) =>
        col(s"`$l`").as(s"cnt_$i")
      }: _*)
    NbModel(terms, labels, totals, priors, vocab)
  }

  /** Classify `docs` (streaming OR batch) under the frozen model:
    * argmax over per-class log-posteriors, aggregated per event-time
    * window. Output: (doc_id, window_start, pred_label, score).
    */
  def classifyDocs(docs: DataFrame, model: NbModel, idCol: String,
                   tsCol: String, textCol: String,
                   watermark: String = "10 seconds",
                   windowLen: String = "10 seconds"): DataFrame = {
    val k = model.labels.size
    val terms = docs.withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val withV = terms.join(broadcast(model.terms), Seq("term"), "left")
      .select(Seq(col("doc_id"), col("ts"), col("term")) ++
        (0 until k).map { i =>
          log((coalesce(col(s"cnt_$i"), lit(0L)) + 1).cast("double") /
            lit(model.totals(i) + model.vocab).cast("double")).as(s"v_$i")
        }: _*)
    val folds = (0 until k).map { i =>
      expr(s"""aggregate(array_sort(collect_list(named_struct('term', term, 'v', v_$i))),
              |          cast(0.0 as double), (a, s) -> a + s.v)""".stripMargin)
        .as(s"s_$i")
    }
    val scores = (0 until k).map { i =>
      struct((lit(model.priors(i)) + col(s"s_$i")).as("score"),
        lit(model.labels(i)).as("label"))
    }
    withV.groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(folds.head, folds.tail: _*)
      .select(col("doc_id"), col("window.start").as("window_start"),
        (if (k == 1) scores.head else greatest(scores: _*)).as("best"))
      .select(col("doc_id"), col("window_start"),
        col("best.label").as("pred_label"),
        round(col("best.score"), 6).as("score"))
  }
}
