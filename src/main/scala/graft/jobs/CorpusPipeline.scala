package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextAnalysis}

/** The training-data pipeline end-to-end: one composable flow over the
  * documents table chaining the engine's corpus operators —
  *
  *   1. deterministic sample      (Sampling.hashSample — reproducible cut)
  *   2. PII scrub                 (optional: TextAnalysis.redactCol in
  *                                 place — before dedup, so scrubbed
  *                                 variants of one text collapse)
  *   3. exact dedup               (Dedup.exactGroups keeps min doc per md5)
  *   4. near-dup dedup            (MinHash LSH candidates → drop the
  *                                 higher id of each colliding pair)
  *   5. embedding near-dup        (optional: Dedup.embeddingNearDup over
  *                                 the surviving docs' vectors — catches
  *                                 paraphrases text fingerprints miss)
  *   6. quality filter            (TextAnalysis.qualityScore >= threshold)
  *   7. repetition filter         (optional: drop docs whose
  *                                 dup_gram_frac exceeds the cap — the
  *                                 Gopher boilerplate gate; docs too
  *                                 short to have grams pass through)
  *   8. mixture weighting         (Sampling.mixture to target source mix)
  *
  * Every stage is a DataFrame → DataFrame transform; every membership
  * decision is hash-deterministic, so the same corpus comes out on
  * every run at any parallelism. Each stage is persisted before its
  * count so the per-stage metrics and downstream stages read the
  * materialized result instead of replaying the whole upstream lineage
  * per action (at 100 TB the persist becomes a checkpoint to durable
  * storage — same structure). Only the dimension-sized mixture count
  * map is collected to the driver.
  */
object CorpusPipeline {

  /** Returns the surviving corpus (persisted; caller unpersists when
    * done) plus per-stage row counts.
    */
  def run(docs: DataFrame, sampleFraction: Double = 1.0,
          qualityThreshold: Double = 0.4,
          mixture: Map[String, Double] = Map.empty,
          embeddings: Option[DataFrame] = None,
          cosineThreshold: Double = 0.9,
          maxBucketSize: Int = 10000,
          embIdCol: String = "vec_id",
          embVecCol: String = "embedding",
          redactPii: Boolean = false,
          maxDupGramFrac: Double = 1.0): (DataFrame, Seq[(String, Long)]) = {
    val counts = Seq.newBuilder[(String, Long)]
    val sampling = sampleFraction < 1.0
    // when nothing is sampled away the input IS the sampled stage —
    // don't pay a second full scan just to print the same number twice
    if (sampling) counts += "input" -> docs.count()

    val cut =
      if (sampling) Sampling.hashSample(docs, "doc_id", sampleFraction)
      else docs
    // scrub BEFORE dedup (narrow, in place): two docs differing only in
    // their PII collapse to one group afterwards
    val sampled =
      (if (redactPii)
         cut.withColumn("text", TextAnalysis.redactCol(col("text")))
       else cut).cache()
    val sampledN = sampled.count()
    if (!sampling) counts += "input" -> sampledN
    counts += "sampled" -> sampledN

    // exact dedup: drop every doc whose md5 group keeps a smaller id
    val exactKept = sampled.withColumn("text_hash", md5(col("text")))
      .join(Dedup.exactGroups(sampled, "doc_id", "text")
          .select(col("text_hash"), col("keep_id")),
        Seq("text_hash"), "left")
      .filter(col("keep_id").isNull || col("doc_id") === col("keep_id"))
      .drop("text_hash", "keep_id")
      .cache()
    counts += "exact_dedup" -> exactKept.count()

    // near-dup dedup: LSH band collisions; drop the higher id per pair.
    // Bands feed three consumers (pairs, the oversized audit, group
    // dedup of oversized buckets) — persist them once so the expensive
    // minhash pipeline runs a single time
    val bands = Dedup.minhashBands(exactKept, "doc_id", "text").persist()
    val pairLosers = Dedup.lshCandidates(bands, maxBucketSize)
      .select(col("doc_b").as("loser_id"))
    // buckets past the pair-generation cap are duplicate explosions —
    // dedup them AS GROUPS (keep min id per bucket) rather than
    // silently skipping them
    val ovLosers = Dedup.lshOversizedLosers(bands, maxBucketSize)
    val losers = pairLosers.union(ovLosers).distinct()
    val nearKept = exactKept.join(losers,
        col("doc_id") === col("loser_id"), "left_anti")
      .cache()
    counts += "near_dedup" -> nearKept.count()
    bands.unpersist()

    // optional vector-space pass: near-dup pairs among the SURVIVING
    // docs' embeddings (vec_id keyed like doc_id); drop the higher id
    val embKept = embeddings match {
      case Some(emb) =>
        val alive = emb.join(
          nearKept.select(col("doc_id").as("alive_id")),
          col(embIdCol) === col("alive_id"), "left_semi")
        val embLosers = Dedup.embeddingNearDup(
            alive, embIdCol, embVecCol, cosineThreshold)
          .select(col("vec_b").as("emb_loser")).distinct()
        val kept = nearKept.join(embLosers,
            col("doc_id") === col("emb_loser"), "left_anti")
          .cache()
        counts += "embedding_dedup" -> kept.count()
        kept
      case None => nearKept
    }

    val quality = TextAnalysis.qualityScore(embKept, "doc_id", "text")
      .filter(col("quality") >= qualityThreshold)
      .select(col("doc_id").as("q_id"))
    val qualityKept = embKept.join(quality,
        col("doc_id") === col("q_id"), "left_semi")
      .cache()
    counts += "quality" -> qualityKept.count()

    // repetition gate: anti-join on the VIOLATORS, so documents too
    // short to have any n-gram (no repetitionStats row) pass through
    val repKept =
      if (maxDupGramFrac >= 1.0) qualityKept
      else {
        val violators = TextAnalysis.repetitionStats(qualityKept, "doc_id", "text")
          .filter(col("dup_gram_frac") > maxDupGramFrac)
          .select(col("doc_id").as("rep_id"))
        val kept = qualityKept.join(violators,
            col("doc_id") === col("rep_id"), "left_anti")
          .cache()
        counts += "repetition" -> kept.count()
        kept
      }

    val mixed =
      (if (mixture.isEmpty) repKept
       else Sampling.mixture(repKept, "doc_id", "source", mixture)).cache()
    counts += "mixed" -> mixed.count()

    // when mixture is empty, `mixed` IS the last stage frame (cache()
    // returns this) — unpersisting it here would strip the returned
    // DataFrame's cache before the caller's first action
    sampled.unpersist()
    exactKept.unpersist()
    nearKept.unpersist()
    if (embKept ne nearKept) embKept.unpersist()
    if (qualityKept ne mixed) qualityKept.unpersist()
    if ((repKept ne qualityKept) && (repKept ne mixed)) repKept.unpersist()
    (mixed, counts.result())
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, counts) = run(graft.Tables.documents(spark, dir),
      sampleFraction = 0.8,
      mixture = Map("src0" -> 2.0, "src1" -> 1.0, "src2" -> 1.0),
      embeddings = Some(graft.Tables.embeddings(spark, dir)),
      cosineThreshold = 0.3)  // synthetic embeddings are near-orthogonal
    counts.foreach { case (stage, n) => println(s"$stage: $n") }
    spark.stop()
  }
}
