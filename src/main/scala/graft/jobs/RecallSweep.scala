package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Pq, Similarity}

/** ANN configuration sweep — the measurement a real deployment runs
  * BEFORE picking its quantizer: recall@k of raw-vector IVF-PQ (q92's
  * layout) vs residual IVF-PQ (q98's) across codebook sizes and Lloyd
  * training rounds, against the brute-force exact top-k. The q108/q109
  * oracles pin ONE configuration's recall bit-exactly; this job maps
  * the surrounding surface so "residual should win" (Jégou et al.
  * 2011) is a measured claim at each capacity, not an assumption —
  * the round-12 de-confound (train both quantizers identically, THEN
  * compare) applied as a sweep.
  *
  * Usage: runMain graft.jobs.RecallSweep [sfDir] [k*...]
  * Prints one JSON line per (codebookSize, iters) with raw and
  * residual mean recall@5. Diagnostic main (StreamBench's class): no
  * oracle — the oracled single points are q108/q109.
  */
object RecallSweep {

  /** Mean recall@5 of `approx` (query_id, neighbor_id, rank<=5 rows)
    * vs the exact L2 top-5 (distance rounded like the Pq ops, id
    * tie-break; self-match included on both sides).
    */
  private def recallAt5(spark: SparkSession, emb: DataFrame,
                        queryIds: Seq[Long], approx: DataFrame): Double = {
    graft.functions.VectorExprs.ensureRegistered(spark)
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val exact = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        expr("round(sqrt(array_sqdiff(embedding, q_vec)), 6)").as("dist"))
      .groupBy(col("query_id"))
      .agg(expr("""slice(transform(array_sort(collect_list(named_struct(
                  |  'dist', dist, 'neighbor_id', neighbor_id))),
                  |  s -> s.neighbor_id), 1, 5)""".stripMargin).as("exact_top5"))
    // LEFT join from the exact side: a query whose shortlist came back
    // empty counts as recall 0, not as a dropped term — averaging only
    // covered queries would flatter exactly the configurations with
    // the worst coverage (ProbeSweep reports coverage explicitly; here
    // the uncovered-as-zero convention keeps one honest number)
    exact.join(approx.groupBy(col("query_id"))
        .agg(collect_set(col("neighbor_id")).as("got")),
        Seq("query_id"), "left")
      .select((coalesce(size(array_intersect(col("got"), col("exact_top5"))),
        lit(0)).cast("double") / 5).as("recall"))
      .agg(avg(col("recall"))).head().getDouble(0)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                else Seq(4, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir).cache()
    val queryIds = (0L until 10L).toSeq
    val coarse = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val (m, subDim, nprobe) = (8, 8, 2)
    for (kStar <- sizes; iters <- Seq(0, 1, 2)) {
      // raw: codebooks seed from any ids; residual: ids 8.. so the
      // seed residuals are nonzero (non-centroids) — both train the
      // SAME iters/orderedMeans (the de-confound rule)
      val rawCbs = Pq.codebooks(emb, "vec_id", "embedding", m, subDim,
        initIds = (0L until kStar.toLong), iters = iters, orderedMeans = true)
      val raw = Pq.adcSearch(emb, "vec_id", "embedding", rawCbs,
        queryIds, k = 5, m = m, subDim = subDim,
        candidates = Some(Similarity.ivfCandidates(emb, "vec_id", "embedding",
          coarse, queryIds, nprobe)))
      val resCbs = Pq.codebooks(
        Pq.residuals(emb, "vec_id", "embedding", coarse), "vec_id", "rvec",
        m, subDim, initIds = (8L until (8 + kStar).toLong), iters = iters,
        orderedMeans = true)
      val res = Pq.ivfPqSearch(emb, "vec_id", "embedding", coarse, resCbs,
        queryIds, k = 5, nprobe = nprobe, m = m, subDim = subDim)
      val rawR = recallAt5(spark, emb, queryIds, raw)
      val resR = recallAt5(spark, emb, queryIds, res)
      println(s"""{"metric":"recall_at_5","codebook":$kStar,"iters":$iters,""" +
        s""""raw":${"%.3f".format(rawR)},"residual":${"%.3f".format(resR)},""" +
        s""""nprobe":$nprobe,"sf":"$dir"}""")
    }
    spark.stop()
  }
}
