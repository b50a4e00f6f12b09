package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Bucketing, Pq, Similarity}

/** Pins the PQ serving store's contract (the r17 verdict's #2: the
  * one ANN piece still trained+encoded per query): codebooks and codes
  * are WRITTEN once, the coded serving reads answer row-for-row equal
  * to the inline train-per-call forms, ingest appends at fixed
  * codebooks without touching history, and tombstone reads equal a
  * compacted rebuild — the AnnStoreSpec lifecycle applied to the
  * compressed-domain table.
  */
class PqStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val m = Stores.PqM
  private val subDim = Stores.PqSubDim
  private val qids = (0L until 10L).toSeq

  private def emb = Tables.embeddings(spark, dir)
  private def coarse = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
  private def rawCbs = Pq.codebooks(emb, "vec_id", "embedding",
    m = m, subDim = subDim, initIds = Seq(0L, 1L, 2L, 3L), iters = 1,
    orderedMeans = true)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double, Long)].collect().toSet

  test("coded serving reads ≡ inline train-per-call forms (adc, probed-adc, residual ivf-pq)") {
    val cbs = rawCbs
    val codes = Pq.codeRows(emb, "vec_id", "embedding", cbs, coarse,
      m, subDim)
    // full-scan ADC
    val adcCoded = asSet(Pq.adcSearchCoded(codes, emb, "vec_id",
      "embedding", cbs, qids, k = 5, m, subDim))
    assert(adcCoded === asSet(Pq.adcSearch(emb, "vec_id", "embedding",
      cbs, qids, k = 5, m, subDim)) && adcCoded.nonEmpty)
    // probed (IVF) ADC — the q92 composition: the centroid_id join
    // must equal explicit ivfCandidates + candidate-scoped ADC
    val probed = asSet(Pq.adcSearchProbed(codes, emb, "vec_id",
      "embedding", coarse, cbs, qids, k = 5, nprobe = 2, m, subDim))
    assert(probed === asSet(Pq.adcSearch(emb, "vec_id", "embedding", cbs,
      qids, k = 5, m, subDim,
      candidates = Some(Similarity.ivfCandidates(emb, "vec_id",
        "embedding", coarse, qids, nprobe = 2)))) && probed.nonEmpty)
    // residual IVF-PQ
    val rcbs = Pq.codebooks(
      Pq.residuals(emb, "vec_id", "embedding", coarse), "vec_id", "rvec",
      m = m, subDim = subDim, initIds = Seq(8L, 9L, 10L, 11L), iters = 1,
      orderedMeans = true)
    val rcodes = Pq.residualCodeRows(emb, "vec_id", "embedding", rcbs,
      coarse, m, subDim)
    val ivfpq = asSet(Pq.ivfPqSearchCoded(rcodes, emb, "vec_id",
      "embedding", coarse, rcbs, qids, k = 5, nprobe = 2, m, subDim))
    assert(ivfpq === asSet(Pq.ivfPqSearch(emb, "vec_id", "embedding",
      coarse, rcbs, qids, k = 5, nprobe = 2, m, subDim)) && ivfpq.nonEmpty)
  }

  test("pqIngest: append leaves history's files untouched; post-ingest store ≡ full re-encode; bucket mismatch fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-pq-ingest-")
    val cbs = rawCbs
    val history = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    try {
      Bucketing.writeBucketed(
        Pq.codeRows(history, "vec_id", "embedding", cbs, coarse, m, subDim),
        "graft_pq_ingest", Seq("centroid_id"), buckets = 8,
        sortCols = Seq("centroid_id"),
        path = Some(base.resolve("pq").toString))
      def dataFiles() = {
        val walk = java.nio.file.Files.walk(base.resolve("pq"))
        try walk.filter(p => p.toString.endsWith(".parquet"))
          .map[(String, Long)](p =>
            (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toArray.toSeq
        finally walk.close()
      }
      val before = dataFiles()
      assert(before.nonEmpty)
      Pq.pqIngest(fresh, "vec_id", "embedding", cbs, coarse,
        table = "graft_pq_ingest", buckets = 8, m, subDim)
      val after = dataFiles()
      assert(after.toSet.intersect(before.toSet) === before.toSet,
        s"ingest rewrote history files:\nbefore=$before\nafter=$after")
      assert(after.size > before.size, "ingest added no files")
      // store rows after ingest == a one-shot encode of the full corpus
      // (same fixed codebooks — encoding is per-vector, so slices
      // commute with the union)
      val got = spark.table("graft_pq_ingest")
        .as[(Long, Long, Long, Long)].collect().toSet
      val oneShot = Pq.codeRows(emb, "vec_id", "embedding", cbs, coarse,
        m, subDim).as[(Long, Long, Long, Long)].collect().toSet
      assert(got === oneShot && got.nonEmpty)
      // and the served search off the ingested store equals the
      // inline form over the full corpus
      assert(asSet(Pq.adcSearchProbed(spark.table("graft_pq_ingest"), emb,
        "vec_id", "embedding", coarse, cbs, qids, 5, 2, m, subDim)) ===
        asSet(Pq.adcSearch(emb, "vec_id", "embedding", cbs, qids, 5, m,
          subDim, candidates = Some(Similarity.ivfCandidates(emb,
            "vec_id", "embedding", coarse, qids, nprobe = 2)))))
      val e = intercept[Exception] {
        Pq.pqIngest(fresh, "vec_id", "embedding", cbs, coarse,
          table = "graft_pq_ingest", buckets = 4, m, subDim)
      }
      assert(e.getMessage.toLowerCase.contains("bucket"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pq_ingest")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("tombstoned code reads ≡ compacted rebuild; deleted ids never neighbors, still query") {
    val cbs = rawCbs
    val codes = Pq.codeRows(emb, "vec_id", "embedding", cbs, coarse,
      m, subDim)
    val tomb = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    def search(c: org.apache.spark.sql.DataFrame) =
      asSet(Pq.adcSearchCoded(c, emb, "vec_id", "embedding", cbs, qids,
        k = 5, m, subDim))
    val viaTomb = search(Similarity.applyTombstones(codes, tomb, "vec_id"))
    // compaction = re-encode the surviving vectors at the SAME fixed
    // codebooks (encoding is per-vector: dropping rows commutes)
    val viaCompact = search(Pq.codeRows(
      emb.filter(col("vec_id") % 7 =!= 0), "vec_id", "embedding", cbs,
      coarse, m, subDim))
    assert(viaTomb === viaCompact && viaTomb.nonEmpty)
    assert(!viaTomb.exists(_._2 % 7 == 0))
    assert(viaTomb.exists(_._1 % 7 == 0))
  }
}
