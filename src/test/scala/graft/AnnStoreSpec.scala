package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.ArrayType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Pins the 100 TB property of the bucketed IVF store
  * (Similarity.writeIvfBucketed / ivfSearchBucketed): vectors are
  * written ONCE bucketed by centroid_id, and the probe join reads them
  * bucket-partitioned — no vector-carrying row ever passes a shuffle
  * Exchange; only narrow (query, neighbor, score) rows move into the
  * top-k rank. The vector sibling of CorpusBucketingSpec.
  */
class AnnStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed IVF store: no vector-carrying shuffle; results equal ivfSearch") {
    val emb = Tables.embeddings(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-ann-store-")
    val centroidIds = (0L until 8L).toSeq
    val centroids = emb.filter(col("vec_id").isin(centroidIds: _*))
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    // broadcast off exposes the shuffle the bucketing must eliminate
    // (the probe side broadcasts EXPLICITLY); AQE off for a plain tree
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Similarity.writeIvfBucketed(emb, "vec_id", "embedding", centroids,
        table = "graft_ivf_store", buckets = 8,
        path = Some(base.resolve("ivf").toString))
      val got = Similarity.ivfSearchBucketed(spark.table("graft_ivf_store"),
        emb, "vec_id", "embedding", centroids,
        queryIds = (0L until 10L).toSeq, k = 5, nprobe = 2)

      val plan = got.queryExecution.executedPlan
      val vectorShuffles = plan.collect {
        case e: ShuffleExchangeExec
          if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
      }
      assert(vectorShuffles.isEmpty,
        s"vector-carrying rows passed through a shuffle:\n$plan")
      assert(plan.toString.contains("graft_ivf_store"),
        s"search does not read the bucketed store:\n$plan")

      // row-for-row identical to the unbucketed ivfSearch
      val want = Similarity.ivfSearch(emb, "vec_id", "embedding",
          centroidIds, queryIds = (0L until 10L).toSeq, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      val gotRows = got.as[(Long, Long, Double, Long)].collect().toSet
      assert(gotRows === want)
      assert(gotRows.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS graft_ivf_store")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("ivfIngest: append leaves history's files untouched; post-ingest search ≡ full rebuild") {
    val emb = Tables.embeddings(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-ann-ingest-")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val history = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
    try {
      Similarity.writeIvfBucketed(history, "vec_id", "embedding", centroids,
        table = "graft_ivf_ingest", buckets = 8,
        path = Some(base.resolve("ivf").toString))
      // snapshot history's data files BEFORE the ingest
      def dataFiles() = {
        val walk = java.nio.file.Files.walk(base.resolve("ivf"))
        try walk
          .filter(p => p.toString.endsWith(".parquet"))
          .map[(String, Long)](p =>
            (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toArray.toSeq
        finally walk.close() // Files.walk holds directory handles open
      }
      val before = dataFiles()
      assert(before.nonEmpty)
      Similarity.ivfIngest(fresh, "vec_id", "embedding", centroids,
        table = "graft_ivf_ingest", buckets = 8)
      val after = dataFiles()
      // history is never rewritten: every pre-ingest file survives
      // byte-untouched (same path, same mtime); the append only ADDS
      assert(after.toSet.intersect(before.toSet) === before.toSet,
        s"ingest rewrote history files:\nbefore=$before\nafter=$after")
      assert(after.size > before.size, "ingest added no files")
      // the ingested store answers exactly like a one-shot full rebuild
      Similarity.writeIvfBucketed(emb, "vec_id", "embedding", centroids,
        table = "graft_ivf_rebuilt", buckets = 8,
        path = Some(base.resolve("rebuilt").toString))
      def search(t: String) = Similarity.ivfSearchBucketed(spark.table(t),
          emb, "vec_id", "embedding", centroids,
          queryIds = (0L until 10L).toSeq, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      val ingested = search("graft_ivf_ingest")
      assert(ingested === search("graft_ivf_rebuilt"))
      assert(ingested.nonEmpty)
      // and the store rows themselves are the full corpus's assignment
      val storeRows = spark.table("graft_ivf_ingest")
        .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
      val oneShot = Similarity.ivfStoreRows(emb, "vec_id", "embedding",
          centroids)
        .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
      assert(storeRows === oneShot)
      // a mismatched bucket count must fail loudly, not corrupt layout
      val e = intercept[Exception] {
        Similarity.ivfIngest(fresh, "vec_id", "embedding", centroids,
          table = "graft_ivf_ingest", buckets = 4)
      }
      assert(e.getMessage.toLowerCase.contains("bucket"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_ingest")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_rebuilt")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("streaming ivfIngest: per-batch foreachBatch ingest ≡ one-shot batch ingest; files append-only across batches") {
    // the serving corpus grows from a STREAM in production (the r14
    // verdict's third item): ivfIngest inside foreachBatch is the SAME
    // code path as batch ingest — ivfStoreRows assigns each arrival at
    // the store's fixed centroids — so per-batch ingest must land the
    // exact one-shot store, and each batch must only ADD bucket files
    // (the novelty-gate posture: history never re-read or rewritten)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.embeddings(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-ann-stream-")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val history = emb.filter(col("vec_id") % 5 =!= 0)
    val fresh = emb.filter(col("vec_id") % 5 === 0)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    try {
      Similarity.writeIvfBucketed(history, "vec_id", "embedding", centroids,
        table = "graft_ivf_stream", buckets = 8,
        path = Some(base.resolve("ivf").toString))
      def dataFiles() = {
        val walk = java.nio.file.Files.walk(base.resolve("ivf"))
        try walk
          .filter(p => p.toString.endsWith(".parquet"))
          .map[(String, Long)](p =>
            (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toArray.toSeq
        finally walk.close()
      }
      val snapshots = scala.collection.mutable.ListBuffer(dataFiles())
      val input = MemoryStream[(Long, Array[Float])]
      val q = input.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          Similarity.ivfIngest(batch, "vec_id", "embedding", centroids,
            table = "graft_ivf_stream", buckets = 8)
          snapshots += dataFiles(): Unit
        }.start()
      input.addData(fresh.take(5): _*)
      q.processAllAvailable()
      input.addData(fresh.drop(5): _*)
      q.processAllAvailable()
      q.stop()
      // append-only across EVERY batch: each snapshot's files survive
      // the next batch byte-untouched (same path, same mtime), and
      // each non-empty batch only adds
      assert(snapshots.size === 3)
      for ((before, after) <- snapshots.toList.zip(snapshots.toList.tail)) {
        assert(after.toSet.intersect(before.toSet) === before.toSet,
          s"a micro-batch rewrote history files:\nbefore=$before\nafter=$after")
        assert(after.size > before.size, "a micro-batch added no files")
      }
      // the streamed store IS the one-shot batch store: same rows,
      // same assignment (ivfStoreRows is the single shared body)
      val streamed = spark.table("graft_ivf_stream")
        .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
      val oneShot = Similarity.ivfStoreRows(emb, "vec_id", "embedding",
          centroids)
        .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
      assert(streamed === oneShot)
      // and serves exactly like a full rebuild at the same centroids
      Similarity.writeIvfBucketed(emb, "vec_id", "embedding", centroids,
        table = "graft_ivf_stream_rebuilt", buckets = 8,
        path = Some(base.resolve("rebuilt").toString))
      def search(t: String) = Similarity.ivfSearchBucketed(spark.table(t),
          emb, "vec_id", "embedding", centroids,
          queryIds = (0L until 10L).toSeq, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      val got = search("graft_ivf_stream")
      assert(got === search("graft_ivf_stream_rebuilt"))
      assert(got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_stream")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_stream_rebuilt")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("applyTombstones: delete read ≡ compacted rebuild; deleted ids never neighbors, still query") {
    val emb = Tables.embeddings(spark, dir)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val store = Similarity.ivfStoreRows(emb, "vec_id", "embedding",
      centroids)
    val tomb = emb.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    def search(st: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSearchBucketed(st, emb, "vec_id", "embedding",
          centroids, queryIds = (0L until 10L).toSeq, k = 5, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
    val viaTomb = search(Similarity.applyTombstones(store, tomb, "vec_id"))
    val viaCompact = search(Similarity.ivfStoreRows(
      emb.filter(col("vec_id") % 7 =!= 0), "vec_id", "embedding",
      centroids))
    assert(viaTomb === viaCompact && viaTomb.nonEmpty)
    // no deleted id ever surfaces as a neighbor…
    assert(!viaTomb.exists(_._2 % 7 == 0))
    // …but deleted ids still ASK (0 and 7 are in the query set)
    assert(viaTomb.exists(_._1 % 7 == 0))
  }

  test("zero-norm vectors: ivfSearch and the bucketed store exclude them identically (ADVICE r9)") {
    // the bucketed store drops zero-norm vectors at write; ivfSearch's
    // scoring tail drops them via the normedVectors guard — a corpus
    // CONTAINING a zero vector must give row-for-row equal results from
    // both paths, with the zero vector absent (cosine undefined: 0/0 =
    // NaN would sort above every real score under desc ordering)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 20L).map { i =>
      val v: Seq[Float] =
        if (i == 13L) Seq.fill(4)(0.0f)
        else Seq.fill(4)(rnd.nextFloat() - 0.5f)
      (i, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val centroids = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_vec"))
    val base = java.nio.file.Files.createTempDirectory("graft-ann-zn-")
    try {
      Similarity.writeIvfBucketed(emb, "vec_id", "embedding", centroids,
        table = "graft_ivf_store_zn", buckets = 2,
        path = Some(base.resolve("ivf").toString))
      val plain = Similarity.ivfSearch(emb, "vec_id", "embedding",
          centroidIds = Seq(0L, 1L), queryIds = Seq(0L, 1L, 2L, 13L),
          k = 3, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      val bucketed = Similarity.ivfSearchBucketed(
          spark.table("graft_ivf_store_zn"), emb, "vec_id", "embedding",
          centroids, queryIds = Seq(0L, 1L, 2L, 13L), k = 3, nprobe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(plain === bucketed)
      assert(plain.nonEmpty)
      assert(!plain.exists(_._2 == 13L), "zero-norm vector surfaced as a neighbor")
      assert(!plain.exists(r => r._1 == 13L), "zero-norm query should be dropped")
      assert(plain.forall(r => !r._3.isNaN))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ivf_store_zn")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }
}
