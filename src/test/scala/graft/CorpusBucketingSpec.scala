package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.CorpusPipeline

/** Pins the 100 TB property of CorpusPipeline's bucketed mode: the
  * sampled corpus is written ONCE bucketed by doc_id, and every
  * downstream gate (exact-dedup anti-join, LSH anti-join, quality
  * semi-join, repetition anti-join) reads bucket-partitioned data —
  * the FULL-WIDTH corpus (rows carrying `text`) never passes through a
  * shuffle Exchange; only narrow derived id/hash frames do.
  */
class CorpusBucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed pipeline: no full-width corpus shuffle; results match the plain mode") {
    val docs = Tables.documents(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-corpus-buckets-")
    // broadcast off exposes the shuffle the bucketing must eliminate;
    // AQE off so the executed plan is the plain inspectable tree
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (mixed, countsB) = CorpusPipeline.run(docs,
        sampleFraction = 0.8, maxDupGramFrac = 0.2,
        bucketStore = Some(base.resolve("corpus").toString),
        bucketCount = 8, persistStages = false)
      val gotIds = mixed.select("doc_id").as[Long].collect().toSet
      assert(gotIds.nonEmpty)

      val plan = mixed.queryExecution.executedPlan
      // every gate is an anti/semi join preserving the bucketed left
      // side: no Exchange in the whole chain moves rows that still
      // carry the text column
      val fullWidthShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name == "text") => e
      }
      assert(fullWidthShuffles.isEmpty,
        s"full-width corpus rows passed through a shuffle:\n$plan")
      // the chain is really rooted at the bucketed table, not a re-read
      // of the raw parquet
      assert(plan.toString.contains("graft_corpus_sampled"),
        s"kept chain does not read the bucketed store:\n$plan")

      // same survivors and per-stage counts as the plain (unbucketed,
      // cached) mode
      val (plain, countsP) = CorpusPipeline.run(docs,
        sampleFraction = 0.8, maxDupGramFrac = 0.2)
      val wantIds = plain.select("doc_id").as[Long].collect().toSet
      plain.unpersist()
      assert(gotIds === wantIds)
      assert(countsB === countsP)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS graft_corpus_sampled")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("q121 hand-off between the pipeline halves is the doc_id-bucketed corpus store (SelectionPipeline's zero-Exchange gate layout)") {
    // run the flagship full-stack query, then inspect the hand-off
    // artifact it materialized: the clean corpus must land as a
    // doc_id-bucketed table (the store-shaped hand-off a 100 TB
    // deployment persists between the clean and select jobs), not a
    // session-local checkpoint — the selection gates then read
    // bucket-partitioned data (that layout's zero-Exchange property
    // is pinned by SelectionPipelineSpec's bucketed-mode test)
    try {
      val res = SparkEntry.queries("q121_full_stack")(spark, dir)
      assert(res.filter($"kind" === "kept").count() > 0)
      val handoff = spark.sessionState.catalog
        .listTables("default", "graft_fullstack_corpus_*")
      assert(handoff.nonEmpty, "q121 did not materialize its hand-off table")
      val meta = spark.sessionState.catalog.getTableMetadata(handoff.head)
      val bs = meta.bucketSpec
      assert(bs.exists(b => b.bucketColumnNames == Seq("doc_id")
          && b.numBuckets == 8),
        s"hand-off table is not doc_id-bucketed: $bs")
    } finally {
      spark.sessionState.catalog
        .listTables("default", "graft_fullstack_corpus_*")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.table}"))
      spark.catalog.clearCache()
    }
  }
}
