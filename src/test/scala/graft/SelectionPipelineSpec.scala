package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.SelectionPipeline

/** SelectionPipeline end-to-end (the q117 entry): determinism across
  * layouts, monotone survivor counts, the allocation invariants, the
  * counts-off contract of persistStages=false, and the 100 TB plan
  * property — every gate is an anti/semi join on a narrow id frame, so
  * the full-width corpus (rows still carrying `text`) never passes
  * through a shuffle Exchange. The selection-layer sibling of
  * MiningSpec's CorpusPipeline chain test + CorpusBucketingSpec's pin.
  */
class SelectionPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def runPipeline(docs: org.apache.spark.sql.DataFrame,
                          persist: Boolean = true,
                          bucketStore: Option[String] = None) =
    SelectionPipeline.run(docs, Tables.embeddings(spark, dir),
      centroidIds = (0L until 8L).toSeq, semThreshold = 0.3,
      targetFilter = col("source") === "src0", budget = 1000000L,
      epochWeights = Map("src0" -> 4L, "src1" -> 2L),
      persistStages = persist, bucketStore = bucketStore,
      bucketCount = 8)

  test("selection chain is layout-independent with monotone stage counts") {
    val docs = Tables.documents(spark, dir)
    val (kept1, counts1, alloc1) = runPipeline(docs)
    val (kept2, counts2, alloc2) = runPipeline(docs.repartition(7))
    try {
      assert(counts1.map(_._1) ===
        Seq("input", "sem_dedup", "quality_gate", "dsir"))
      assert(counts1 === counts2)                    // layout-independent
      val ns = counts1.map(_._2)
      assert(ns.head > 0)
      assert(ns.zip(ns.tail).forall { case (a, b) => b <= a },
        s"stage counts not monotone non-increasing: $counts1")
      val ids1 = kept1.select("doc_id").as[Long].collect().toSet
      val ids2 = kept2.select("doc_id").as[Long].collect().toSet
      assert(ids1 === ids2)
      assert(ids1.size === counts1.last._2)

      // allocation invariants: target = epochs·avail + remainder, the
      // remainder draw never exceeds the stage's survivors, and every
      // allocated stratum exists in the kept set
      val a = alloc1.collect()
      assert(a.nonEmpty)
      a.foreach { r =>
        val avail = r.getAs[Long]("avail_tokens")
        val target = r.getAs[Long]("target_tokens")
        val epochs = r.getAs[Long]("epochs")
        val rem = r.getAs[Long]("rem_tokens")
        assert(target === epochs * avail + rem)
        assert(r.getAs[Long]("rem_kept_tokens") <= avail)
      }
      val keptSources = kept1.select("source").distinct().as[String].collect().toSet
      assert(a.map(_.getAs[String]("stratum")).toSet.subsetOf(keptSources))
      assert(alloc2.collect().sortBy(_.getAs[String]("stratum")).toSeq ===
        a.sortBy(_.getAs[String]("stratum")).toSeq)
    } finally { kept1.unpersist(); kept2.unpersist() }
  }

  test("persistStages=false: same selection, no per-stage counts") {
    val docs = Tables.documents(spark, dir)
    val (keptP, countsP, _) = runPipeline(docs)
    val (keptU, countsU, _) = runPipeline(docs, persist = false)
    try {
      assert(countsU.isEmpty)                        // counts require the cache
      assert(keptU.select("doc_id").as[Long].collect().toSet ===
        keptP.select("doc_id").as[Long].collect().toSet)
      assert(countsP.nonEmpty)
    } finally { keptP.unpersist() }
  }

  test("no full-width corpus shuffle: gates are anti/semi joins on narrow id frames") {
    // AQE off so the executed plan is the plain inspectable tree;
    // persistStages=false so no InMemoryRelation hides the join chain
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (kept, _, _) = runPipeline(Tables.documents(spark, dir),
        persist = false)
      val plan = kept.queryExecution.executedPlan
      val fullWidthShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name == "text") => e
      }
      assert(fullWidthShuffles.isEmpty,
        s"full-width corpus rows passed through a shuffle:\n$plan")
      // the corpus-side joins are the two narrow gates (anti for the
      // sem-dedup losers, semi for the quality + dsir survivors)
      val p = plan.toString
      assert(p.contains("LeftAnti"), s"sem-dedup anti gate missing:\n$p")
      assert(p.contains("LeftSemi"), s"semi gates missing:\n$p")
    } finally { spark.conf.set("spark.sql.adaptive.enabled", aqe) }
  }

  test("bucketed gate mode: same selection, zero broadcast, zero full-width shuffle") {
    // The 100 TB form: survivor-id frames are O(corpus) rows, so the
    // default mode's forced broadcast would OOM — bucketed mode must
    // gate with NO BroadcastExchange anywhere and still never shuffle
    // a text-carrying row. Broadcast threshold -1 proves the plan
    // can't silently fall back to an auto-broadcast; AQE off for the
    // plain inspectable tree.
    val docs = Tables.documents(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft-selection-buckets-")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (keptB, _, allocB) = runPipeline(docs, persist = false,
        bucketStore = Some(base.resolve("corpus").toString))
      val plan = keptB.queryExecution.executedPlan
      // no GATE id frame (sem_loser / q_id / d_id — survivor-scale) is
      // broadcast; the one broadcast allowed to remain is exactNtile's
      // internal prefix-sum offset frame, which is (partitions ×
      // groups)-sized — bounded at any corpus scale
      val gateCols = Set("sem_loser", "q_id", "d_id")
      val gateBroadcasts = plan.collect {
        case e: BroadcastExchangeExec
            if e.output.exists(a => gateCols.contains(a.name)) => e
      }
      assert(gateBroadcasts.isEmpty,
        s"bucketed mode must not broadcast survivor-scale id frames:\n$plan")
      val fullWidthShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.output.exists(_.name == "text") => e
      }
      assert(fullWidthShuffles.isEmpty,
        s"full-width corpus rows passed through a shuffle:\n$plan")
      // the chain is really rooted at the bucketed table
      assert(plan.toString.contains("graft_selection_corpus"),
        s"kept chain does not read the bucketed store:\n$plan")

      // the mode changes the plan, never the selection or allocation
      val (keptD, _, allocD) = runPipeline(docs, persist = false)
      assert(keptB.select("doc_id").as[Long].collect().toSet ===
        keptD.select("doc_id").as[Long].collect().toSet)
      assert(allocB.collect().sortBy(_.getAs[String]("stratum")).toSeq ===
        allocD.collect().sortBy(_.getAs[String]("stratum")).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS graft_selection_corpus")
    }
  }
}
