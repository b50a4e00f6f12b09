package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Graph, Profile, TextAnalysis}

/** Compaction EXECUTION ([[Stores.compact]]) — the action half of the
  * q261 maintenance read: the plan's bins rewrite into single merged
  * slices, reads stay identical, the datasheet reflects the new
  * generations, and a follow-up plan finds no multi-slice bin left.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b a"), (2L, "b a b c"), (3L, "c a b"), (4L, "a b"),
    (5L, "b c b c a b"), (6L, "c c a"), (7L, "a a b c"),
    (8L, "b a")).toDF("doc_id", "text")

  // the q261 output shape (gen_lo/gen_hi) IS Stores.compact's input
  private def planFor(slices: org.apache.spark.sql.DataFrame,
                      keys: Seq[String], w: String, target: Long) =
    Profile.compactionPlan(
      Profile.sliceDatasheet(slices, "slice", keys, w)
        .select(lit("t").as("store"), $"slice", $"n_rows"),
      "store", "slice", "n_rows", targetBytes = target)
      .select($"bin", $"n_files", $"id_lo".as("gen_lo"),
        $"id_hi".as("gen_hi"))

  test("index-family compact: reads identical, slice count = bin count, follow-up plan finds no multi-slice bin") {
    val t = "graft_cmp_idx"
    try {
      // 8 generations (one per doc) — small slices a nightly job wants
      // folded toward ~6-posting-row output generations
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      val before = TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet
      val nBefore = spark.table(t).select($"slice").distinct().count()
      val plan = planFor(spark.table(t), Seq("token", "doc_id"), "tf",
        target = 6L)
      val nBins = plan.count()
      assert(nBins < nBefore) // the plan actually folds something
      Stores.compact(spark, t, plan, TextAnalysis.indexCompact,
        Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      // reads identical (compaction commutes with the merge)
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === before)
      // slice count dropped to exactly the plan's bin count
      assert(spark.table(t).select($"slice").distinct().count() === nBins)
      // the datasheet reflects the new generations and a follow-up
      // plan schedules no further work (every bin single-slice)
      val replan = planFor(spark.table(t), Seq("token", "doc_id"), "tf",
        target = 6L)
      assert(replan.agg(max($"n_files")).as[Long].head() === 1L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("positional-family compact folds the delete log away: compacted store without the log ≡ pre-compaction store with it") {
    val t = "graft_cmp_pidx"
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.positionalSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      val deletes = Seq(3L, 6L).toDF("doc_id")
      val expect = TextAnalysis.positionalMergeSlices(
          TextAnalysis.positionalApplyTombstones(spark.table(t), deletes))
        .as[(String, Long, Long, Seq[Int])].collect().toSet
      val plan = planFor(spark.table(t), Seq("token", "doc_id"), "tf",
        target = 6L)
      // the compact function folds the survivors only — the q213/q215
      // contract: a rewrite without the deleted docs serves the same
      // rows, and the log is no longer needed for the rewritten range
      Stores.compact(spark, t, plan,
        (sl, ns) => TextAnalysis.positionalCompact(
          TextAnalysis.positionalApplyTombstones(sl, deletes), ns),
        Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      assert(TextAnalysis.positionalMergeSlices(spark.table(t))
        .as[(String, Long, Long, Seq[Int])].collect().toSet === expect)
      assert(spark.table(t).filter($"doc_id".isin(3L, 6L)).isEmpty)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("compact rewrites an EXTERNAL table AT ITS OWN location — no silent migration into the warehouse dir") {
    val t = "graft_cmp_ext"
    val base = java.nio.file.Files.createTempDirectory("graft-cmp-ext-")
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4, path = Some(base.resolve("idx").toString))
      val before = TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet
      Stores.compact(spark, t,
        planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L),
        TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      assert(meta.tableType ===
        org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL,
        s"compaction silently converted the table to ${meta.tableType}")
      assert(meta.location.toString.contains(base.getFileName.toString),
        s"compaction migrated the store to ${meta.location}")
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === before)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("compact records the folded generation ids in the _wm watermark sidecar (exact ids, not a range)") {
    val t = "graft_cmp_wm"
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      assert(Stores.foldedSlices(spark, t) === Set.empty[Long])
      Stores.compact(spark, t,
        planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L),
        TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      // every pre-compaction generation id is recorded — the ingest
      // replay guard's source of truth after the rewrite re-tags them
      assert(Stores.foldedSlices(spark, t) === (1L to 8L).toSet)
      // a second compaction appends the (new) folded ids on top
      spark.catalog.refreshTable(t)
      val gen2 = spark.table(t).select($"slice").distinct()
        .as[Long].collect().toSet
      Stores.compact(spark, t,
        planFor(spark.table(t), Seq("token", "doc_id"), "tf", 1000000L),
        TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      assert(Stores.foldedSlices(spark, t) === (1L to 8L).toSet ++ gen2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("compact crash BEFORE the swap: target intact, _compacting survives, a re-run converges") {
    val t = "graft_cmp_crash1"
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      val before = TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet
      val plan = planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L)
      val nBins = plan.count()
      Stores.compactSwapHook = _ =>
        throw new RuntimeException("injected: crash before swap")
      val ex = intercept[IllegalStateException] {
        Stores.compact(spark, t, plan, TextAnalysis.indexCompact,
          Seq("token"), buckets = 4)
      }
      Stores.compactSwapHook = _ => ()
      assert(ex.getMessage.contains(s"${t}_compacting"),
        "the raise must point at the surviving sibling")
      // the OLD store is fully intact (original generations, same reads)
      spark.catalog.refreshTable(t)
      assert(spark.table(t).select($"slice").distinct().count() === 8L)
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === before)
      // the sibling holds the full post-compaction row set
      assert(spark.catalog.tableExists(s"${t}_compacting"))
      // a plain RE-RUN converges: same plan recomputes from the intact
      // target, overwrites the stale sibling, and completes the swap
      Stores.compact(spark, t,
        planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L),
        TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === before)
      assert(spark.table(t).select($"slice").distinct().count() === nBins)
      assert(!spark.catalog.tableExists(s"${t}_compacting"),
        "no orphan _compacting table may stay registered")
    } finally {
      Stores.compactSwapHook = _ => ()
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("compact crash MID-swap (target already dropped): _compacting is the only copy — kept, named in the raise, and recoverCompacting restores") {
    val t = "graft_cmp_crash2"
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      val before = TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet
      val plan = planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L)
      val nBins = plan.count()
      // simulate saveAsTable-overwrite dying AFTER its drop step: the
      // target is gone and the sibling is the ONLY surviving copy
      Stores.compactSwapHook = sp => {
        sp.sql(s"DROP TABLE $t")
        throw new RuntimeException("injected: crash mid-swap")
      }
      val ex = intercept[IllegalStateException] {
        Stores.compact(spark, t, plan, TextAnalysis.indexCompact,
          Seq("token"), buckets = 4)
      }
      Stores.compactSwapHook = _ => ()
      assert(ex.getMessage.contains(s"${t}_compacting")
        && ex.getMessage.contains("recoverCompacting"))
      // the unconditional-drop bug would have deleted this (ADVICE r19)
      assert(spark.catalog.tableExists(s"${t}_compacting"),
        "the only surviving copy was dropped — data loss")
      Stores.recoverCompacting(spark, t, Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === before)
      assert(spark.table(t).select($"slice").distinct().count() === nBins)
      assert(!spark.catalog.tableExists(s"${t}_compacting"))
      // the watermark was recorded BEFORE the swap, so the folded ids
      // stayed replay-guarded through the whole failure window
      assert(Stores.foldedSlices(spark, t) === (1L to 8L).toSet)
    } finally {
      Stores.compactSwapHook = _ => ()
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("compact aborts when a writer lands a NEW generation during the swap window — nothing lost, re-run converges") {
    val t = "graft_cmp_race"
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(
          corpus.withColumn("slice", $"doc_id"), "doc_id", "text",
          "slice"),
        t, buckets = 4)
      val lateDoc = Seq((99L, "b c a")).toDF("doc_id", "text")
        .withColumn("slice", lit(99L))
      // a live writer races the swap: its batch lands after the
      // write-aside scan — the blind overwrite would discard it with
      // nothing ever replaying it (the writer's offset is committed)
      Stores.compactPostAsideHook = sp =>
        graft.ops.Bucketing.appendBucketed(
          TextAnalysis.indexSlices(lateDoc, "doc_id", "text", "slice"),
          t, Seq("token"), buckets = 4, sortCols = Seq("token"))
      val ex = intercept[IllegalStateException] {
        Stores.compact(spark, t,
          planFor(spark.table(t), Seq("token", "doc_id"), "tf", 6L),
          TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      }
      Stores.compactPostAsideHook = _ => ()
      assert(ex.getMessage.contains("99")
        && ex.getMessage.contains("landed"))
      // nothing was lost or changed: all 9 generations live, the
      // stale sibling is gone, and no folded id was recorded (the
      // abort happened before the watermark write)
      spark.catalog.refreshTable(t)
      assert(spark.table(t).select($"slice").distinct().count() === 9L)
      assert(!spark.catalog.tableExists(s"${t}_compacting"))
      assert(Stores.foldedSlices(spark, t) === Set.empty[Long])
      val expect = TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet
      // a plain re-run re-plans over the grown table and converges,
      // folding the racing batch too
      Stores.compact(spark, t,
        planFor(spark.table(t), Seq("token", "doc_id"), "tf", 1000000L),
        TextAnalysis.indexCompact, Seq("token"), buckets = 4)
      spark.catalog.refreshTable(t)
      assert(TextAnalysis.indexMergeSlices(spark.table(t))
        .as[(String, Long, Long)].collect().toSet === expect)
      assert(spark.table(t).select($"slice").distinct().count() === 1L)
      assert(Stores.foldedSlices(spark, t) === ((1L to 8L).toSet + 99L))
    } finally {
      Stores.compactPostAsideHook = _ => ()
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_compacting")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("edge-family compact under a partial plan: unplanned slices ride along unchanged") {
    val t = "graft_cmp_edges"
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (1L, 2L), (3L, 1L), (2L, 3L),
        (1L, 3L)).zipWithIndex.map { case ((a, b), i) =>
        (a, b, (i % 4).toLong) }
      graft.ops.Bucketing.writeBucketed(
        Graph.edgeSlices(pairs.toDF("src", "dst", "slice"),
          "src", "dst", "slice"),
        t, Seq("src"), buckets = 4, sortCols = Seq("src"))
      val before = Graph.edgeMerge(spark.table(t))
        .as[(Long, Long, Long)].collect().toSet
      // partial plan: fold generations 0..2 only; slice 3 untouched
      val plan = Seq((0L, 0L, 2L)).toDF("bin", "gen_lo", "gen_hi")
      Stores.compact(spark, t, plan, Graph.edgeCompact,
        Seq("src"), buckets = 4)
      spark.catalog.refreshTable(t)
      assert(Graph.edgeMerge(spark.table(t))
        .as[(Long, Long, Long)].collect().toSet === before)
      assert(spark.table(t).select($"slice").distinct()
        .as[Long].collect().toSet === Set(0L, 3L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_wm")
    }
  }

  test("foldedSlices is memoized per process: repeat guard reads launch ZERO Spark jobs; recordFolded and out-of-band sidecar appends invalidate") {
    val t = "graft_cmp_wmmemo"
    val wm = t + "_wm"
    try {
      Stores.recordFolded(spark, t, Seq(1L, 2L))
      assert(Stores.foldedSlices(spark, t) === Set(1L, 2L))
      // the ingest guard consults foldedSlices on EVERY family of
      // EVERY micro-batch — the memoized read must answer from the
      // heap (one local file stat), never a refreshTable + scan +
      // collect (r20 verdict item 4: ~10 extra Spark jobs per
      // micro-batch at 10 families)
      val descs = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          descs.add(String.valueOf(Option(js.properties)
            .map(_.getProperty("spark.job.description")).orNull))
      }
      // tagged sentinel jobs fence the async listener bus: it is FIFO,
      // so once a sentinel's tag is visible, every job submitted
      // before it (including any backlog from before registration)
      // has been counted too
      def fence(tag: String): Unit = {
        spark.sparkContext.setJobDescription(tag)
        try spark.range(1).count()
        finally spark.sparkContext.setJobDescription(null)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!descs.contains(tag) && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(descs.contains(tag), s"listener never saw sentinel $tag")
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        fence("wm-memo-fence-0")
        val base = descs.size
        (1 to 5).foreach(_ =>
          assert(Stores.foldedSlices(spark, t) === Set(1L, 2L)))
        fence("wm-memo-fence-1")
        val window = new java.util.ArrayList[String](
          descs.subList(base, descs.size))
        // the sentinel may plan as more than one job (AQE) — the pin
        // is that NOTHING ELSE ran between the fences
        import scala.jdk.CollectionConverters._
        assert(!window.isEmpty
            && window.asScala.forall(_ == "wm-memo-fence-1"),
          s"memoized foldedSlices reads launched Spark job(s): $window")
      } finally spark.sparkContext.removeSparkListener(listener)
      // in-process invalidation: recordFolded (compact/retrain path)
      Stores.recordFolded(spark, t, Seq(3L))
      assert(Stores.foldedSlices(spark, t) === Set(1L, 2L, 3L))
      // out-of-band append (another session/process writing the same
      // sidecar): the file fingerprint invalidates the memo
      Seq(4L).toDF("slice").write.mode("append").format("parquet")
        .saveAsTable(wm)
      assert(Stores.foldedSlices(spark, t) === Set(1L, 2L, 3L, 4L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $wm")
    }
  }
}
