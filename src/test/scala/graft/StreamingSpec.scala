package graft

import java.sql.Timestamp

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.WindowedAgg
import graft.streaming._

/** Streaming-mode semantics of the stateful operators, driven through
  * MemoryStream micro-batches; asserts the batch≡stream equivalences
  * promised in SURVEY.md §5.4.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  implicit def sqlCtx: SQLContext = spark.sqlContext

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("consecutiveFails: detection spans micro-batch boundaries; gap and reset respected") {
    val input = MemoryStream[KeyedEvent]
    val q = StatefulOps.consecutiveFails(
        input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent], "fail", 2000)
      .writeStream.outputMode("append").format("memory").queryName("cf").start()
    input.addData(KeyedEvent(1, ts(100), "fail", 1))
    q.processAllAvailable()
    input.addData(KeyedEvent(1, ts(101), "fail", 2), KeyedEvent(2, ts(100), "fail", 3))
    q.processAllAvailable()
    input.addData(
      KeyedEvent(2, ts(200), "fail", 4),          // gap 100s > 2s — no warning
      KeyedEvent(1, ts(102), "success", 5),
      KeyedEvent(1, ts(103), "fail", 6))          // prev is success — no warning
    q.processAllAvailable()
    val rows = spark.table("cf").as[FailWarning].collect().toSet
    q.stop()
    assert(rows === Set(FailWarning(1, 2, 100, 101)))
  }

  test("orderTimeout: pay-within-deadline succeeds; watermark fires timeout") {
    val input = MemoryStream[KeyedEvent]
    val ds = input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    val q = StatefulOps.orderTimeout(ds, 15 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("ot").start()
    input.addData(
      KeyedEvent(1, ts(1000), "create", 1),       // never paid
      KeyedEvent(2, ts(1000), "create", 2),
      KeyedEvent(2, ts(1300), "pay", 3))          // paid within 15 min
    q.processAllAvailable()
    input.addData(KeyedEvent(99, ts(10000), "create", 4)) // advances watermark
    q.processAllAvailable()
    input.addData(KeyedEvent(98, ts(20000), "create", 5)) // advances further
    q.processAllAvailable()
    val rows = spark.table("ot").as[OrderResult].collect().toSet
    q.stop()
    assert(rows.contains(OrderResult(2, "payed successfully", 1300)))
    assert(rows.contains(OrderResult(1, "timeout", 1000)))
    assert(!rows.exists(_.key == 98))             // deadline not yet passed
  }

  test("orderTimeout: pay after deadline and orphan pay get reference tags") {
    val input = MemoryStream[KeyedEvent]
    val ds = input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    val q = StatefulOps.orderTimeout(ds, 15 * 60 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("ot2").start()
    input.addData(KeyedEvent(1, ts(1000), "create", 1))
    q.processAllAvailable()
    input.addData(KeyedEvent(1, ts(1000 + 3600), "pay", 2)) // 1h later: too late
    q.processAllAvailable()
    input.addData(KeyedEvent(2, ts(5000), "pay", 3))        // orphan pay
    q.processAllAvailable()
    input.addData(KeyedEvent(97, ts(100000), "create", 4))  // advance watermark
    q.processAllAvailable()
    input.addData(KeyedEvent(96, ts(200000), "create", 5))
    q.processAllAvailable()
    val rows = spark.table("ot2").as[OrderResult].collect().toSet
    q.stop()
    assert(rows.contains(OrderResult(1, "payed but already timeout", 4600)))
    assert(rows.contains(OrderResult(2, "already payed but not found create", 5000)))
  }

  test("clickBlacklist: one-shot warning per day, resets at event-time midnight") {
    val input = MemoryStream[KeyedClick]
    val q = StatefulOps.clickBlacklist(
        input.toDS().withWatermark("ts", "0 seconds").as[KeyedClick], 3)
      .writeStream.outputMode("append").format("memory").queryName("bl").start()
    input.addData(KeyedClick(1, 7, ts(100)), KeyedClick(1, 7, ts(200)))
    q.processAllAvailable()
    input.addData(KeyedClick(1, 7, ts(300)), KeyedClick(1, 7, ts(400))) // 3rd crosses, 4th silent
    q.processAllAvailable()
    input.addData(
      KeyedClick(1, 7, ts(86400 + 100)),          // next day: count restarts
      KeyedClick(2, 7, ts(500)))                  // other user below threshold
    q.processAllAvailable()
    val rows = spark.table("bl").as[BlacklistWarning].collect().toSet
    q.stop()
    assert(rows === Set(BlacklistWarning(1, 7, 0, "Click over 3 times today.")))
  }

  test("windowed count: streaming (complete mode) equals batch result") {
    val data = Seq(
      KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(200), "view", 2),
      KeyedEvent(1, ts(3700), "view", 3), KeyedEvent(3, ts(3800), "view", 4),
      KeyedEvent(1, ts(7300), "view", 5))
    val input = MemoryStream[KeyedEvent]
    val agg = WindowedAgg.tumblingCount(input.toDF(), "ts", "1 hour")
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("wc").start()
    input.addData(data.take(2): _*)
    q.processAllAvailable()
    input.addData(data.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("wc")
      .select("window_start", "window_end", "cnt")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    val batch = WindowedAgg.tumblingCount(data.toDF(), "ts", "1 hour")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming top-N via foreachBatch emits ranked completed windows") {
    val input = MemoryStream[KeyedEvent]
    val counts = WindowedAgg.slidingCount(
      input.toDF().withWatermark("ts", "0 seconds"),
      "ts", "1 hour", "1 hour", Seq("key"))
    val got = scala.collection.mutable.Set[(Long, Long, Long, Int)]()
    val q = StreamingTopN.writer(counts, Seq("window_start"), "cnt", Seq("key"), 2) {
      (ranked, _) =>
        got ++= ranked.select("window_start", "key", "cnt", "rank")
          .as[(Long, Long, Long, Int)].collect()
    }.start()
    input.addData(
      KeyedEvent(10, ts(100), "view", 1), KeyedEvent(10, ts(200), "view", 2),
      KeyedEvent(20, ts(300), "view", 3), KeyedEvent(30, ts(400), "view", 4))
    q.processAllAvailable()
    input.addData(KeyedEvent(10, ts(7300), "view", 5)) // advances watermark past window 0
    q.processAllAvailable()
    q.stop()
    assert(got.toSet === Set((0L, 10L, 2L, 1), (0L, 20L, 1L, 2))) // top-2, tie 20-vs-30 by key
  }

  test("streaming funnel via foreachBatch: recompute over landed events equals batch windowFunnel") {
    val input = MemoryStream[KeyedEvent]
    val store = java.nio.file.Files.createTempDirectory("funnel-stream")
      .resolve("events").toString
    val got = scala.collection.mutable.Map[Long, Int]()
    val q = StreamingFunnel.writer(input.toDF(), "key", "eventType", "ts",
        Seq("view", "click", "purchase"), "1 HOUR", store) { (funnel, _) =>
      got.clear()
      got ++= funnel.select("user_id", "depth").as[(Long, Int)].collect()
    }.start()
    val batch1 = Seq(KeyedEvent(1, ts(0), "view", 1), KeyedEvent(2, ts(0), "view", 2))
    val batch2 = Seq(
      KeyedEvent(1, ts(100), "click", 3), KeyedEvent(1, ts(200), "purchase", 4),
      KeyedEvent(2, ts(4000), "click", 5)) // outside user 2's 1h horizon
    input.addData(batch1: _*)
    q.processAllAvailable()
    assert(got.toMap === Map(1L -> 1, 2L -> 1)) // views only so far
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // the final micro-batch result IS the batch operator over all events
    val batchOut = graft.ops.Funnel.windowFunnel((batch1 ++ batch2).toDF(),
        "key", "eventType", "ts", Seq("view", "click", "purchase"), "1 HOUR")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(got.toMap === batchOut)
    assert(got.toMap === Map(1L -> 3, 2L -> 1))
    // foreachBatch is at-least-once: replay the last micro-batch under
    // its original batchId — the batch_id-partitioned dynamic overwrite
    // replaces that partition instead of appending a duplicate copy
    val before = spark.read.parquet(store).count()
    StreamingFunnel.land(batch2.toDF(), "key", "eventType", "ts", 1L, store)
    assert(spark.read.parquet(store).count() === before)
    val replayed = graft.ops.Funnel.windowFunnel(spark.read.parquet(store),
        "key", "eventType", "ts", Seq("view", "click", "purchase"), "1 HOUR")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(replayed === batchOut)
  }

  test("stateless corpus operators run unchanged on streams (narrow = streaming-compatible)") {
    // chunkWords, Sampling.split and subwordCounts are pure
    // projections/generators — the same call works on a streaming
    // DataFrame with no watermark, no state, and append output;
    // batch ≡ streaming row-for-row
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val chunked = graft.ops.TextAnalysis.chunkWords(stream, "doc_id", "text",
      chunkWords = 3, overlapWords = 1)
    val labeled = graft.ops.Sampling.split(stream, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
    val counted = graft.ops.TextAnalysis.subwordCounts(stream, "doc_id", "text",
      vocab = Seq("a", "x"))
    val q1 = chunked.writeStream.outputMode("append").format("memory")
      .queryName("chunks").start()
    val q2 = labeled.writeStream.outputMode("append").format("memory")
      .queryName("splits").start()
    val q3 = counted.writeStream.outputMode("append").format("memory")
      .queryName("subwords").start()
    val rows = Seq((1L, "a b c d e"), (2L, "x y"))
    input.addData(rows: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q3.processAllAvailable()
    q1.stop(); q2.stop(); q3.stop()
    assert(spark.table("subwords").as[(Long, Long)].collect().toMap ===
      Map(1L -> 5L, 2L -> 2L)) // every word is 1 piece or 1 fallback char
    val gotChunks = spark.table("chunks")
      .select("doc_id", "chunk_id", "chunk").as[(Long, Long, String)].collect().toSet
    val wantChunks = graft.ops.TextAnalysis.chunkWords(rows.toDF("doc_id", "text"),
        "doc_id", "text", chunkWords = 3, overlapWords = 1)
      .select("doc_id", "chunk_id", "chunk").as[(Long, Long, String)].collect().toSet
    assert(gotChunks === wantChunks && gotChunks.nonEmpty)
    val gotSplits = spark.table("splits")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val wantSplits = graft.ops.Sampling.split(rows.toDF("doc_id", "text"), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(gotSplits === wantSplits && gotSplits.size === 2)
  }

  test("stateful ops run on the RocksDB state store (the at-scale provider)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedEvent]
      val q = StatefulOps.consecutiveFails(
          input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent], "fail", 2000)
        .writeStream.outputMode("append").format("memory").queryName("rocks").start()
      input.addData(KeyedEvent(1, ts(100), "fail", 1))
      q.processAllAvailable()
      input.addData(KeyedEvent(1, ts(101), "fail", 2))
      q.processAllAvailable()
      val rows = spark.table("rocks").as[FailWarning].collect().toSet
      q.stop()
      assert(rows === Set(FailWarning(1, 2, 100, 101)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState blacklist (arbitrary-state v2) matches the fMGWS form") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedClick]
      val q = BlacklistProcessor(
          input.toDS().withWatermark("ts", "0 seconds").as[KeyedClick], 3)
        .writeStream.outputMode("append").format("memory").queryName("tws").start()
      input.addData(KeyedClick(1, 7, ts(100)), KeyedClick(1, 7, ts(200)))
      q.processAllAvailable()
      input.addData(KeyedClick(1, 7, ts(300)), KeyedClick(1, 7, ts(400)))
      q.processAllAvailable()
      input.addData(KeyedClick(1, 7, ts(86400 + 100)), KeyedClick(2, 7, ts(500)))
      q.processAllAvailable()
      val rows = spark.table("tws").as[BlacklistWarning].collect().toSet
      q.stop()
      assert(rows === Set(BlacklistWarning(1, 7, 0, "Click over 3 times today.")))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState consecutiveFails matches the fMGWS form") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedEvent]
      val q = ConsecutiveFailsProcessor(
          input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent], "fail", 2000)
        .writeStream.outputMode("append").format("memory").queryName("twscf").start()
      input.addData(KeyedEvent(1, ts(100), "fail", 1))
      q.processAllAvailable()
      input.addData(KeyedEvent(1, ts(101), "fail", 2), KeyedEvent(2, ts(101), "fail", 3))
      q.processAllAvailable()
      input.addData(
        KeyedEvent(2, ts(200), "fail", 4),        // gap 99s > 2s — no warning
        KeyedEvent(1, ts(102), "success", 5),
        KeyedEvent(1, ts(103), "fail", 6))        // prev is success — no warning
      q.processAllAvailable()
      val rows = spark.table("twscf").as[FailWarning].collect().toSet
      q.stop()
      assert(rows === Set(FailWarning(1, 2, 100, 101)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("transformWithState orderTimeout: success, timer-fired timeout, late pay, orphan") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[KeyedEvent]
      val q = OrderTimeoutProcessor(
          input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent], 15 * 60 * 1000)
        .writeStream.outputMode("append").format("memory").queryName("twsot").start()
      input.addData(
        KeyedEvent(1, ts(1000), "create", 1),     // never paid -> timer timeout
        KeyedEvent(2, ts(1000), "create", 2),
        KeyedEvent(2, ts(1300), "pay", 3),        // paid within 15 min
        KeyedEvent(3, ts(1000), "create", 4))
      q.processAllAvailable()
      input.addData(KeyedEvent(3, ts(1000 + 3600), "pay", 5)) // 1h later: too late
      q.processAllAvailable()
      input.addData(KeyedEvent(4, ts(5000), "pay", 6))        // orphan pay
      q.processAllAvailable()
      input.addData(KeyedEvent(97, ts(100000), "create", 7))  // advance watermark
      q.processAllAvailable()
      input.addData(KeyedEvent(96, ts(200000), "create", 8))
      q.processAllAvailable()
      val rows = spark.table("twsot").as[OrderResult].collect().toSet
      q.stop()
      assert(rows.contains(OrderResult(2, "payed successfully", 1300)))
      assert(rows.contains(OrderResult(1, "timeout", 1000)))
      assert(rows.contains(OrderResult(3, "payed but already timeout", 4600)))
      assert(rows.contains(OrderResult(4, "already payed but not found create", 5000)))
      assert(!rows.exists(_.key == 96))           // deadline not yet passed
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("session windows run streaming: gap-merged sessions close at the watermark") {
    val input = MemoryStream[KeyedEvent]
    val sessions = input.toDF().withWatermark("ts", "0 seconds")
      .groupBy(session_window($"ts", "30 seconds"), $"key")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"session_window.start").as("start"), $"key", $"cnt")
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    input.addData(KeyedEvent(1, ts(100), "view", 1), KeyedEvent(1, ts(120), "view", 2))
    q.processAllAvailable()
    input.addData(KeyedEvent(1, ts(130), "view", 3),  // merges into the open session
      KeyedEvent(1, ts(500), "view", 4))              // new session, gap > 30s
    q.processAllAvailable()
    input.addData(KeyedEvent(9, ts(10000), "view", 5)) // watermark closes everything
    q.processAllAvailable()
    input.addData(KeyedEvent(9, ts(20000), "view", 6))
    q.processAllAvailable()
    val rows = spark.table("sess").filter($"key" === 1)
      .select("start", "cnt").as[(Long, Long)].collect().toSet
    q.stop()
    assert(rows === Set((100L, 3L), (500L, 1L))) // cross-batch merge, gap split
  }

  test("streaming exact dedup within watermark") {
    val input = MemoryStream[KeyedEvent]
    val q = input.toDS().withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.outputMode("append").format("memory").queryName("dd").start()
    input.addData(KeyedEvent(1, ts(100), "view", 1), KeyedEvent(1, ts(101), "view", 2),
      KeyedEvent(2, ts(100), "view", 3))
    q.processAllAvailable()
    input.addData(KeyedEvent(1, ts(105), "view", 4)) // still within watermark: dup
    q.processAllAvailable()
    val n = spark.table("dd").count()
    q.stop()
    assert(n === 2) // one row per key
  }

  test("frozen-LM stream scoring ≡ batch; target-like docs outscore foreign ones") {
    // train the model in batch on a cat-themed reference corpus, then
    // score a stream containing a cat-like doc and a finance doc (all
    // terms unseen → every term takes the add-one floor)
    import graft.streaming.StreamingScore
    val reference = Seq(
      "cat cat feline purr whisker", "cat purr feline cat nap")
      .toDF("text")
    val lm = StreamingScore.unigramLm(reference, "text")
    val (total, vocab) = StreamingScore.lmTotals(lm)
    assert(total === 10L && vocab === 5L)
    val docs = Seq(
      (1L, "cat purr cat nap", ts(100)),
      (2L, "stock market futures index", ts(101)),
      (3L, "feline whisker purr", ts(112))) // second window
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingScore.scoreDocs(input.toDF().toDF("id", "text", "ts"),
        lm, total, vocab, "id", "ts", "text")
      .writeStream.outputMode("append").format("memory").queryName("flm").start()
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*) // advances the watermark past window 1
    q.processAllAvailable()
    input.addData((99L, "flush", ts(200)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("flm")
      .select("doc_id", "n_words", "avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val batch = StreamingScore.scoreDocs(docs.toDF("id", "text", "ts"),
        lm, total, vocab, "id", "ts", "text")
      .select("doc_id", "n_words", "avg_logprob")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    docs.foreach { case (id, _, _) => assert(streamed(id) === batch(id), s"doc $id") }
    // the cat doc scores the trained-term probability, the finance doc
    // the add-one floor ln(1/15) — strictly lower
    assert(streamed(1L)._2 > streamed(2L)._2)
    assert(math.abs(streamed(2L)._2 - math.log(1.0 / 15)) < 1e-6)
  }

  test("frozen NB stream classification ≡ batch, and agrees with the batch scorer") {
    // train in batch on the spam/ham toy (NaiveBayesSpec's corpus),
    // freeze, then classify a stream — same code path as batch
    val train = Seq(
      ("spam", "buy cheap pills"), ("spam", "cheap pills now"),
      ("ham", "meeting notes attached"), ("ham", "notes for the meeting"))
      .toDF("label", "text")
    val model = StreamingClassify.freeze(train, "label", "text")
    assert(model.labels === Seq("ham", "spam"))
    assert(model.totals === Seq(7L, 6L) && model.vocab === 9L)
    val docs = Seq(
      (1L, "cheap pills", ts(100)),
      (2L, "meeting notes", ts(101)),
      (3L, "zzz qqq", ts(112))) // all-unseen doc, second window
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingClassify.classifyDocs(input.toDF().toDF("id", "text", "ts"),
        model, "id", "ts", "text")
      .writeStream.outputMode("append").format("memory").queryName("fnb").start()
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*)
    q.processAllAvailable()
    input.addData((99L, "flush", ts(200)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fnb")
      .select("doc_id", "pred_label", "score")
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val batch = StreamingClassify.classifyDocs(docs.toDF("id", "text", "ts"),
        model, "id", "ts", "text")
      .select("doc_id", "pred_label", "score")
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.foreach { case (id, _, _) => assert(streamed(id) === batch(id), s"doc $id") }
    // same predictions AND scores (to the rounding edge) as the batch
    // scorer on the same train/test rows
    val ref = graft.ops.TextAnalysis.nbClassify(train,
        docs.toDF("doc_id", "text", "ts"), "label", "doc_id", "text")
      .select("doc_id", "pred_label", "score")
      .as[(Long, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    docs.foreach { case (id, _, _) =>
      assert(streamed(id)._1 === ref(id)._1, s"prediction drift for doc $id")
      assert(math.abs(streamed(id)._2 - ref(id)._2) < 2e-6,
        s"score drift for doc $id: ${streamed(id)._2} vs ${ref(id)._2}")
    }
    assert(streamed(1L)._1 === "spam" && streamed(2L)._1 === "ham")
    assert(streamed(3L)._1 === "spam") // equal priors → larger floor wins
  }

  test("streaming corpus composition: sample → scrub → watermark dedup → quality gate ≡ batch") {
    // the CONTINUOUS-INGESTION form of the corpus pipeline's stateless
    // prefix: deterministic hash sample and PII scrub are narrow (run
    // unchanged on the stream), near-dup dedup is the watermark-bounded
    // fingerprint form, the quality gate is a per-doc projection +
    // filter. One streaming query composes all four; survivors must
    // equal the batch twin (keepFirst over the same fingerprints)
    val input = MemoryStream[(Long, String, Timestamp)]
    def gates(docs: org.apache.spark.sql.DataFrame, streaming: Boolean) = {
      val sampled = graft.ops.Sampling.hashSample(docs, "id", 0.9)
      val scrubbed = sampled.withColumn("text",
        graft.ops.TextAnalysis.redactCol(col("text")))
      val deduped =
        if (streaming)
          graft.ops.Dedup.streamingFingerprint(scrubbed, "text", "ts", "10 seconds")
        else
          graft.ops.Dedup.keepFirst(
            scrubbed.withColumn("fingerprint", graft.ops.Dedup.fingerprint("text")),
            Seq("fingerprint"), Seq("ts", "id"))
      graft.ops.TextAnalysis.qualityScore(deduped, "id", "text")
        .filter(col("quality") >= 0.1).select(col("doc_id"))
    }
    val q = gates(input.toDF().toDF("id", "text", "ts"), streaming = true)
      .writeStream.outputMode("append").format("memory").queryName("scc").start()
    // ids chosen to SURVIVE the 0.9 hash sample (md5 bucket < 9000:
    // 2,3,5,6,8) except 1, which samples out — every gate then has a
    // doc exercising it
    val docs = Seq(
      (1L, "this one hashes out of the sample entirely", ts(99)),
      (2L, "the quick brown fox jumped over the lazy dog near the river", ts(100)),
      (3L, "quick the fox brown jumped over the lazy dog near the river", ts(101)), // word-order dup of 2
      (5L, "mail me at u5@example.com about the quick delivery of the parcel", ts(102)),
      (6L, "an entirely different document about rivers and the parcels therein", ts(103)),
      (8L, "spam spam spam spam spam spam spam spam spam spam spam spam", ts(104))) // 1 distinct word in 12
    input.addData(docs.take(3): _*)
    q.processAllAvailable()
    input.addData(docs.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scc").as[Long].collect().toSet
    val batch = gates(docs.toDF("id", "text", "ts"), streaming = false)
      .as[Long].collect().toSet
    assert(streamed === batch)
    // 1 sampled out; 3 deduped against 2; 8 gated (quality ≈ 0.081:
    // diversity 1/12, length 12/100, full stopword-free penalty)
    assert(streamed === Set(2L, 5L, 6L))
  }

  test("streaming dedup helpers: streamingExact ≡ batch keepFirst within the horizon") {
    // duplicate-injection corpus, arriving in event-time order across
    // micro-batches: survivors of the watermark-bounded streaming dedup
    // must equal the batch keepFirst twin's survivors (Dedup.scala §
    // streamingExact: the horizon IS the dedup guarantee)
    val corpus = Seq(
      KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(101), "view", 2),
      KeyedEvent(1, ts(102), "view", 3),            // dup of key 1, in horizon
      KeyedEvent(2, ts(105), "view", 4),            // dup of key 2, in horizon
      KeyedEvent(3, ts(106), "view", 5))
    val input = MemoryStream[KeyedEvent]
    val q = graft.ops.Dedup.streamingExact(input.toDF(), Seq("key"), "ts", "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sdh").start()
    input.addData(corpus.take(3): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(3): _*)               // dup spans the batch boundary
    q.processAllAvailable()
    val streamed = spark.table("sdh").select("id").as[Long].collect().toSet
    val batch = graft.ops.Dedup.keepFirst(corpus.toDF(), Seq("key"), Seq("ts", "id"))
      .select("id").as[Long].collect().toSet
    assert(streamed === batch)                      // Set(1, 2, 5)
    // horizon boundary: once the watermark evicts a key's state, a new
    // occurrence is re-admitted — by design, NOT a bug (full-history
    // dedup is keepFirst over the batch store)
    input.addData(KeyedEvent(9, ts(100000), "view", 90)) // advances watermark
    q.processAllAvailable()
    input.addData(KeyedEvent(1, ts(100001), "view", 6))  // key 1 re-admitted
    q.processAllAvailable()
    val after = spark.table("sdh").select("id").as[Long].collect().toSet
    q.stop()
    assert(after === (batch ++ Set(90L, 6L)))
  }

  test("streaming dedup helpers: streamingFingerprint collapses word-order variants") {
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDF().toDF("id", "text", "ts")
    val q = graft.ops.Dedup.streamingFingerprint(docs, "text", "ts", "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sfp").start()
    input.addData((1L, "the quick brown fox", ts(100)))
    q.processAllAvailable()
    input.addData(
      (2L, "brown fox the quick quick", ts(101)),   // order/repetition variant: dup
      (3L, "a different document", ts(102)))
    q.processAllAvailable()
    val kept = spark.table("sfp").select("id").as[Long].collect().toSet
    q.stop()
    assert(kept === Set(1L, 3L))
  }

  test("checkpointed windowed agg resumes exactly-once across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-")
    val (srcDir, outDir, ckptDir) =
      (base.resolve("src"), base.resolve("out"), base.resolve("ckpt"))
    java.nio.file.Files.createDirectory(srcDir)
    def writeFile(name: String, rows: Seq[KeyedEvent]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(srcDir.toString)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[KeyedEvent]].schema)
        .parquet(srcDir.toString)
      val agg = WindowedAgg.tumblingCount(
        src.withWatermark("ts", "0 seconds"), "ts", "1 hour")
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir.toString)
        .format("parquet").option("path", outDir.toString).start()
      q.processAllAvailable(); q.stop()
    }
    writeFile("f1", Seq(
      KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(200), "view", 2),
      KeyedEvent(3, ts(3700), "view", 3)))
    runOnce()                                   // first run, checkpoint written
    writeFile("f2", Seq(
      KeyedEvent(4, ts(3800), "view", 4),
      KeyedEvent(9, ts(864000), "view", 5)))    // sentinel closes all real windows
    runOnce()                                   // restart from the checkpoint
    val streamed = spark.read.parquet(outDir.toString)
      .select("window_start", "cnt").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // every closed window exactly once — no duplicates from the restart,
    // no loss of pre-restart state (hour-0 window spans both...; hour-1
    // window counts events from BOTH files: state carried across restart)
    assert(streamed === Map((0L, 2L) -> 1, (3600L, 2L) -> 1))
  }

  test("fanOutByTag routes one stream to per-tag sinks (side-output parity)") {
    val input = MemoryStream[KeyedEvent]
    val tagged = input.toDF().withColumn("tag",
      when($"eventType" === "fail", "warn").otherwise("ok"))
    val got = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val q = Sinks.fanOutByTag(tagged) {
      Map(
        "warn" -> (b => got.synchronized { got("warn") += b.count() }),
        "ok"   -> (b => got.synchronized { got("ok") += b.count() }))
    }.start()
    input.addData(KeyedEvent(1, ts(1), "fail", 1), KeyedEvent(2, ts(2), "view", 2),
      KeyedEvent(3, ts(3), "view", 3))
    q.processAllAvailable()
    q.stop()
    assert(got("warn") === 1L && got("ok") === 2L)
  }

  test("late tap: watermark-late rows surface in the late route instead of vanishing (W5)") {
    val input = MemoryStream[KeyedEvent]
    val tagged = LateTap.tagLate(
      input.toDF().withWatermark("ts", "0 seconds"), "ts")
    val late = scala.collection.mutable.Set[Long]()
    val ontime = scala.collection.mutable.Set[Long]()
    val q = Sinks.fanOutByTag(tagged) {
      Map(
        LateTap.LateTag ->
          (b => late.synchronized { late ++= b.select("id").as[Long].collect() }),
        LateTap.OnTimeTag ->
          (b => ontime.synchronized { ontime ++= b.select("id").as[Long].collect() }))
    }.start()
    input.addData(KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(200), "view", 2))
    q.processAllAvailable() // watermark advances to 200s
    input.addData(KeyedEvent(3, ts(50), "view", 3), // older than watermark → late
      KeyedEvent(4, ts(300), "view", 4))
    q.processAllAvailable()
    q.stop()
    assert(late.toSet === Set(3L))
    assert(ontime.toSet === Set(1L, 2L, 4L))
  }

  test("late tap requires a watermark and a streaming input") {
    val input = MemoryStream[KeyedEvent]
    val e = intercept[IllegalArgumentException] {
      LateTap.tagLate(input.toDF(), "ts")
    }
    assert(e.getMessage.contains("withWatermark"))
    intercept[IllegalArgumentException] {
      LateTap.tagLate(Seq(KeyedEvent(1, ts(1), "view", 1)).toDF(), "ts")
    }
  }

  test("approx UV in update mode emits running counts (A5 running emission)") {
    val input = MemoryStream[KeyedEvent]
    val agg = WindowedAgg.tumblingApproxDistinct(
      input.toDF(), "ts", "1 hour", "key")
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("uvup").start()
    input.addData(KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(200), "view", 2))
    q.processAllAvailable()
    val first = spark.table("uvup").select("uv_approx").as[Long].collect().max
    input.addData(KeyedEvent(3, ts(300), "view", 3))
    q.processAllAvailable()
    val last = spark.table("uvup").select("uv_approx").as[Long].collect().max
    q.stop()
    assert(first === 2L && last === 3L) // running per-batch emission
  }

  test("interval join runs stream-stream: inner matches within the time range") {
    val lIn = MemoryStream[KeyedEvent]
    val rIn = MemoryStream[KeyedEvent]
    val pays = lIn.toDF().select($"key", $"id".as("pay_id"), $"ts".as("pay_ts"))
      .withWatermark("pay_ts", "0 seconds")
    val receipts = rIn.toDF().select($"key".as("r_key"), $"id".as("receipt_id"),
        $"ts".as("receipt_ts"))
      .withWatermark("receipt_ts", "0 seconds")
    val out = graft.ops.StreamMatch.intervalJoin(pays, receipts, "key",
      "pay_ts", "receipt_ts", "5 SECONDS", "5 SECONDS")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("ivj").start()
    lIn.addData(KeyedEvent(1, ts(1000), "pay", 10), KeyedEvent(2, ts(1000), "pay", 11))
    rIn.addData(KeyedEvent(1, ts(1003), "receipt", 20),  // within +5s
      KeyedEvent(2, ts(1060), "receipt", 21))            // 60s later: no match
    q.processAllAvailable()
    lIn.addData(KeyedEvent(90, ts(100000), "pay", 30))   // advance watermarks
    rIn.addData(KeyedEvent(91, ts(100000), "receipt", 31))
    q.processAllAvailable()
    val pairs = spark.table("ivj").select("pay_id", "receipt_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(pairs === Set((10L, 20L)))
  }

  test("streaming as-of join: latest right at-or-before each left, watermark-gated") {
    // 10s out-of-orderness allowance: the right@9 below arrives AFTER
    // an event at ts 10 — with a 0s watermark it would be (correctly)
    // dropped as late
    val input = MemoryStream[AsofEvent]
    val q = AsofStream.asofJoinStream(
        input.toDS().withWatermark("ts", "10 seconds").as[AsofEvent])
      .writeStream.outputMode("append").format("memory").queryName("asof").start()
    input.addData(
      AsofEvent(1, ts(8), isLeft = false, 20),   // right @8
      AsofEvent(1, ts(10), isLeft = true, 100))  // left @10 — not emittable yet
    q.processAllAvailable()
    assert(spark.table("asof").count() === 0)    // watermark still behind the left
    input.addData(
      AsofEvent(1, ts(9), isLeft = false, 21),   // later-arriving right @9 still wins
      AsofEvent(2, ts(9), isLeft = true, 101))   // no right for key 2
    q.processAllAvailable()
    input.addData(AsofEvent(9, ts(10000), isLeft = false, 1)) // advance watermark
    q.processAllAvailable()
    input.addData(AsofEvent(9, ts(20000), isLeft = false, 2))
    q.processAllAvailable()
    val rows = spark.table("asof").as[AsofPair].collect().toSet
    q.stop()
    assert(rows === Set(
      AsofPair(1, 100L, 10000L, Some(21L), Some(9000L)), // right@9 beat right@8
      AsofPair(2, 101L, 9000L, None, None)))             // ms resolution
    // a NEW left after emission still matches the retained latest right
    val input2 = MemoryStream[AsofEvent]
    val q2 = AsofStream.asofJoinStream(
        input2.toDS().withWatermark("ts", "10 seconds").as[AsofEvent])
      .writeStream.outputMode("append").format("memory").queryName("asof2").start()
    input2.addData(AsofEvent(1, ts(5), isLeft = false, 50))
    q2.processAllAvailable()
    input2.addData(AsofEvent(1, ts(600), isLeft = true, 200)) // right@5 kept across batches
    q2.processAllAvailable()
    input2.addData(AsofEvent(9, ts(10000), isLeft = false, 1))
    q2.processAllAvailable()
    input2.addData(AsofEvent(9, ts(20000), isLeft = false, 2))
    q2.processAllAvailable()
    val rows2 = spark.table("asof2").as[AsofPair].collect().toSet
    q2.stop()
    assert(rows2 === Set(AsofPair(1, 200L, 600000L, Some(50L), Some(5000L))))
  }

  test("streaming last-touch attribution: as-of stream ≡ batch Behavior.attribution") {
    // the q190 operator's streaming form: conversions are as-of LEFTs,
    // touches RIGHTs — the latest touch at-or-before each conversion
    // IS last-touch attribution. Rights are deduped per (key, ts) to
    // the max id before streaming (the q41 convention — exactly the
    // argmax tie-break batch attribution applies), so both forms must
    // agree conversion for conversion, including the zero-touch case.
    import graft.ops.Behavior
    val touches = Seq(                         // (user, id, tsSec)
      (1L, 20L, 8L), (1L, 21L, 9L),            // user 1: 21 is latest
      (3L, 22L, 5L), (3L, 23L, 5L))            // user 3: tie at ts 5 → 23
    val convs = Seq(
      (1L, 100L, 10L),                          // after both touches
      (2L, 101L, 9L),                           // user 2: no touches
      (3L, 102L, 6L))
    val input = MemoryStream[AsofEvent]
    val q = AsofStream.asofJoinStream(
        input.toDS().withWatermark("ts", "10 seconds").as[AsofEvent])
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_stream").start()
    val dedupedRights = touches.groupBy(t => (t._1, t._3))
      .map { case ((u, tsSec), ts2) => (u, ts2.map(_._2).max, tsSec) }.toSeq
    input.addData(dedupedRights.map { case (u, id, t) =>
      AsofEvent(u, ts(t), isLeft = false, id) }: _*)
    input.addData(convs.map { case (u, id, t) =>
      AsofEvent(u, ts(t), isLeft = true, id) }: _*)
    q.processAllAvailable()
    input.addData(AsofEvent(9, ts(10000), isLeft = false, 1)) // advance wm
    q.processAllAvailable()
    input.addData(AsofEvent(9, ts(20000), isLeft = false, 2))
    q.processAllAvailable()
    val streamed = spark.table("attr_stream").as[AsofPair].collect()
      .map(p => (p.key, p.leftId, p.rightId.getOrElse(-1L))).toSet
    q.stop()
    // batch form on the RAW (tied) touches — same window-free horizon
    // (every touch within the 1h lookback)
    val batch = Behavior.attribution(
        convs.map { case (u, id, t) => (u, id, ts(t)) }
          .toDF("user_id", "conv_id", "conv_ts"),
        touches.map { case (u, id, t) => (u, id, ts(t), s"ch${id % 4}") }
          .toDF("user_id", "touch_id", "touch_ts", "channel"),
        "user_id", "conv_id", "conv_ts", "touch_id", "touch_ts",
        "channel", windowSec = 3600L)
      .select($"user_id", $"conv_id", $"last_touch_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set((1L, 100L, 21L), (2L, 101L, -1L),
      (3L, 102L, 23L)))
  }

  test("streaming attribution pairs: interval join ≡ batch pairs; linear/position/decay rollups agree") {
    // the multi-touch attribution forms stream as: pairs emit from a
    // stream-stream interval join (the window predicate IN the join
    // condition — Spark derives state cleanup from it), accumulate in
    // an append sink, and the SAME rollup bodies read the store — so
    // streamed linear/position/decay cannot drift from batch
    import graft.ops.Behavior
    val D = 86400L
    val t0 = 100L * D
    val convRows = Seq((1L, 100L, t0), (2L, 101L, t0 - D), (4L, 103L, t0))
    val touchRows = Seq(
      (1L, 1L, t0, "a"), (1L, 2L, t0 - 2 * D, "b"),
      (1L, 3L, t0 - 3 * D, "a"),
      (1L, 4L, t0 - 8 * D, "b"), // outside the 7-day window
      (2L, 5L, t0 - 2 * D, "b"),
      (4L, 6L, t0 - D, "c"), (4L, 7L, t0 - D, "d")) // position tie pair
    val W = 7 * D
    val cIn = MemoryStream[(Long, Long, Timestamp)]
    val tIn = MemoryStream[(Long, Long, Timestamp, String)]
    val pairs = Behavior.attributionPairsStream(
      cIn.toDS().toDF("user_id", "conv_id", "conv_ts"),
      tIn.toDS().toDF("user_id", "touch_id", "touch_ts", "channel"),
      "user_id", "conv_id", "conv_ts", "touch_id", "touch_ts", "channel",
      windowSec = W, watermark = "10 days")
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("attr_pairs").start()
    // touches SPLIT across micro-batches, conversions in between
    tIn.addData(touchRows.take(3).map { case (u, id, s, ch) =>
      (u, id, ts(s), ch) }: _*)
    q.processAllAvailable()
    cIn.addData(convRows.map { case (u, id, s) => (u, id, ts(s)) }: _*)
    q.processAllAvailable()
    tIn.addData(touchRows.drop(3).map { case (u, id, s, ch) =>
      (u, id, ts(s), ch) }: _*)
    q.processAllAvailable()
    q.stop()
    // materialize the sink (a real store read is a fresh scan; the
    // memory-table view can't self-join inside the rollup bodies)
    val streamedPairs = spark.table("attr_pairs")
      .as[(Long, Timestamp, Long, Timestamp, String)].collect().toSeq
      .toDF("conv_id", "conv_ts", "touch_id", "touch_ts", "channel")
    val convsDF = convRows.toDF("user_id", "conv_id", "sec")
      .select($"user_id", $"conv_id", timestamp_seconds($"sec").as("conv_ts"))
    val touchesDF = touchRows.toDF("user_id", "touch_id", "sec", "channel")
      .select($"user_id", $"touch_id",
        timestamp_seconds($"sec").as("touch_ts"), $"channel")
    val batchPairs = Behavior.attributionPairs(convsDF, touchesDF,
      "user_id", "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"conv_id", $"touch_id").as[(Long, Long)].collect().toSet
    assert(pairSet(streamedPairs) === pairSet(batchPairs))
    assert(pairSet(streamedPairs) === Set((100L, 1L), (100L, 2L),
      (100L, 3L), (101L, 5L), (103L, 6L), (103L, 7L)))
    // the same rollup bodies over the streamed store ≡ the batch forms
    def rollupSet(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, Long, Long, Long)].collect().toSet
    assert(rollupSet(Behavior.linearRollup(streamedPairs)) ===
      rollupSet(Behavior.linearAttribution(convsDF, touchesDF, "user_id",
        "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)))
    assert(rollupSet(Behavior.positionRollup(streamedPairs)) ===
      rollupSet(Behavior.positionAttribution(convsDF, touchesDF, "user_id",
        "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)))
    assert(rollupSet(Behavior.decayRollup(streamedPairs)) ===
      rollupSet(Behavior.decayAttribution(convsDF, touchesDF, "user_id",
        "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)))
  }

  test("reconcileStreams: matched plus both unmatched sides after watermark close") {
    val lIn = MemoryStream[KeyedEvent]
    val rIn = MemoryStream[KeyedEvent]
    val left = lIn.toDF().select($"key", $"ts".as("left_ts"))
    val right = rIn.toDF().select($"key".as("r_key"), $"ts".as("right_ts"))
    val out = StatefulOps.reconcileStreams(left, right,
      "key", "r_key", "left_ts", "right_ts", "5 SECONDS", "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("rec").start()
    lIn.addData(KeyedEvent(1, ts(1000), "pay", 1), KeyedEvent(2, ts(1000), "pay", 2))
    rIn.addData(KeyedEvent(1, ts(1001), "receipt", 3), KeyedEvent(3, ts(1000), "receipt", 4))
    q.processAllAvailable()
    // advance both watermarks far past the interval so unmatched rows emit
    lIn.addData(KeyedEvent(90, ts(100000), "pay", 5))
    rIn.addData(KeyedEvent(91, ts(100000), "receipt", 6))
    q.processAllAvailable()
    lIn.addData(KeyedEvent(90, ts(200000), "pay", 7))
    rIn.addData(KeyedEvent(91, ts(200000), "receipt", 8))
    q.processAllAvailable()
    val tags = spark.table("rec")
      .select(coalesce($"key", $"r_key").as("k"), $"tag")
      .as[(Long, String)].collect().toSet
    q.stop()
    assert(tags.contains((1L, "matched")))
    assert(tags.contains((2L, "unmatched_left")))
    assert(tags.contains((3L, "unmatched_right")))
  }

  test("transformWithState reconcile matches the stream-join form's verdicts, across a checkpointed restart") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory("graft-rec-tws-")
    val (srcDir, outDir, ckptDir) =
      (base.resolve("src"), base.resolve("out"), base.resolve("ckpt"))
    java.nio.file.Files.createDirectory(srcDir)
    try {
      def writeFile(rows: Seq[AsofEvent]): Unit =
        rows.toDF().coalesce(1).write.mode("append").parquet(srcDir.toString)
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema(implicitly[org.apache.spark.sql.Encoder[AsofEvent]].schema)
          .parquet(srcDir.toString)
        val q = ReconcileProcessor(
            src.withWatermark("ts", "0 seconds").as[AsofEvent],
            toleranceMs = 5000)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckptDir.toString)
          .format("parquet").option("path", outDir.toString).start()
        q.processAllAvailable(); q.stop()
      }
      // the reconcileStreams test's events, as one tagged union stream
      writeFile(Seq(
        AsofEvent(1, ts(1000), isLeft = true, 1),   // pay 1
        AsofEvent(2, ts(1000), isLeft = true, 2),   // pay 2 (never receipted)
        AsofEvent(1, ts(1001), isLeft = false, 3),  // receipt 1 -> matched
        AsofEvent(3, ts(1000), isLeft = false, 4))) // receipt 3 (orphan)
      runOnce()                                     // checkpoint written
      // restart from the checkpoint: pending state (keys 2 and 3) must
      // survive the restart and resolve as unmatched once the
      // watermark passes; key 90's pair is OUT of tolerance
      writeFile(Seq(AsofEvent(90, ts(100000), isLeft = true, 5)))
      runOnce()
      writeFile(Seq(AsofEvent(90, ts(200000), isLeft = false, 6)))
      runOnce()
      writeFile(Seq(AsofEvent(91, ts(300000), isLeft = true, 7)))
      runOnce()                                     // advance the watermark
      val rows = spark.read.parquet(outDir.toString)
        .as[ReconcileResult].collect().toSet
      // same verdicts the stream-join form produces for keys 1..3
      assert(rows.filter(_.key <= 3) === Set(
        ReconcileResult(1, "matched", Some(1L), Some(3L)),
        ReconcileResult(2, "unmatched_left", Some(2L), None),
        ReconcileResult(3, "unmatched_right", None, Some(4L))))
      // and the out-of-tolerance pair on key 90 resolves as BOTH
      // unmatched (ts 100000 vs 200000 > 5s), matching join semantics
      assert(rows.filter(_.key == 90).map(_.tag) ===
        Set("unmatched_left", "unmatched_right"))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("StreamingGate: frozen per-domain quality gate, batch ≡ streaming, q107 parity on calibration") {
    // calibration corpus: 4 docs per domain with (by construction)
    // distinct quality scores — top quartile = exactly the best doc
    val calib = Seq(
      (1L, "spam spam spam spam", "a"),
      (2L, "the cat sat on the mat", "a"),
      (3L, "a longer document with more and varied words about rivers", "a"),
      (4L, "the quick brown fox jumps over the lazy dog with many varied interesting words about rivers and mountains", "a"),
      (5L, "x x x x x x", "b"),
      (6L, "short note", "b"),
      (7L, "for sale baby shoes never worn", "b"),
      (8L, "an entirely different document about parcels and the rivers they travel upon with friends", "b"))
      .toDF("id", "text", "source")
    import graft.streaming.StreamingGate
    val cuts = StreamingGate.freezeCutPoints(calib, "id", "text", "source").cache()
    val cutMap = cuts.as[(String, Double)].collect().toMap
    // distinct qualities per domain (precondition for exact q107 parity)
    val qual = graft.ops.TextAnalysis.qualityScore(calib, "id", "text",
        carryCols = Seq("source"))
      .select($"doc_id", $"source", $"quality")
      .as[(Long, String, Double)].collect()
    assert(qual.filter(_._2 == "a").map(_._3).distinct.length === 4)
    assert(qual.filter(_._2 == "b").map(_._3).distinct.length === 4)
    // 4 docs, 4 buckets → the frozen cut IS the best doc's quality
    assert(cutMap("a") === qual.filter(_._2 == "a").map(_._3).max)
    assert(cutMap("b") === qual.filter(_._2 == "b").map(_._3).max)

    // q107 parity: gating the calibration corpus itself reproduces the
    // batch adaptive gate's survivors (distinct qualities → no tie gap)
    val batchAdaptive = graft.ops.Quantiles.exactNtile(
        graft.ops.TextAnalysis.qualityScore(calib, "id", "text",
          carryCols = Seq("source"))
          .select($"doc_id", $"source", $"quality"),
        "source", Seq("quality", "doc_id"), buckets = 4)
      .filter($"bucket" === 4).select($"doc_id")
      .as[Long].collect().toSet
    val frozenOnCalib = StreamingGate.gateDocs(calib, cuts, "id", "text", "source")
      .select($"doc_id").as[Long].collect().toSet
    assert(frozenOnCalib === batchAdaptive)

    // stream new docs: 100 ties a's best (kept, >= is inclusive), 101 is
    // a's spam (dropped), 102 clears b's cut (kept), 103 is from an
    // uncalibrated domain (dropped by default, kept with keepUnknown)
    val arriving = Seq(
      (100L, "the quick brown fox jumps over the lazy dog with many varied interesting words about rivers and mountains", "a"),
      (101L, "spam spam spam spam", "a"),
      (102L, "an entirely different document about parcels and the rivers they travel upon with friends", "b"),
      (103L, "a perfectly reasonable document from a brand new dump", "c"))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingGate.gateDocs(input.toDF().toDF("id", "text", "source"),
        cuts, "id", "text", "source")
      .writeStream.outputMode("append").format("memory").queryName("sg").start()
    input.addData(arriving.take(2): _*)
    q.processAllAvailable()
    input.addData(arriving.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sg").select($"doc_id").as[Long].collect().toSet
    val batch = StreamingGate.gateDocs(arriving.toDF("id", "text", "source"),
        cuts, "id", "text", "source")
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed === batch)               // one code path, two modes
    assert(streamed === Set(100L, 102L))
    val withUnknown = StreamingGate.gateDocs(arriving.toDF("id", "text", "source"),
        cuts, "id", "text", "source", keepUnknown = true)
      .select($"doc_id").as[Long].collect().toSet
    assert(withUnknown === Set(100L, 102L, 103L))
  }

  test("streaming sketch-warehouse ingest: per-batch slices accumulate, merge ≡ full rescan") {
    // the live half of SketchStore: each micro-batch writes its OWN
    // slice rows (slice id = batch id) through foreachBatch — history
    // is never re-scanned — and a store merge at any point answers
    // exactly like a batch pass over everything ingested so far
    import graft.functions.TypedAggs
    import graft.ops.SketchStore
    val store =
      scala.collection.mutable.ArrayBuffer[(String, Long, Seq[Long], Int)]()
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store ++= SketchStore.kmvSlices(
            batch.withColumn("slice", lit(id)),
            Seq("eventType"), "slice", $"key".cast("string"), k = 4)
          .as[(String, Long, Seq[Long], Int)].collect(): Unit
      }.start()
    val rows = (1 to 40).map(i =>
      KeyedEvent(i % 11, ts(i * 10), if (i % 2 == 0) "view" else "click", i))
    input.addData(rows.take(15): _*)
    q.processAllAvailable()
    input.addData(rows.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(store.map(_._2).distinct.size >= 2) // really multiple slices
    val merged = SketchStore.kmvMergeSlices(
        store.toSeq.toDF("eventType", "slice", "hs", "k"), Seq("eventType"), k = 4)
      .select($"eventType", $"hs").as[(String, Seq[Long])].collect().toMap
    val full = rows.toDF()
      .groupBy($"eventType")
      .agg(TypedAggs.kmvHashes($"key".cast("string"), 4).as("hs"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === full)
  }

  test("streaming CDC ingest: per-batch cdcApply folds ≡ one-shot cdcState; tombstones survive batches") {
    // the live half of the q221 store: each micro-batch folds into the
    // artifact via cdcApply (ONE code path with the batch build);
    // argmax associativity makes the fold order irrelevant, and a
    // tombstone written in batch 1 must suppress an OLDER upsert
    // arriving in batch 2 — exactly why cdcState retains tombstones
    import graft.ops.Scd
    def op(t: String) = if (t == "drop") "delete" else "upsert"
    val store =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String, String)]()
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.select($"key", $"ts", $"id".as("tie"),
          when($"eventType" === "drop", "delete")
            .otherwise("upsert").as("op"),
          $"eventType".as("st"))
        val folded =
          if (store.isEmpty) Scd.cdcState(b, "key", "ts", "tie", "st", "op")
          else Scd.cdcApply(
            store.toSeq.toDF("key", "sec", "tie", "op", "state")
              .select($"key", timestamp_seconds($"sec").as("ts"),
                $"tie", $"op", $"state"),
            b, "key", "ts", "tie", "st", "op")
        val rows = folded
          .select($"key", unix_timestamp($"ts"), $"tie", $"op", $"state")
          .as[(Long, Long, Long, String, String)].collect()
        store.clear()
        store ++= rows: Unit
      }.start()
    val all = Seq(
      KeyedEvent(1, ts(100), "view", 1), KeyedEvent(2, ts(100), "view", 2),
      KeyedEvent(2, ts(300), "drop", 3), // tombstone in batch 1
      KeyedEvent(3, ts(100), "view", 4),
      // batch 2: an OLDER upsert for key 2 (late data) must NOT
      // resurrect it; key 3 updates; key 4 appears
      KeyedEvent(2, ts(200), "click", 5), KeyedEvent(3, ts(400), "click", 6),
      KeyedEvent(4, ts(150), "view", 7))
    input.addData(all.take(4): _*)
    q.processAllAvailable()
    input.addData(all.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val oneShot = Scd.cdcState(
        all.toDF().select($"key", $"ts", $"id".as("tie"),
          when($"eventType" === "drop", "delete")
            .otherwise("upsert").as("op"),
          $"eventType".as("st")),
        "key", "ts", "tie", "st", "op")
      .select($"key", unix_timestamp($"ts"), $"tie", $"op", $"state")
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(store.toSet === oneShot)
    assert(op("drop") === "delete") // fixture sanity
    // the served view: key 2 stays deleted despite the late upsert
    assert(store.toSet.filter(_._4 != "delete").map(r => r._1 -> r._5) ===
      Set(1L -> "view", 3L -> "click", 4L -> "view"))
  }

  test("streaming histogram-warehouse ingest: per-batch slices accumulate, merge ≡ full rescan") {
    // the quantile member rides the same foreachBatch slice loop as
    // KMV: each micro-batch writes its own counter rows (slice = batch
    // id), history never re-scanned, and a merge at any point answers
    // exactly like a batch pass — counters are sums
    import graft.ops.SketchStore
    val store =
      scala.collection.mutable.ArrayBuffer[(String, Long, Seq[Long], Long, Long)]()
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store ++= SketchStore.histSlices(
            batch.withColumn("slice", lit(id)),
            Seq("eventType"), "slice", $"key", lo = 0L, width = 3L, nBins = 4)
          .select($"eventType", $"slice", $"cs", $"h_lo", $"h_width")
          .as[(String, Long, Seq[Long], Long, Long)].collect(): Unit
      }.start()
    val rows = (1 to 40).map(i =>
      KeyedEvent(i % 13, ts(i * 10), if (i % 2 == 0) "view" else "click", i))
    input.addData(rows.take(15): _*)
    q.processAllAvailable()
    input.addData(rows.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(store.map(_._2).distinct.size >= 2) // really multiple slices
    val merged = SketchStore.histMergeSlices(
        store.toSeq.toDF("eventType", "slice", "cs", "h_lo", "h_width"),
        Seq("eventType"), lo = 0L, width = 3L, nBins = 4)
      .select($"eventType", $"cs").as[(String, Seq[Long])].collect().toMap
    val full = rows.toDF()
      .groupBy($"eventType")
      .agg(graft.functions.TypedAggs.histCounts($"key".cast("long"), 0L, 3L, 4)
        .as("cs"))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged === full)
  }

  test("ServingWarehouse rejects a second concurrent writer: slice-id collisions would silently drop the loser's batches") {
    import graft.jobs.ServingWarehouse
    val base = java.nio.file.Files.createTempDirectory("graft-swc-")
    val t = warehouseTables("graft_swc")
    try {
      bootstrapWarehouse(t, base)
      val docsIn = MemoryStream[(Long, String)]
      val pairsIn = MemoryStream[(Long, Long)]
      val qs = ServingWarehouse.start(
        docsIn.toDS().toDF("doc_id", "text"),
        pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      // a second deployment over the SAME tables must fail loudly —
      // its foreachBatch ids would start at 0 again and the slice-id
      // guard would skip every batch the first writer already landed
      val ex = intercept[IllegalStateException] {
        ServingWarehouse.start(
          docsIn.toDS().toDF("doc_id", "text"),
          pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      }
      assert(ex.getMessage.contains("live ingest writer"))
      // the failed claim rolled back nothing that belongs to the
      // first writer: it is still registered (a third start fails too)
      intercept[IllegalStateException] {
        ServingWarehouse.start(
          docsIn.toDS().toDF("doc_id", "text"),
          pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      }
      // the live deployment keeps working through all of this
      docsIn.addData((1L, "a b a"))
      pairsIn.addData((10L, 11L))
      qs.foreach(_.processAllAvailable())
      assert(!spark.table(t.index).isEmpty)
      qs.foreach(_.stop())
      // release frees the claim — a new deployment may then start
      ServingWarehouse.release(t)
      val qs2 = ServingWarehouse.start(
        docsIn.toDS().toDF("doc_id", "text"),
        pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      qs2.foreach(_.stop())
    } finally {
      dropWarehouse(t)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  /** Bootstrap a ServingWarehouse's tables as empty-sliced EXTERNAL
    * tables (fixing every bucket spec) under `base` — shared by the
    * E2E ingest test and the forget-between-batches pin.
    */
  private def bootstrapWarehouse(t: graft.jobs.ServingWarehouse.Tables,
                                 base: java.nio.file.Path): Unit = {
    import graft.ops.{Graph, TextAnalysis}
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .withColumn("slice", lit(0L))
    val noPairs = Seq.empty[(Long, Long)].toDF("src", "dst")
      .withColumn("slice", lit(0L))
    TextAnalysis.writeIndexStore(
      TextAnalysis.indexSlices(noDocs, "doc_id", "text", "slice"),
      t.index, buckets = 4, path = Some(base.resolve("idx").toString))
    TextAnalysis.writeIndexStore(
      TextAnalysis.positionalSlices(noDocs, "doc_id", "text", "slice"),
      t.positional, buckets = 4,
      path = Some(base.resolve("pidx").toString))
    graft.ops.Bucketing.writeBucketed(
      Graph.edgeSlices(noPairs, "src", "dst", "slice"),
      t.edges, Seq("src"), buckets = 4, sortCols = Seq("src"),
      path = Some(base.resolve("edges").toString))
    graft.ops.Bucketing.writeBucketed(
      TextAnalysis.collocSlices(noDocs, "text", "slice"),
      t.colloc, Seq("w1"), buckets = 4, sortCols = Seq("w1"),
      path = Some(base.resolve("colloc").toString))
    TextAnalysis.writeIndexStore(
      TextAnalysis.indexSlices(
        graft.Stores.chunkCids(noDocs).withColumn("slice", lit(0L)),
        "cid", "chunk", "slice"),
      t.chunks, buckets = 4,
      path = Some(base.resolve("chunks").toString))
    val noDict = TextAnalysis.dictSlices(
      TextAnalysis.indexSlices(noDocs, "doc_id", "text", "slice"))
    graft.ops.Bucketing.writeBucketed(noDict, t.dict,
      Seq("token"), buckets = 4, sortCols = Seq("token"),
      path = Some(base.resolve("dict").toString))
    graft.ops.Bucketing.writeBucketed(
      TextAnalysis.delneighSlices(noDict), t.delneigh,
      Seq("variant"), buckets = 4, sortCols = Seq("variant"),
      path = Some(base.resolve("delneigh").toString))
    graft.ops.Bucketing.writeBucketed(
      TextAnalysis.tgramSlices(noDict), t.tgram,
      Seq("gram"), buckets = 4, sortCols = Seq("gram"),
      path = Some(base.resolve("tgram").toString))
    Seq.empty[(Long, Long)].toDF("slice", "doc_id")
      .write.format("parquet")
      .option("path", base.resolve("deletes").toString)
      .saveAsTable(t.deletes)
    graft.ops.Bucketing.writeBucketed(
      graft.ops.Dedup.minhashBands(noDocs, "doc_id", "text")
        .withColumn("slice", lit(0L)),
      t.bands, Seq("band_hash"), buckets = 4,
      sortCols = Seq("band_hash"),
      path = Some(base.resolve("bands").toString))
    // vector family: train the fixed model on a 4-vector seed frame
    // (dim 8 → m=2 × subDim=4) and fix the empty code table's spec
    graft.jobs.ServingWarehouse.trainVectorModel(spark, t,
      seedVecs.toDF("vec_id", "embedding"),
      coarseIds = Seq(0L, 1L), initIds = Seq(0L, 1L),
      model = warehouseModel, buckets = 4, path = Some(base))
  }

  /** dim-8 seed/training vectors for the warehouse's vector family. */
  private def seedVecs: Seq[(Long, Array[Float])] =
    Seq(
      0L -> Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      1L -> Array(8f, 8f, 8f, 8f, 8f, 8f, 8f, 8f),
      2L -> Array(1f, 0f, 1f, 0f, 1f, 0f, 1f, 0f),
      3L -> Array(7f, 8f, 7f, 8f, 7f, 8f, 7f, 8f))

  private val warehouseModel =
    graft.jobs.ServingWarehouse.VectorModel(m = 2, subDim = 4)

  private def warehouseTables(prefix: String) =
    graft.jobs.ServingWarehouse.Tables(s"${prefix}_idx", s"${prefix}_pidx",
      s"${prefix}_edges", s"${prefix}_colloc", s"${prefix}_chunks",
      s"${prefix}_dict", s"${prefix}_delneigh", s"${prefix}_tgram",
      s"${prefix}_del", s"${prefix}_pq", s"${prefix}_pqcb",
      s"${prefix}_pqcoarse", s"${prefix}_bands")

  private def dropWarehouse(t: graft.jobs.ServingWarehouse.Tables): Unit = {
    graft.jobs.ServingWarehouse.release(t)
    for (tbl <- Seq(t.index, t.positional, t.edges, t.colloc, t.chunks,
        t.dict, t.delneigh, t.tgram, t.deletes, t.pq, t.pqcb,
        t.pqcoarse, t.bands,
        graft.jobs.ServingWarehouse.docIdsSidecar(t))) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_wm")
    }
  }

  test("ServingWarehouse end-to-end: concurrent doc+pair ingest; mid-stream q206/q209/q246 reads ≡ batch reads over the landed slices") {
    import graft.jobs.ServingWarehouse
    import graft.ops.{Behavior, Graph, TextAnalysis}
    val base = java.nio.file.Files.createTempDirectory("graft-sw-")
    val t = warehouseTables("graft_sw")
    val docs1 = Seq((1L, "a b a"), (2L, "b a b c"), (3L, "c a b"))
    val docs2 = Seq((4L, "a b"), (5L, "b c b c a b"),
      (6L, "steam stream esteem"))
    val pairs1 = Seq((10L, 11L), (11L, 12L), (10L, 11L))
    val pairs2 = Seq((10L, 12L), (10L, 11L), (12L, 11L))
    // the chunk frame the chunk-posting family ingests (docs here are
    // single-chunk; the pin is mid-stream ≡ batch, not multi-chunk
    // semantics — MiningSpec/RandomizedSpec carry those)
    def chunkCids(docs: Seq[(Long, String)]) =
      TextAnalysis.chunkWords(docs.toDF("doc_id", "text"), "doc_id",
          "text", chunkWords = 32, overlapWords = 8)
        .select(($"doc_id" * 100000L + $"chunk_id").as("cid"), $"chunk")
    try {
      bootstrapWarehouse(t, base)
      val docsIn = MemoryStream[(Long, String)]
      val pairsIn = MemoryStream[(Long, Long)]
      val qs = ServingWarehouse.start(
        docsIn.toDS().toDF("doc_id", "text"),
        pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      val terms = Seq(("a", "b")).toDF("w1", "w2")
      def readAll() = (
        ServingWarehouse.bm25Read(spark, t, maxPostings = 10, k = 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
        ServingWarehouse.phraseRead(spark, t, terms, k = 5)
          .as[(Long, Long, Long)].collect().toSet,
        ServingWarehouse.nextItemRead(spark, t, k = 2)
          .as[(Long, Long, Long, Long, Long)].collect().toSet,
        ServingWarehouse.prefixRead(spark, t, prefix = "b", k = 3)
          .as[(String, Long, Long)].collect().toSet,
        ServingWarehouse.expansionRead(spark, t, seed = "a", e = 2,
            minCount = 1L)
          .as[(Long, String)].collect().toSet,
        ServingWarehouse.passageRead(spark, t,
            Seq((0L, "a"), (1L, "c")).toDF("ord", "token"),
            nTerms = 2, k = 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
        ServingWarehouse.fuzzyRead(spark, t, term = "steam", k = 5)
          .as[(String, Long, Long, Long)].collect().toSet,
        ServingWarehouse.infixRead(spark, t, Seq("tea", "xyz"), k = 5)
          .as[(String, String, Long, Long)].collect().toSet)
      // the same read BODIES over slices derived from the landed data
      def expected(docs: Seq[(Long, String)], pairs: Seq[(Long, Long)]) = {
        val idx = TextAnalysis.indexSlices(docs.toDF("doc_id", "text")
          .withColumn("slice", lit(0L)), "doc_id", "text", "slice")
        val merged = TextAnalysis.indexMergeSlices(idx)
        val pidx = TextAnalysis.positionalSlices(
          docs.toDF("doc_id", "text").withColumn("slice", lit(0L)),
          "doc_id", "text", "slice")
        val eg = Graph.edgeSlices(pairs.toDF("src", "dst")
          .withColumn("slice", lit(0L)), "src", "dst", "slice")
        (TextAnalysis.bm25Query(TextAnalysis.cappedIndex(merged, 10),
            merged.agg(countDistinct($"doc_id").as("n_docs")), 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
         TextAnalysis.phraseQuery(
            TextAnalysis.positionalMergeSlices(pidx), terms, 5)
          .as[(Long, Long, Long)].collect().toSet,
         Behavior.nextItemFromCounts(Graph.edgeMerge(eg),
            "src", "dst", "w", 2)
          .as[(Long, Long, Long, Long, Long)].collect().toSet,
         TextAnalysis.prefixSearch(TextAnalysis.termDictionary(merged),
            "b", 3)
          .as[(String, Long, Long)].collect().toSet,
         TextAnalysis.expandTerms(
            TextAnalysis.collocationTableFrom(
              TextAnalysis.collocMergeSlices(
                TextAnalysis.collocSlices(docs.toDF("doc_id", "text")
                  .withColumn("slice", lit(0L)), "text", "slice")),
              minCount = 1L),
            "a", 2)
          .as[(Long, String)].collect().toSet,
         {
           val cm = TextAnalysis.indexMergeSlices(
             TextAnalysis.indexSlices(chunkCids(docs)
               .withColumn("slice", lit(0L)), "cid", "chunk", "slice"))
           TextAnalysis.passageSearch(
               TextAnalysis.cappedIndex(cm, 1000),
               cm.agg(countDistinct($"doc_id").as("n_chunks")),
               Seq((0L, "a"), (1L, "c")).toDF("ord", "token"),
               nTerms = 2, k = 5)
             .as[(Long, Long, Long, Double, Long)].collect().toSet
         },
         TextAnalysis.fuzzyTerms(
             TextAnalysis.deletionNeighborhood(
               TextAnalysis.termDictionary(merged)), "steam", 5)
           .as[(String, Long, Long, Long)].collect().toSet,
         TextAnalysis.infixSearch(
             TextAnalysis.trigramNeighborhood(
               TextAnalysis.termDictionary(merged)),
             Seq("tea", "xyz"), 5)
           .as[(String, String, Long, Long)].collect().toSet)
      }
      docsIn.addData(docs1: _*)
      pairsIn.addData(pairs1: _*)
      qs.foreach(_.processAllAvailable())
      val got1 = readAll()
      assert(got1 === expected(docs1, pairs1))
      assert(got1._1.nonEmpty && got1._2.nonEmpty && got1._3.nonEmpty
        && got1._4.nonEmpty && got1._5.nonEmpty && got1._6.nonEmpty)
      // second micro-batch lands while the queries stay up: the reads
      // now see both generations merged
      docsIn.addData(docs2: _*)
      pairsIn.addData(pairs2: _*)
      qs.foreach(_.processAllAvailable())
      val got2 = readAll()
      assert(got2 === expected(docs1 ++ docs2, pairs1 ++ pairs2))
      assert(got2 !== got1)   // the new generation actually moved results
      qs.foreach(_.stop())
      // foreachBatch is at-least-once: a REPLAYED batch (same id) must
      // be skipped by the slice-id guard, not double-appended — a
      // doubled slice would double every tf the sum-merge serves and
      // make the positional merge raise on duplicate positions
      graft.jobs.ServingWarehouse.ingestDocsBatch(
        docs2.toDF("doc_id", "text"), id = 1L, t, buckets = 4)
      graft.jobs.ServingWarehouse.ingestPairsBatch(
        pairs2.toDF("src", "dst"), id = 1L, t, buckets = 4)
      assert(readAll() === got2)
      // nightly maintenance: every family's micro-batch slices fold
      // into one target-sized generation; reads unchanged, the
      // manifest shrinks
      ServingWarehouse.compact(spark, t, targetRows = 1000000L,
        buckets = 4)
      assert(readAll() === got2)
      for (tbl <- Seq(t.index, t.positional, t.edges, t.colloc,
          t.chunks, t.dict, t.delneigh, t.tgram, t.bands))
        assert(spark.table(tbl).select($"slice").distinct().count()
          === 1L, s"$tbl slices not folded by compaction")
      // the durability contract SURVIVES the compaction boundary: the
      // rewrite re-tagged slice 1 away, so the live-slice probe alone
      // would let this replay double-apply — the `_wm` watermark
      // sidecar (folded ids recorded before the swap) must skip it
      // (VERDICT r19 item 1)
      graft.jobs.ServingWarehouse.ingestDocsBatch(
        docs2.toDF("doc_id", "text"), id = 1L, t, buckets = 4)
      graft.jobs.ServingWarehouse.ingestPairsBatch(
        pairs2.toDF("src", "dst"), id = 1L, t, buckets = 4)
      assert(readAll() === got2,
        "a batch replayed across a compaction boundary double-applied")
      for (tbl <- Seq(t.index, t.positional, t.edges, t.colloc,
          t.chunks, t.dict, t.delneigh, t.tgram, t.bands))
        assert(spark.table(tbl).select($"slice").distinct().count()
          === 1L, s"$tbl: post-compaction replay appended a new slice")
      // one-slice-per-doc contract at the door: re-sending a landed
      // doc under a NEW batch id must raise (silent df inflation in
      // the dictionary tier otherwise — ADVICE r19), not append
      val dupEx = intercept[IllegalStateException] {
        graft.jobs.ServingWarehouse.ingestDocsBatch(
          Seq((4L, "a b")).toDF("doc_id", "text"), id = 7L, t,
          buckets = 4)
      }
      assert(dupEx.getMessage.contains("already ingested"))
    } finally {
      dropWarehouse(t)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("ingestDocsBatch duplicate probe: doc_id-bucketed sidecar, bucket-pruned scan — the index store's id columns are not rescanned per batch") {
    import graft.jobs.ServingWarehouse
    val base = java.nio.file.Files.createTempDirectory("graft-swp-")
    val t = warehouseTables("graft_swprobe")
    try {
      bootstrapWarehouse(t, base)
      ServingWarehouse.ingestDocsBatch(
        Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text"),
        id = 0L, t, buckets = 4)
      ServingWarehouse.ingestDocsBatch(
        Seq((3L, "c d")).toDF("doc_id", "text"), id = 1L, t, buckets = 4)
      // the sidecar carries one (slice, doc_id) per landed doc
      val sidecar = ServingWarehouse.docIdsSidecar(t)
      assert(spark.table(sidecar).as[(Long, Long)].collect().toSet
        === Set((0L, 1L), (0L, 2L), (1L, 3L)))
      // plan pin (r20 verdict item 3): the probe's literal batch ids
      // prune the bucketed sidecar scan — and the only scan in the
      // probe IS the sidecar, never the posting-scale index store
      val probe = ServingWarehouse.dupProbe(spark, t, Seq(1L), id = 5L)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"duplicate probe not bucket-pruned:\n$plan")
      assert(plan.contains(sidecar),
        s"duplicate probe does not read the sidecar:\n$plan")
      assert("FileScan".r.findAllIn(plan).size === 1,
        s"duplicate probe scans more than the sidecar:\n$plan")
      // the raise is unchanged: a landed doc re-sent under a NEW batch
      // id still fails loudly
      val ex = intercept[IllegalStateException] {
        ServingWarehouse.ingestDocsBatch(
          Seq((1L, "a b")).toDF("doc_id", "text"), id = 5L, t,
          buckets = 4)
      }
      assert(ex.getMessage.contains("already ingested"))
      // a same-slice replay (partial-batch backfill) stays legal
      ServingWarehouse.ingestDocsBatch(
        Seq((3L, "c d")).toDF("doc_id", "text"), id = 1L, t, buckets = 4)
      assert(spark.table(sidecar).count() === 3L)
    } finally {
      dropWarehouse(t)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("ServingWarehouse forget between batches: the erasure cascade lands mid-stream and every family's read serves corpus-minus-F") {
    import graft.jobs.ServingWarehouse
    import graft.ops.TextAnalysis
    val base = java.nio.file.Files.createTempDirectory("graft-swf-")
    val t = warehouseTables("graft_swf")
    val docs1 = Seq((1L, "a b a steam"), (2L, "b a b c stream"),
      (3L, "c a b esteem"))
    val docs2 = Seq((4L, "a b steam"), (5L, "b c b c a b"))
    // doc 2 is the erasure request — its text as ingested (the
    // content-addressed tombstone contract)
    val forgotten = Seq((2L, "b a b c stream"))
    try {
      bootstrapWarehouse(t, base)
      val docsIn = MemoryStream[(Long, String)]
      val pairsIn = MemoryStream[(Long, Long)]
      val qs = ServingWarehouse.start(
        docsIn.toDS().toDF("doc_id", "text"),
        pairsIn.toDS().toDF("src", "dst"), t, buckets = 4)
      val terms = Seq(("a", "b")).toDF("w1", "w2")
      def readAll() = (
        ServingWarehouse.bm25Read(spark, t, maxPostings = 10, k = 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
        ServingWarehouse.phraseRead(spark, t, terms, k = 5)
          .as[(Long, Long, Long)].collect().toSet,
        ServingWarehouse.prefixRead(spark, t, prefix = "s", k = 5)
          .as[(String, Long, Long)].collect().toSet,
        ServingWarehouse.fuzzyRead(spark, t, term = "steam", k = 5)
          .as[(String, Long, Long, Long)].collect().toSet,
        ServingWarehouse.infixRead(spark, t, Seq("tea", "rea"), k = 5)
          .as[(String, String, Long, Long)].collect().toSet,
        ServingWarehouse.expansionRead(spark, t, seed = "a", e = 2,
            minCount = 1L)
          .as[(Long, String)].collect().toSet,
        ServingWarehouse.passageRead(spark, t,
            Seq((0L, "a"), (1L, "c")).toDF("ord", "token"),
            nTerms = 2, k = 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
        // admission-control dedup gate: a re-crawl of doc 2 probes the
        // live band store — flagged while doc 2 lives, silent after
        // its erasure
        ServingWarehouse.nearDupRead(spark, t,
            Seq((99L, "b a b c stream")).toDF("doc_id", "text"))
          .as[(Long, Long, Long)].collect().toSet)
      // the same read BODIES over slices from the surviving corpus
      def expected(docs: Seq[(Long, String)]) = {
        val d = docs.toDF("doc_id", "text").withColumn("slice", lit(0L))
        val merged = TextAnalysis.indexMergeSlices(
          TextAnalysis.indexSlices(d, "doc_id", "text", "slice"))
        val dict = TextAnalysis.termDictionary(merged)
        (TextAnalysis.bm25Query(TextAnalysis.cappedIndex(merged, 10),
            merged.agg(countDistinct($"doc_id").as("n_docs")), 5)
          .as[(Long, Long, Long, Double, Long)].collect().toSet,
         TextAnalysis.phraseQuery(
            TextAnalysis.positionalMergeSlices(
              TextAnalysis.positionalSlices(d, "doc_id", "text",
                "slice")),
            terms, 5)
          .as[(Long, Long, Long)].collect().toSet,
         TextAnalysis.prefixSearch(dict, "s", 5)
          .as[(String, Long, Long)].collect().toSet,
         TextAnalysis.fuzzyTerms(
            TextAnalysis.deletionNeighborhood(dict), "steam", 5)
          .as[(String, Long, Long, Long)].collect().toSet,
         TextAnalysis.infixSearch(
            TextAnalysis.trigramNeighborhood(dict), Seq("tea", "rea"), 5)
          .as[(String, String, Long, Long)].collect().toSet,
         TextAnalysis.expandTerms(
            TextAnalysis.collocationTableFrom(
              TextAnalysis.collocMergeSlices(
                TextAnalysis.collocSlices(d, "text", "slice")),
              minCount = 1L),
            "a", 2)
          .as[(Long, String)].collect().toSet,
         {
           val cm = TextAnalysis.indexMergeSlices(
             TextAnalysis.indexSlices(
               graft.Stores.chunkCids(docs.toDF("doc_id", "text"))
                 .withColumn("slice", lit(0L)),
               "cid", "chunk", "slice"))
           TextAnalysis.passageSearch(
               TextAnalysis.cappedIndex(cm, 1000),
               cm.agg(countDistinct($"doc_id").as("n_chunks")),
               Seq((0L, "a"), (1L, "c")).toDF("ord", "token"),
               nTerms = 2, k = 5,
               chunkKeyBase = graft.Stores.ChunkKeyBase)
             .as[(Long, Long, Long, Double, Long)].collect().toSet
         },
         graft.ops.Dedup.nearDupAgainstStore(
             Seq((99L, "b a b c stream")).toDF("doc_id", "text"),
             "doc_id", "text",
             graft.ops.Dedup.minhashBands(docs.toDF("doc_id", "text"),
               "doc_id", "text"))
           .as[(Long, Long, Long)].collect().toSet)
      }
      docsIn.addData(docs1: _*)
      qs.foreach(_.processAllAvailable())
      val first = readAll()
      assert(first === expected(docs1))
      assert(first._8.exists(_._2 == 2L)) // the re-crawl IS flagged
      // the erasure request lands BETWEEN batches (negative slice id —
      // never collides with a micro-batch id)
      ServingWarehouse.forgetApply(spark, t,
        forgotten.toDF("doc_id", "text"), id = -1L, buckets = 4)
      val afterForget = readAll()
      assert(afterForget === expected(docs1.filterNot(_._1 == 2L)))
      assert(afterForget._8.isEmpty) // the admission gate went silent
      // stream continues: the next generation lands on top of the
      // tombstones and reads serve (docs1 ∪ docs2) minus the request
      docsIn.addData(docs2: _*)
      qs.foreach(_.processAllAvailable())
      assert(readAll() ===
        expected((docs1 ++ docs2).filterNot(_._1 == 2L)))
      qs.foreach(_.stop())
      // at-least-once: a REPLAYED erasure (same request id) must be
      // skipped by the slice guard, not double-applied (a doubled
      // tombstone would drive merged tf negative and raise)
      ServingWarehouse.forgetApply(spark, t,
        forgotten.toDF("doc_id", "text"), id = -1L, buckets = 4)
      assert(readAll() ===
        expected((docs1 ++ docs2).filterNot(_._1 == 2L)))
      // compaction whose plan SEPARATES the tombstone slice from its
      // matching ingest slices (targetRows=1 → one bin per slice, so
      // the negative-id slice bins alone): the partial per-bin merges
      // must preserve the tombstone rows instead of raising
      // "tombstone without matching ingest" (ADVICE r19), and every
      // read stays identical — the cancellation happens at the
      // read-time global merge exactly as before
      ServingWarehouse.compact(spark, t, targetRows = 1L, buckets = 4)
      assert(readAll() ===
        expected((docs1 ++ docs2).filterNot(_._1 == 2L)),
        "tombstone-separating compaction changed a read")
      // the ERASURE replayed across the compaction boundary: the
      // tombstone slice was folded (re-tagged), so only the `_wm`
      // sidecar stands between this replay and a doubled tombstone
      // (which would drive merged tf negative and raise at read)
      ServingWarehouse.forgetApply(spark, t,
        forgotten.toDF("doc_id", "text"), id = -1L, buckets = 4)
      assert(readAll() ===
        expected((docs1 ++ docs2).filterNot(_._1 == 2L)))
      // compaction AFTER an erasure folds the tombstones away: the
      // rewritten generations physically hold corpus-minus-F (the
      // erased doc's rows cancel into nothing; the positional rewrite
      // drops them through the log) and every read stays identical
      ServingWarehouse.compact(spark, t, targetRows = 1000000L,
        buckets = 4)
      assert(readAll() ===
        expected((docs1 ++ docs2).filterNot(_._1 == 2L)))
      assert(spark.table(t.positional).filter($"doc_id" === 2L).isEmpty)
    } finally {
      dropWarehouse(t)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("ServingWarehouse vector family: mid-stream pqIngest at the fixed model; ann/ivf reads after batch N ≡ a one-shot encode of the first N batches; erasure via the delete log") {
    import graft.jobs.ServingWarehouse
    import graft.ops.Pq
    val base = java.nio.file.Files.createTempDirectory("graft-swv-")
    val t = warehouseTables("graft_swv")
    val m = warehouseModel
    val batch1 = Seq(
      10L -> Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f),
      11L -> Array(7f, 7f, 7f, 7f, 8f, 8f, 8f, 8f),
      12L -> Array(0f, 1f, 0f, 1f, 1f, 0f, 1f, 0f))
    val batch2 = Seq(
      13L -> Array(2f, 2f, 2f, 2f, 2f, 2f, 2f, 2f),
      14L -> Array(6f, 6f, 6f, 6f, 6f, 6f, 6f, 6f))
    val docsFor = Map(10L -> "a b", 11L -> "c d", 12L -> "a c",
      13L -> "b d", 14L -> "d a")
    val queries = Seq(2L, 3L) // query vectors ride the request frame
    def qFrame = seedVecs.toDF("vec_id", "embedding")
    try {
      bootstrapWarehouse(t, base)
      val docsIn = MemoryStream[(Long, String)]
      val pairsIn = MemoryStream[(Long, Long)]
      val vecsIn = MemoryStream[(Long, Array[Float])]
      val qs = ServingWarehouse.start(
        docsIn.toDS().toDF("doc_id", "text"),
        pairsIn.toDS().toDF("src", "dst"), t, buckets = 4,
        vecs = Some(vecsIn.toDS().toDF("vec_id", "embedding")))
      // the reads derive the model from the WRITTEN codebooks
      assert(ServingWarehouse.readModel(spark, t) === m)
      def readAnn() = ServingWarehouse.annRead(spark, t, qFrame,
          queries, k = 3)
        .as[(Long, Long, Double, Long)].collect().toSet
      def readIvf() = ServingWarehouse.ivfRead(spark, t, qFrame,
          queries, k = 2, nprobe = 1)
        .as[(Long, Long, Double, Long)].collect().toSet
      // one-shot encode of the same vectors at the SAME fixed model —
      // minus any erased ids (the id-addressed delete contract)
      def expectedAnn(vecs: Seq[(Long, Array[Float])]) =
        Pq.adcSearchCoded(
            Pq.codeRows(vecs.toDF("vec_id", "embedding"), "vec_id",
              "embedding", spark.table(t.pqcb), spark.table(t.pqcoarse),
              m.m, m.subDim),
            qFrame, "vec_id", "embedding", spark.table(t.pqcb),
            queries, 3, m.m, m.subDim)
          .as[(Long, Long, Double, Long)].collect().toSet
      def expectedIvf(vecs: Seq[(Long, Array[Float])]) =
        Pq.adcSearchProbed(
            Pq.codeRows(vecs.toDF("vec_id", "embedding"), "vec_id",
              "embedding", spark.table(t.pqcb), spark.table(t.pqcoarse),
              m.m, m.subDim),
            qFrame, "vec_id", "embedding", spark.table(t.pqcoarse),
            spark.table(t.pqcb), queries, 2, 1, m.m, m.subDim)
          .as[(Long, Long, Double, Long)].collect().toSet
      vecsIn.addData(batch1: _*)
      docsIn.addData(batch1.map { case (id, _) => (id, docsFor(id)) }: _*)
      qs.foreach(_.processAllAvailable())
      val got1 = readAnn()
      assert(got1 === expectedAnn(batch1) && got1.nonEmpty)
      assert(readIvf() === expectedIvf(batch1))
      vecsIn.addData(batch2: _*)
      docsIn.addData(batch2.map { case (id, _) => (id, docsFor(id)) }: _*)
      qs.foreach(_.processAllAvailable())
      val all = batch1 ++ batch2
      assert(readAnn() === expectedAnn(all))
      assert(readIvf() === expectedIvf(all))
      qs.foreach(_.stop())
      // erasure request for doc/vector 11 — the ONE cascade call
      // erases the text families by tombstone AND the code table by
      // the id log; both serve corpus-minus-11 afterwards
      ServingWarehouse.forgetApply(spark, t,
        Seq((11L, docsFor(11L))).toDF("doc_id", "text"), id = -7L,
        buckets = 4)
      val survivors = all.filterNot(_._1 == 11L)
      assert(readAnn() === expectedAnn(survivors))
      assert(readIvf() === expectedIvf(survivors))
      assert(!readAnn().exists(_._2 == 11L))
      // nightly maintenance folds the code-table generations like the
      // band family (id-addressed rows: re-tag survivors, the delete
      // log drops erased vec_ids physically); reads identical
      ServingWarehouse.compact(spark, t, targetRows = 1000000L,
        buckets = 4)
      assert(readAnn() === expectedAnn(survivors))
      assert(readIvf() === expectedIvf(survivors))
      assert(spark.table(t.pq).select($"slice").distinct().count() === 1L,
        "pq code-table slices not folded by compaction")
      assert(spark.table(t.pq).filter($"vec_id" === 11L).isEmpty,
        "erased vec_id survived the compaction rewrite")
      // a pre-compaction vector batch replayed AFTER the fold: the
      // `_wm` sidecar must skip it (its slice tag is gone)
      ServingWarehouse.ingestVecsBatch(
        batch1.toDF("vec_id", "embedding"), id = 0L, t, buckets = 4)
      assert(readAnn() === expectedAnn(survivors),
        "pre-compaction vector batch replayed after the fold double-applied")
      // drift monitor: one reconstruction-statistics row off the
      // WRITTEN model — the retrain trigger an operator trends
      val audit = ServingWarehouse.vectorModelAudit(spark, t,
          survivors.toDF("vec_id", "embedding"))
        .as[(Long, Double, Double)].head()
      assert(audit._1 === survivors.size.toLong
        && audit._2 >= 0.0 && audit._3 >= 0.0)
      // RETRAIN at model B (fresh seeds from the live corpus): new
      // codebooks trained on the SURVIVORS, the code table re-encoded
      // from them as one fresh generation, the superseded generations
      // watermarked. The expected-read helpers resolve the model
      // tables at call time, so they now recompute a ONE-SHOT encode
      // at model B — the retrain-≡-rebuild identity
      ServingWarehouse.retrain(spark, t,
        trainVecs = all.toDF("vec_id", "embedding"),
        rawVecs = all.toDF("vec_id", "embedding"),
        coarseIds = Seq(10L, 14L), initIds = Seq(10L, 12L, 13L, 14L),
        model = m, buckets = 4)
      assert(ServingWarehouse.readModel(spark, t) === m)
      assert(readAnn() === expectedAnn(survivors))
      assert(readIvf() === expectedIvf(survivors))
      // the PRE-retrain erasure persists across the rewrite — both
      // logically (reads) and physically (the re-encode never saw 11)
      assert(!readAnn().exists(_._2 == 11L),
        "pre-retrain erasure resurrected by the model rewrite")
      assert(spark.table(t.pq).filter($"vec_id" === 11L).isEmpty)
      // a PRE-retrain batch replayed after the bump: its vectors are
      // already inside the re-encode, so only the `_wm` watermark
      // stands between the replay and doubled code rows
      ServingWarehouse.ingestVecsBatch(
        batch2.toDF("vec_id", "embedding"), id = 1L, t, buckets = 4)
      assert(readAnn() === expectedAnn(survivors),
        "pre-retrain batch replayed after retrain double-applied")
    } finally {
      dropWarehouse(t)
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("streaming index ingest: append-only files per batch; merged read ≡ corpus rescan incl. a doc split across batches") {
    // the exact-index member of the store triad: indexIngest inside
    // foreachBatch is the SAME code path (indexSlices) as batch build,
    // so per-batch ingest must land the one-shot store; each batch
    // only ADDS bucket files (history never re-read or rewritten), and
    // the append-log case — ONE doc's text arriving across TWO
    // micro-batches — must merge to what a full-corpus rescan sees
    import graft.ops.TextAnalysis
    val base = java.nio.file.Files.createTempDirectory("graft-idx-stream-")
    try {
      val history = Seq((10L, "x y x"), (11L, "y z")).toDF("doc_id", "text")
      TextAnalysis.writeIndexStore(
        TextAnalysis.indexSlices(history.withColumn("slice", lit(0L)),
          "doc_id", "text", "slice"),
        table = "graft_idx_stream", buckets = 4,
        path = Some(base.resolve("idx").toString))
      def dataFiles() = {
        val walk = java.nio.file.Files.walk(base.resolve("idx"))
        try walk
          .filter(p => p.toString.endsWith(".parquet"))
          .map[(String, Long)](p =>
            (p.toString, java.nio.file.Files.getLastModifiedTime(p).toMillis))
          .toArray.toSeq
        finally walk.close()
      }
      val snapshots = scala.collection.mutable.ListBuffer(dataFiles())
      val input = MemoryStream[(Long, String)]
      val q = input.toDS().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          TextAnalysis.indexIngest(batch.withColumn("slice", lit(id + 1)),
            "doc_id", "text", "slice", table = "graft_idx_stream",
            buckets = 4)
          snapshots += dataFiles(): Unit
        }.start()
      input.addData((1L, "a b"), (2L, "a b b"))
      q.processAllAvailable()
      input.addData((1L, "a c a"), (3L, "c c c c"), (4L, "a"))
      q.processAllAvailable()
      q.stop()
      assert(snapshots.size === 3)
      for ((before, after) <- snapshots.toList.zip(snapshots.toList.tail)) {
        assert(after.toSet.intersect(before.toSet) === before.toSet,
          s"a micro-batch rewrote history files:\nbefore=$before\nafter=$after")
        assert(after.size > before.size, "a micro-batch added no files")
      }
      val store = spark.table("graft_idx_stream")
      // the token-bucketed layout makes the tf-sum merge zero-Exchange
      val merged = TextAnalysis.indexMergeSlices(store)
      val p = merged.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(!p.contains("Exchange"),
        s"bucketed store merge shuffled:\n$p")
      val fromStore = TextAnalysis.cappedIndex(merged, maxPostings = 2)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      val corpus = Seq((10L, "x y x"), (11L, "y z"),
        (1L, "a b a c a"), // batch 0 "a b" ++ batch 1 "a c a"
        (2L, "a b b"), (3L, "c c c c"), (4L, "a")).toDF("doc_id", "text")
      val rescan = TextAnalysis.invertedIndex(corpus, "doc_id", "text",
          maxPostings = 2)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(fromStore === rescan && fromStore.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_idx_stream")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("streaming SCD2 maintenance: per-batch scd2Apply ≡ one-shot scd2; an out-of-order slice raises") {
    // the versioned-dimension member of the temporal family: each
    // micro-batch folds into the dimension via scd2Apply (ONE code
    // path with the batch build — closed history passes through
    // untouched, only current versions re-enter), so the streamed
    // dimension cannot drift from a full-log rebuild
    import graft.ops.Scd
    val dim = scala.collection.mutable.ArrayBuffer[
      (Long, String, Long, Option[Long], Boolean, Long)]()
    def dimDf() = dim.toSeq
      .toDF("key", "state", "vf", "vt", "is_current", "version")
      .select($"key", $"state", timestamp_seconds($"vf").as("valid_from"),
        timestamp_seconds($"vt").as("valid_to"), $"is_current", $"version")
    def fold(batch: org.apache.spark.sql.DataFrame): Unit = {
      val b = batch.select($"key", $"ts", $"id".as("tie"),
        $"eventType".as("st"))
      val next =
        if (dim.isEmpty) Scd.scd2(b, "key", "ts", "tie", "st")
        else Scd.scd2Apply(dimDf(), b, "key", "ts", "tie", "st")
      val rows = next.select($"key", $"state", unix_timestamp($"valid_from"),
          unix_timestamp($"valid_to"), $"is_current", $"version")
        .as[(Long, String, Long, Option[Long], Boolean, Long)].collect()
      dim.clear()
      dim ++= rows: Unit
    }
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        fold(batch.toDF())
      }.start()
    val all = Seq(
      KeyedEvent(1, ts(100), "view", 1), KeyedEvent(1, ts(200), "click", 2),
      KeyedEvent(2, ts(100), "view", 3),
      // batch 2: key 1 no-op repeat (collapses into the current
      // version), then a real change; key 3 appears
      KeyedEvent(1, ts(300), "click", 4), KeyedEvent(1, ts(400), "view", 5),
      KeyedEvent(2, ts(350), "click", 6), KeyedEvent(3, ts(50), "view", 7))
    input.addData(all.take(3): _*)
    q.processAllAvailable()
    input.addData(all.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val oneShot = Scd.scd2(
        all.toDF().select($"key", $"ts", $"id".as("tie"),
          $"eventType".as("st")),
        "key", "ts", "tie", "st")
      .select($"key", $"state", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"is_current", $"version")
      .as[(Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSet
    assert(dim.toSet === oneShot && dim.nonEmpty)
    // the no-op repeat really collapsed: key 1 versions are
    // view@100 → click@200 → view@400, never a click@300 version
    assert(dim.count(_._1 === 1L) === 3)
    // an out-of-order slice — key 2 change PREDATING its current
    // version — must raise, not rewrite history
    val input2 = MemoryStream[KeyedEvent]
    val q2 = input2.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        fold(batch.toDF())
      }.start()
    input2.addData(KeyedEvent(2, ts(120), "error", 8))
    val ex = intercept[Exception] { q2.processAllAvailable() }
    assert(ex.getMessage.contains("scd2Apply") ||
      ex.getCause != null && ex.getCause.getMessage.contains("scd2Apply"))
    q2.stop()
  }

  test("streaming positional ingest: append-only files per batch; merged read ≡ rescan incl. a doc split across batches with offsets") {
    // the positional member of the store triad: positionalIngest
    // inside foreachBatch is the SAME code path (positionalSlices) as
    // batch build; a doc whose text continues in a later micro-batch
    // carries its start OFFSET, so the merged position arrays are
    // exactly what a full-corpus rescan assigns
    import graft.ops.TextAnalysis
    val base = java.nio.file.Files.createTempDirectory("graft-pidx-stream-")
    try {
      TextAnalysis.writeIndexStore(
        TextAnalysis.positionalSlices(
          Seq((10L, "x y x", 0)).toDF("doc_id", "text", "off")
            .withColumn("slice", lit(0L)),
          "doc_id", "text", "slice", offsetCol = Some("off")),
        table = "graft_pidx_stream", buckets = 4,
        path = Some(base.resolve("pidx").toString))
      def dataFiles() = {
        val walk = java.nio.file.Files.walk(base.resolve("pidx"))
        try walk.filter(_.toString.endsWith(".parquet"))
          .map[String](_.toString).toArray.toSeq
        finally walk.close()
      }
      val snapshots = scala.collection.mutable.ListBuffer(dataFiles())
      val input = MemoryStream[(Long, String, Int)]
      val q = input.toDS().toDF("doc_id", "text", "off").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          TextAnalysis.positionalIngest(
            batch.withColumn("slice", lit(id + 1)),
            "doc_id", "text", "slice", table = "graft_pidx_stream",
            buckets = 4, offsetCol = Some("off"))
          snapshots += dataFiles(): Unit
        }.start()
      input.addData((1L, "a b", 0), (2L, "a b b", 0))
      q.processAllAvailable()
      // doc 1's text CONTINUES: "a c a" starts at global position 2
      input.addData((1L, "a c a", 2), (3L, "c c", 0))
      q.processAllAvailable()
      q.stop()
      assert(snapshots.size === 3)
      for ((before, after) <- snapshots.toList.zip(snapshots.toList.tail)) {
        assert(after.toSet.intersect(before.toSet) === before.toSet,
          "a micro-batch rewrote history files")
        assert(after.size > before.size, "a micro-batch added no files")
      }
      val merged = TextAnalysis.positionalMergeSlices(
        spark.table("graft_pidx_stream"))
      val p = merged.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      assert(!p.contains("Exchange"), s"bucketed store merge shuffled:\n$p")
        val fromStore = merged.as[(String, Long, Long, Seq[Int])].collect().toSet
      val rescan = TextAnalysis.positionalPostings(
          Seq((10L, "x y x"), (1L, "a b a c a"), (2L, "a b b"),
            (3L, "c c")).toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(String, Long, Long, Seq[Int])].collect().toSet
      assert(fromStore === rescan && fromStore.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pidx_stream")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("streaming hourly-count warehouse: an hour split across batches sums; spike read ≡ batch") {
    // the exact-counter member of the store families: per-batch
    // hourCountSlices (slice = batch id), sum-merge, and the SAME
    // spike body reads the store — so the streamed warehouse cannot
    // drift from the one-shot trafficSpikes pass
    import graft.ops.Behavior
    val store =
      scala.collection.mutable.ArrayBuffer[(Long, String, Timestamp, Long)]()
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store ++= Behavior.hourCountSlices(
            batch.withColumn("slice", lit(id)), "eventType", "ts", "slice")
          .select($"slice", $"series", $"bucket", $"cnt")
          .as[(Long, String, Timestamp, Long)].collect(): Unit
      }.start()
    // hour 0: 10 events, hour 1: 30, hour 2: 5 — hour 1 SPLITS across
    // the two micro-batches (12 + 18)
    val rows = (1 to 10).map(i => KeyedEvent(i, ts(i * 10), "view", i)) ++
      (1 to 30).map(i => KeyedEvent(i, ts(3600 + i * 10), "view", i)) ++
      (1 to 5).map(i => KeyedEvent(i, ts(7200 + i * 10), "view", i))
    input.addData(rows.take(22): _*)
    q.processAllAvailable()
    input.addData(rows.drop(22): _*)
    q.processAllAvailable()
    q.stop()
    assert(store.map(_._1).distinct.size >= 2) // really multiple slices
    // the split hour landed rows in BOTH slices
    assert(store.count(_._3 === ts(3600)) === 2)
    val merged = Behavior.hourCountMerge(
      store.toSeq.toDF("slice", "series", "bucket", "cnt"))
    def flags(df: org.apache.spark.sql.DataFrame) = df
      .select($"series", $"bucket", $"cnt", $"trailing_n",
        $"trailing_sum", $"is_spike")
      .as[(String, Timestamp, Long, Long, Long, Boolean)].collect().toSet
    val viaStore = flags(
      Behavior.trafficSpikesFromCounts(merged, trailing = 2, threshold = 2L))
    val oneShot = flags(Behavior.trafficSpikes(rows.toDF(), "eventType",
      "ts", trailing = 2, threshold = 2L))
    assert(viaStore === oneShot && viaStore.nonEmpty)
    // and the split hour really is the spike the read reports
    assert(viaStore.exists(r => r._3 === 30L && r._6))
  }

  test("streaming edge-warehouse ingest: per-batch edge slices accumulate, merge ≡ one-pass; next-item read agrees") {
    // the graph member of the store families: the pair stream (the
    // ingest pipeline's transition derivation) folds per micro-batch
    // through edgeSlices (slice = batch id), the count merge is
    // associative, and the SAME nextItemFromCounts body reads the
    // store — so the streamed edge warehouse cannot drift from a
    // one-pass derivation
    import graft.ops.{Behavior, Graph}
    val store =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val input = MemoryStream[(Long, Long)]
    val q = input.toDS().toDF("item", "nxt").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store ++= Graph.edgeSlices(batch.withColumn("slice", lit(id)),
            "item", "nxt", "slice")
          .select($"slice", $"src", $"dst", $"w")
          .as[(Long, Long, Long, Long)].collect(): Unit
      }.start()
    // the (1→2) edge arrives in BOTH micro-batches — counts must sum
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 3L), (1L, 3L),
      (1L, 2L), (3L, 1L), (2L, 3L), (2L, 1L))
    input.addData(pairs.take(4): _*)
    q.processAllAvailable()
    input.addData(pairs.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    assert(store.map(_._1).distinct.size >= 2) // really multiple slices
    assert(store.count(p => p._2 === 1L && p._3 === 2L) === 2)
    val merged = Graph.edgeMerge(
      store.toSeq.toDF("slice", "src", "dst", "w"))
    def table(counts: org.apache.spark.sql.DataFrame) =
      Behavior.nextItemFromCounts(counts, "src", "dst", "w", k = 2)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val onePass = pairs.toDF("item", "nxt")
      .groupBy($"item".as("src"), $"nxt".as("dst"))
      .agg(count(lit(1)).as("w"))
    assert(table(merged) === table(onePass) && table(merged).nonEmpty)
    // and the summed edge really serves: 1→2 dominates 1's successors
    assert(table(merged).contains((1L, 1L, 2L, 3L, 750000L)))
  }

  test("streaming Bloom-warehouse ingest: per-batch slices accumulate, merge ≡ full rescan; members hit") {
    // the membership member rides the same foreachBatch slice loop as
    // KMV/HIST: each micro-batch writes its own bit-vector rows (slice
    // = batch id), history never re-scanned, and an OR-merge at any
    // point answers exactly like a batch pass — bits are ORs
    import graft.ops.SketchStore
    val store =
      scala.collection.mutable.ArrayBuffer[(String, Long, Seq[Long], Int, Int)]()
    val input = MemoryStream[KeyedEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        store ++= SketchStore.bloomSlices(
            batch.withColumn("slice", lit(id)),
            Seq("eventType"), "slice", $"key".cast("string"), mBits = 256)
          .select($"eventType", $"slice", $"bits", $"m_bits", $"k_hashes")
          .as[(String, Long, Seq[Long], Int, Int)].collect(): Unit
      }.start()
    val rows = (1 to 40).map(i =>
      KeyedEvent(i % 11, ts(i * 10), if (i % 2 == 0) "view" else "click", i))
    input.addData(rows.take(15): _*)
    q.processAllAvailable()
    input.addData(rows.drop(15): _*)
    q.processAllAvailable()
    q.stop()
    assert(store.map(_._2).distinct.size >= 2) // really multiple slices
    val merged = SketchStore.bloomMergeSlices(
        store.toSeq.toDF("eventType", "slice", "bits", "m_bits", "k_hashes"),
        Seq("eventType"), mBits = 256)
    val mergedBits = merged.select($"eventType", $"bits")
      .as[(String, Seq[Long])].collect().toMap
    val full = rows.toDF()
      .groupBy($"eventType")
      .agg(graft.functions.TypedAggs.bloomBits($"key".cast("string"), 256)
        .as("bits"))
      .as[(String, Seq[Long])].collect().toMap
    assert(mergedBits === full)
    // and every streamed member probes TRUE against the merged store
    val hits = rows.toDF().select($"eventType", $"key".cast("string").as("v"))
      .distinct()
      .join(merged.select($"eventType", $"bits"), "eventType")
      .select(SketchStore.bloomContains($"bits", $"v", 256).as("hit"))
      .as[Boolean].collect()
    assert(hits.nonEmpty && hits.forall(identity))
  }

  test("mergeable sketches ride streaming windows unchanged: KMV + CMS per window ≡ batch") {
    // the whole point of merge-order-independent sketch state: the SAME
    // udaf drops into a watermarked streaming window and produces the
    // batch answer, whatever the micro-batch arrival slicing
    import graft.functions.TypedAggs
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "60 seconds"))
      .agg(TypedAggs.kmvDistinct($"key".cast("string")).as("kmv"),
        TypedAggs.countMin($"key".cast("string")).as("cms"))
      .select(unix_timestamp($"window.start").as("w"), $"kmv",
        $"cms.counts".as("cms_counts"))
    val rows = Seq(
      KeyedEvent(1, ts(10), "view", 1), KeyedEvent(2, ts(20), "view", 2),
      KeyedEvent(1, ts(30), "view", 3), KeyedEvent(3, ts(40), "view", 4),
      KeyedEvent(5, ts(70), "view", 5), KeyedEvent(5, ts(80), "view", 6))
    val input = MemoryStream[KeyedEvent]
    val q = agg(input.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.outputMode("append").format("memory").queryName("sk").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    input.addData(KeyedEvent(9, ts(200), "view", 9)) // close both windows
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sk").filter($"w" < 120)
      .as[(Long, Double, Seq[Long])].collect().toSet
    val batch = agg(rows.toDF()).as[(Long, Double, Seq[Long])].collect().toSet
    assert(streamed === batch)
    assert(streamed.find(_._1 == 0L).get._2 === 3.0) // KMV exact below k
  }

  test("StreamingDrift: frozen cuts, batch ≡ streaming histograms, Drift bucket parity") {
    import graft.streaming.StreamingDrift
    // reference 1..100 → cuts exactly 10,20,...,90
    val ref = (1L to 100L).map(i => (i, i)).toDF("id", "m")
    val cuts = StreamingDrift.freezeCuts(ref, "id", "m")
    assert(cuts === (1L to 9L).map(_ * 10L))
    // arriving metrics across two windows: w0 = {5, 10, 11, 95}
    // → buckets {1, 1, 2, 10}; w60 = {55} → bucket 6
    val arriving = Seq((ts(10), 5L), (ts(20), 10L), (ts(30), 11L),
      (ts(40), 95L), (ts(70), 55L))
    val input = MemoryStream[(Timestamp, Long)]
    val q = StreamingDrift.windowedHistogram(
        input.toDF().toDF("ts", "m").withWatermark("ts", "0 seconds"),
        "ts", "m", cuts, "60 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sd").start()
    input.addData(arriving.take(3): _*)
    q.processAllAvailable()
    input.addData(arriving.drop(3): _*)
    q.processAllAvailable()
    input.addData((ts(200), 1L)) // advance watermark past both windows
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sd")
      .as[(Long, Long, Long)].collect().toSet
    val batch = StreamingDrift.windowedHistogram(
        arriving.toDF("ts", "m"), "ts", "m", cuts, "60 seconds")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch) // one code path, two modes
    assert(streamed === Set((0L, 1L, 2L), (0L, 2L, 1L), (0L, 10L, 1L),
      (60L, 6L, 1L)))
    // bucket parity with the batch Drift op on the same rows
    val drift = graft.ops.Drift.histogramShift(ref,
        arriving.zipWithIndex.map { case ((_, m), i) => (i.toLong, m) }
          .toDF("id", "m"), "id", "m")
      .filter($"cnt_cmp" > 0).select($"bucket", $"cnt_cmp")
      .as[(Long, Long)].collect().toSet
    assert(drift === Set((1L, 2L), (2L, 1L), (6L, 1L), (10L, 1L)))
    // fractional metrics are REJECTED (ADVICE r12): freezeCuts would
    // long-truncate them while windowedHistogram buckets raw values —
    // a silent batch/streaming cut divergence
    val err = intercept[IllegalArgumentException] {
      StreamingDrift.freezeCuts(
        Seq((1L, 0.5), (2L, 1.5)).toDF("id", "m"), "id", "m")
    }
    assert(err.getMessage.contains("integral"))
  }

  test("StreamingSessions: gap-closed sessions emit item sequences, batch ≡ streaming") {
    import graft.streaming.StreamingSessions
    val rows = Seq(
      (1L, ts(100), 1L, 11L), (2L, ts(200), 1L, 12L),
      (3L, ts(2000), 1L, 13L), // gap exactly 1800 → MERGES (strict > rule)
      (5L, ts(3801), 1L, 14L), // gap 1801 > 1800 → new session
      (4L, ts(150), 2L, 21L))
    val input = MemoryStream[(Long, Timestamp, Long, Long)]
    val q = StreamingSessions.sessionSequences(
        input.toDF().toDF("event_id", "ts", "user_id", "item_id")
          .withWatermark("ts", "0 seconds"),
        "user_id", "item_id", "ts", "event_id")
      .writeStream.outputMode("append").format("memory").queryName("ss").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    input.addData((9L, ts(10000), 9L, 99L)) // advance watermark, close all
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss").filter($"user_id" < 9)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // the IDENTICAL code path on the batch frame — one plan, two modes
    val batch = StreamingSessions.sessionSequences(
        rows.toDF("event_id", "ts", "user_id", "item_id"),
        "user_id", "item_id", "ts", "event_id")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(streamed === batch)
    // hand-traced: the event at 2000 lands exactly on session 1's close
    // (200 + 1800) and MERGES, extending it to [100, 3800); the event
    // at 3801 exceeds the gap strictly and opens session 2
    assert(streamed === Set(
      (1L, 100L, 3800L, 3L, "11 12 13"),
      (1L, 3801L, 5601L, 1L, "14"),
      (2L, 150L, 1950L, 1L, "21")))
  }

  test("streaming FIM transform: the per-document training map runs stateless on a stream, ≡ batch") {
    import graft.ops.TextAnalysis
    val rows = Seq((1L, "alpha beta gamma delta"), (2L, "one two three"),
      (3L, "lorem ipsum dolor sit amet"), (4L, ""))
    val input = MemoryStream[(Long, String)]
    val q = TextAnalysis.fimTransform(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.outputMode("append").format("memory").queryName("fim").start()
    input.addData(rows.take(2): _*)
    q.processAllAvailable()
    input.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fim")
      .as[(Long, Boolean, String, String, String, String)].collect().toSet
    val batch = TextAnalysis.fimTransform(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Boolean, String, String, String, String)].collect().toSet
    assert(streamed === batch) // one code path, two modes
    assert(streamed.size === 4)
  }

  test("streaming image decode: the real-codec map runs stateless on a stream, ≡ batch") {
    import graft.ops.Multimodal
    // encode → decode as stateless per-row maps on a live stream (no
    // watermark, no state store — the multimodal ingest posture)
    val input = MemoryStream[Long]
    val q = Multimodal.decodeImageFeatures(
        Multimodal.imageRecords(input.toDF().toDF("doc_id"), "doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("img").start()
    input.addData(12L, 13L)
    q.processAllAvailable()
    input.addData(14L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("img")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect().toSet
    val batch = Multimodal.decodeImageFeatures(
        Multimodal.imageRecords(Seq(12L, 13L, 14L).toDF("doc_id"), "doc_id"))
      .as[(Long, Boolean, Long, Long, Long, Long)]
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.forall(_._2)) // every synthesized payload decodes
  }

  test("streaming audio decode + fingerprint: the real-codec maps run stateless on a stream, ≡ batch") {
    import graft.ops.Multimodal
    // WAV encode → decode → fingerprint as stateless per-row maps on a
    // live stream (the image-decode posture on the audio side)
    val input = MemoryStream[Long]
    val q = Multimodal.audioFingerprint(
        Multimodal.audioRecords(input.toDF().toDF("doc_id"), "doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("aud").start()
    input.addData(12L, 13L)
    q.processAllAvailable()
    input.addData(14L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("aud")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect().toSet
    val batch = Multimodal.audioFingerprint(
        Multimodal.audioRecords(Seq(12L, 13L, 14L).toDF("doc_id"), "doc_id"))
      .as[(Long, Boolean, Long, Long, Long, Long)]
      .collect().toSet
    assert(streamed === batch)
    assert(streamed.forall(_._2)) // every synthesized payload decodes
  }

  test("streaming video demux: the box walk runs stateless on a stream, ≡ batch") {
    import graft.ops.Multimodal
    val input = MemoryStream[Long]
    val q = Multimodal.parseVideoBoxes(
        Multimodal.videoRecords(input.toDF().toDF("doc_id"), "doc_id"))
      .writeStream.outputMode("append").format("memory").queryName("vid").start()
    input.addData(12L, 13L)
    q.processAllAvailable()
    input.addData(14L)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vid")
      .as[(Long, Boolean, Boolean, Long, String, Long, Long)].collect().toSet
    val batch = Multimodal.parseVideoBoxes(
        Multimodal.videoRecords(Seq(12L, 13L, 14L).toDF("doc_id"), "doc_id"))
      .as[(Long, Boolean, Boolean, Long, String, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.forall(r => r._2 && r._3)) // parsed, walk complete
  }

  test("nearDupFlags in foreachBatch: per-batch gate ≡ batch gate on the same rows") {
    import graft.ops.Dedup
    val kept = Seq((1L, "alpha beta gamma delta epsilon zeta", "s"),
      (2L, "one two three four five six", "s"))
      .toDF("doc_id", "text", "source")
    val store = Dedup.bandStore(kept, "doc_id", "text").cache()
    val arrivals = Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "s"),
      (11L, "completely different words entirely over here", "s"),
      (12L, "one two three four five six", "s"))
    val got = scala.collection.mutable.Set[(Long, Long, Boolean)]()
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got ++= Dedup.nearDupFlags(batch, store, "doc_id", "text")
          .as[(Long, Long, Boolean)].collect(): Unit
      }.start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val batch = Dedup.nearDupFlags(arrivals.toDF("doc_id", "text", "source"),
        store, "doc_id", "text")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got.toSet === batch) // stateless gate: same rows, same flags
    assert(got.toSet === Set((10L, 4L, true), (11L, 0L, false),
      (12L, 4L, true)))
  }

  test("noveltyAgainstStore in foreachBatch: per-batch score-then-append ≡ batch rescan at each horizon") {
    import graft.ops.TextAnalysis
    val kept = Seq((0L, "the quick brown fox jumps high", "s"),
      (2L, "one two three four five six", "s")).toDF("doc_id", "text", "source")
    val arrivals = Seq(
      (11L, "the quick brown fox jumps high", "s"),
      (13L, "totally fresh words never seen before", "s"),
      (15L, "totally fresh words never seen before", "s"),
      (17L, "one two three four five mixed tail here", "s"))
    // live loop: score each micro-batch against the store accumulated
    // SO FAR, then append the batch's shingles — the q145 posture with
    // an accumulating store; scoring is the ONE shared code path
    var store = TextAnalysis.shingleDfStore(kept, "doc_id", "text")
      .select($"sh").as[String].collect().toSet
    val got = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val storeDf = store.toSeq.toDF("sh")
        got ++= TextAnalysis.noveltyAgainstStore(batch, storeDf,
            "doc_id", "text")
          .as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4)))
        store ++= TextAnalysis.shingleDfStore(batch, "doc_id", "text")
          .select($"sh").as[String].collect(): Unit
      }.start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    // batch rescan at each batch's horizon, SAME code path: batch 1
    // vs kept only; batch 2 vs kept ∪ batch 1
    def rescan(batch: Seq[(Long, String, String)],
               horizon: Seq[(Long, String, String)]) =
      TextAnalysis.noveltyAgainstStore(
          batch.toDF("doc_id", "text", "source"),
          TextAnalysis.shingleDfStore(
            horizon.toDF("doc_id", "text", "source"), "doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val keptRows = Seq((0L, "the quick brown fox jumps high", "s"),
      (2L, "one two three four five six", "s"))
    val want = rescan(arrivals.take(2), keptRows) ++
      rescan(arrivals.drop(2), keptRows ++ arrivals.take(2))
    assert(got.toMap === want)
    // hand-traced: 11 = kept text verbatim → 0 novel of 4; 13 = all
    // fresh → 4 of 4; 15 = 13's text again — novel vs the INITIAL
    // store but NOT vs the accumulated one (the append matters);
    // 17 shares 3 of its 6 shingles with kept doc 2
    assert(got.toMap === Map(
      11L -> ((4L, 0L, 0.0)), 13L -> ((4L, 4L, 1.0)),
      15L -> ((4L, 0L, 0.0)), 17L -> ((6L, 3L, 0.5))))
  }

  test("streamingAgainstStore: store dups dropped statelessly, horizon dups by state, survivors append") {
    import graft.ops.Dedup
    val store = Dedup.fingerprintStore(
      Seq((1L, "alpha beta gamma")).toDF("id", "text"), "text")
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = Dedup.streamingAgainstStore(
        input.toDF().toDF("id", "text", "ts"), store,
        "text", "ts", "10 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sas").start()
    input.addData(
      (10L, "gamma beta alpha", ts(100)),       // order variant of stored — dropped
      (11L, "fresh new content", ts(101)))      // kept
    q.processAllAvailable()
    input.addData(
      (12L, "content new fresh", ts(102)),      // in-horizon dup of 11 — dropped
      (13L, "other words entirely", ts(103)))   // kept
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sas").select($"id").as[Long].collect().toSet
    assert(kept === Set(11L, 13L))
    // batch twin on the same rows agrees (all rows in one horizon)
    val rows = Seq((10L, "gamma beta alpha", "s"), (11L, "fresh new content", "s"),
      (12L, "content new fresh", "s"), (13L, "other words entirely", "s"))
    assert(Dedup.dedupAgainstStore(rows.toDF("id", "text", "source"), store,
        "id", "text")
      .select($"id").as[Long].collect().toSet === kept)
  }

  test("StreamingSelection: per-micro-batch selection ≡ SelectionPipeline.run on the same rows") {
    import graft.streaming.StreamingSelection
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    // two ingest slices of the real corpus — each micro-batch is a
    // complete snapshot and must select exactly what the batch
    // pipeline selects on the same rows
    val allDocs = Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val (slice1, slice2) = allDocs.splitAt(allDocs.length / 2)

    val results = scala.collection.mutable.Map
      .empty[Long, (Set[Long], Seq[(String, Long)], Seq[String])]
    def allocKey(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val input = MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "source").writeStream
      .foreachBatch(StreamingSelection.perBatchSelector(
        emb, centroidIds = (0L until 8L).toSeq, semThreshold = 0.3,
        targetFilter = col("source") === "src0", budget = 1000000L,
        epochWeights = Map("src0" -> 4L, "src1" -> 2L),
        sink = (id, kept, counts, alloc) => results.synchronized {
          results(id) = (kept.select($"doc_id").as[Long].collect().toSet,
            counts, allocKey(alloc))
        }))
      .start()
    input.addData(slice1: _*)
    q.processAllAvailable()
    input.addData(slice2: _*)
    q.processAllAvailable()
    q.stop()
    assert(results.keySet === Set(0L, 1L))

    Seq(0L -> slice1, 1L -> slice2).foreach { case (bid, slice) =>
      val (kept, counts, alloc) = graft.jobs.SelectionPipeline.run(
        slice.toDF("doc_id", "text", "source"), emb,
        centroidIds = (0L until 8L).toSeq, semThreshold = 0.3,
        targetFilter = col("source") === "src0", budget = 1000000L,
        epochWeights = Map("src0" -> 4L, "src1" -> 2L))
      try {
        val (sIds, sCounts, sAlloc) = results(bid)
        assert(sIds === kept.select($"doc_id").as[Long].collect().toSet,
          s"batch $bid kept set")
        assert(sCounts === counts, s"batch $bid stage counts")
        assert(sAlloc === allocKey(alloc), s"batch $bid allocation")
        assert(sCounts.head._2 === slice.length)   // input count = slice
        assert(sIds.nonEmpty)
      } finally kept.unpersist()
    }
    // the two slices saw different corpora — their selections differ
    // (per-batch statistics, the documented semantics)
    assert(results(0L)._1 !== results(1L)._1)
  }
}
