package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.WindowedAgg
import graft.streaming._

/** End-to-end streaming wiring of the reference's use cases over the
  * driver's events table, read as a file stream — the Structured
  * Streaming analog of the reference's job mains (HotItems, LoginFail,
  * OrderTimeout wiring shapes; SURVEY.md §3).
  *
  * Prints one line per use case with the emitted row count, and
  * cross-checks the streaming login-fail output against the batch
  * operator on the same data (they must agree exactly — same fold, just
  * micro-batched).
  */
object StreamingDemo {
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the file-stream source watches a directory; expose the single
    // events.parquet through a temp dir symlink
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events-")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    def stream(): DataFrame = spark.readStream
      .schema(eventsSchema).parquet(streamDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    // 1. login-fail detection (LoginFail wiring shape)
    val lf = StatefulOps.consecutiveFails(
      stream().select($"user_id".as("key"), $"ts", $"event_type".as("eventType"), $"event_id".as("id"))
        .withWatermark("ts", "0 seconds").as[KeyedEvent],
      "error", 2 * 3600 * 1000L)
    val q1 = lf.writeStream.outputMode("append").format("memory")
      .queryName("login_fail").start()
    q1.processAllAvailable(); q1.stop()
    val streamedFails = spark.table("login_fail").count()

    val batchFails = graft.SparkEntry.queries("q09_login_fail")(spark, dir).count()
    println(s"login_fail: streaming=$streamedFails batch=$batchFails " +
      (if (streamedFails == batchFails) "MATCH" else "MISMATCH"))

    // 2. hot-items top-5 per sliding window (HotItems wiring shape)
    var topRows = 0L
    val counts = WindowedAgg.slidingCount(
      stream().filter($"event_type" === "view")
        .withColumn("item_id", get_json_object($"props", "$.k").cast("long"))
        .withWatermark("ts", "5 seconds"),
      "ts", "1 hour", "5 minutes", Seq("item_id"))
    val q2 = StreamingTopN.writer(counts, Seq("window_start"), "cnt", Seq("item_id"), 5) {
      (ranked, _) => topRows += ranked.count()
    }.start()
    q2.processAllAvailable(); q2.stop()
    println(s"hot_items_topn: streaming emitted $topRows ranked rows " +
      "(append mode: windows closed by final watermark)")

    // 3. order-timeout (OrderTimeout wiring shape; signup=create, purchase=pay)
    val ot = StatefulOps.orderTimeout(
      stream().filter($"event_type".isin("signup", "purchase"))
        .select($"user_id".as("key"), $"ts",
          when($"event_type" === "signup", "create").otherwise("pay").as("eventType"),
          $"event_id".as("id"))
        .withWatermark("ts", "0 seconds").as[KeyedEvent],
      24 * 3600 * 1000L)
    // side-output parity: one stream fanned out to per-tag sinks
    val statusCounts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val q3 = Sinks.fanOutByTag(ot.toDF().withColumnRenamed("status", "tag")) {
      Map(
        "payed successfully" -> (b => statusCounts.synchronized {
          statusCounts("payed successfully") += b.count() }),
        "payed but already timeout" -> (b => statusCounts.synchronized {
          statusCounts("payed but already timeout") += b.count() }))
    }.outputMode("append").start()
    q3.processAllAvailable(); q3.stop()
    println(s"order_timeout: ${statusCounts.toMap}")

    // 4. ad stats by geo over a CSV *text stream* (AdStatisticsByGeo
    // wiring shape: line stream -> from_csv parse -> windowed geo counts)
    val adDir = java.nio.file.Files.createTempDirectory("graft-adlog-")
    java.nio.file.Files.createSymbolicLink(
      adDir.resolve("AdClickLog.csv"),
      java.nio.file.Paths.get(
        "/root/reference/market-analysis/src/main/resources/AdClickLog.csv"))
    val adLines = spark.readStream.text(adDir.toString)
    val clicks = graft.sources.KafkaSources.parseLines(
        adLines.select($"value".as("line")),
        graft.sources.ReferenceSources.adClickSchema)
      .filter($"userId".isNotNull && $"adId".isNotNull)
      .withColumn("ts", timestamp_seconds($"timestamp"))
      .withWatermark("ts", "1 second")
    val q4 = WindowedAgg.slidingCount(clicks, "ts", "1 hour", "10 minutes",
        Seq("province"))
      .writeStream.outputMode("append").format("memory")
      .queryName("ad_geo").start()
    q4.processAllAvailable(); q4.stop()
    println(s"ad_geo: streaming emitted ${spark.table("ad_geo").count()} windowed province counts")

    // 5. app-marketing channel stats from the simulated rate source
    // (AppMarketingByChannel wiring shape)
    val sim = graft.sources.SimulatedEvents
      .marketingBehaviorStream(spark, rowsPerSecond = 500)
      .filter($"behavior" =!= "UNINSTALL")
    val q5 = WindowedAgg.tumblingCount(sim, "ts", "1 second", Seq("channel"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("marketing").start()
    Thread.sleep(1500)
    q5.processAllAvailable(); q5.stop()
    println(s"marketing_by_channel: ${spark.table("marketing").count()} channel-window counts")

    // 6. CEP pattern detection on the stream (LoginFailWithCep wiring
    // shape) — streaming NFA must equal batch detection on bounded input
    def cepEvents(df: DataFrame) = df.select(
        $"user_id".cast("string").as("key"), $"ts",
        $"event_type".as("eventType"), $"event_id".as("id"))
      .as[graft.cep.CepEvent]
    val pattern = graft.cep.Pattern
      .begin("first", _.eventType == "error")
      .next("second", _.eventType == "error")
      .within("2 hours")
    val q6 = graft.cep.CEP.detectStream(
      cepEvents(stream()).withWatermark("ts", "0 seconds"), pattern)
      .writeStream.outputMode("append").format("memory").queryName("cep").start()
    q6.processAllAvailable(); q6.stop()
    val cepStream = spark.table("cep").count()
    val cepBatch = graft.cep.CEP.detectBatch(
      cepEvents(graft.Tables.events(spark, dir)), pattern).count()
    println(s"cep_login_fail: streaming=$cepStream batch=$cepBatch " +
      (if (cepStream == cepBatch) "MATCH" else "MISMATCH"))

    // 7. late-data tap (W5: the observable form of the reference's
    // allowedLateness + sideOutputLateData, HotItems.scala:80-81).
    // Two files arriving in order — the second carries event times older
    // than the watermark the first advanced to — so its rows are late.
    val lateDir = java.nio.file.Files.createTempDirectory("graft-late-")
    val fileA = lateDir.resolve("a.csv")
    val fileB = lateDir.resolve("b.csv")
    java.nio.file.Files.write(fileA,
      (1 to 50).map(i => s"$i,${1000 + i}").mkString("\n").getBytes)
    java.nio.file.Files.write(fileB,
      ((51 to 55).map(i => s"$i,${100 + i}") :+ "56,2000").mkString("\n").getBytes)
    // file source processes files in modification-time order
    java.nio.file.Files.setLastModifiedTime(fileA,
      java.nio.file.attribute.FileTime.fromMillis(1000000))
    java.nio.file.Files.setLastModifiedTime(fileB,
      java.nio.file.attribute.FileTime.fromMillis(2000000))
    val lateLines = spark.readStream
      .schema(StructType(Seq(StructField("id", LongType), StructField("sec", LongType))))
      .option("maxFilesPerTrigger", 1)
      .csv(lateDir.toString)
      .withColumn("ts", timestamp_seconds($"sec"))
      .withWatermark("ts", "0 seconds")
    val lateCounts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val q7 = Sinks.fanOutByTag(LateTap.tagLate(lateLines, "ts")) {
      Map(
        LateTap.OnTimeTag -> (b => lateCounts.synchronized {
          lateCounts("ontime") += b.count() }),
        LateTap.LateTag -> (b => lateCounts.synchronized {
          lateCounts("late") += b.count() }))
    }.start()
    q7.processAllAvailable(); q7.stop()
    println(s"late_tap: ${lateCounts.toMap} " +
      (if (lateCounts("late") == 5) "MATCH" else "MISMATCH"))

    // 8. streaming corpus dedup (the training-data ingestion shape):
    // the documents table as a file stream, deduped by content
    // fingerprint within a watermark horizon
    // (Dedup.streamingFingerprint), cross-checked against the batch
    // keepFirst twin — same fingerprint, same survivors when all rows
    // fall inside one horizon.
    val docDir = java.nio.file.Files.createTempDirectory("graft-docs-")
    java.nio.file.Files.createSymbolicLink(
      docDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val docStream = spark.readStream.schema(docSchema).parquet(docDir.toString)
      .withColumn("ts", timestamp_seconds($"doc_id")) // synthetic arrival order
    val q8 = graft.ops.Dedup.streamingFingerprint(docStream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("corpus_dedup").start()
    q8.processAllAvailable(); q8.stop()
    val streamKept = spark.table("corpus_dedup").count()
    val batchKept = graft.ops.Dedup.keepFirst(
      graft.Tables.documents(spark, dir)
        .withColumn("ts", timestamp_seconds($"doc_id"))
        .withColumn("fingerprint", graft.ops.Dedup.fingerprint("text")),
      Seq("fingerprint"), Seq("ts", "doc_id")).count()
    println(s"corpus_dedup: streaming=$streamKept batch=$batchKept " +
      (if (streamKept == batchKept) "MATCH" else "MISMATCH"))

    spark.stop()
  }
}
