package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

class OpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ev(rows: (Long, String, String, Long)*) =
    rows.toDF("user_id", "event_type", "props", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
      .withColumn("event_id", monotonically_increasing_id())

  test("tumblingCount buckets rows into epoch-aligned hours") {
    val df = ev(
      (1L, "view", "{}", 3600L), (1L, "view", "{}", 3610L),
      (2L, "view", "{}", 7200L))
    val out = WindowedAgg.tumblingCount(df, "ts", "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((3600L, 7200L, 2L), (7200L, 10800L, 1L)))
  }

  test("slidingCount assigns each row to duration/slide windows") {
    val df = ev((1L, "view", "{}", 3600L))
    val out = WindowedAgg.slidingCount(df, "ts", "1 hour", "5 minutes")
    assert(out.count() === 12)
    val starts = out.select("window_start").as[Long].collect().sorted
    assert(starts.head === 300L && starts.last === 3600L)
  }

  test("tumblingDistinct counts unique keys exactly") {
    val df = ev(
      (1L, "view", "{}", 10L), (1L, "view", "{}", 20L), (2L, "view", "{}", 30L))
    val out = WindowedAgg.tumblingDistinct(df, "ts", "1 hour", "user_id")
    assert(out.select("uv").as[Long].head() === 2L)
  }

  test("TopN.perGroup ranks desc with deterministic tie-break") {
    val counts = Seq((0L, 10L, 5L), (0L, 20L, 5L), (0L, 30L, 7L), (0L, 40L, 1L))
      .toDF("window_start", "item_id", "cnt")
    val top = TopN.perGroup(counts, Seq("window_start"), "cnt", Seq("item_id"), 2)
      .select("item_id", "rank").as[(Long, Int)].collect().toSet
    assert(top === Set((30L, 1), (10L, 2)))  // tie 10-vs-20 broken by item_id asc
  }

  test("asofJoin pairs each left row with the latest right row at-or-before it") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 8L, 102L), (2L, 5L, 103L))
      .toDF("k", "epoch", "pay_id")
      .withColumn("lts", timestamp_seconds(col("epoch"))).drop("epoch")
    val right = Seq((1L, 8L, "a"), (1L, 15L, "b"), (3L, 1L, "c"))
      .toDF("k", "epoch", "v")
      .withColumn("rts", timestamp_seconds(col("epoch"))).drop("epoch")
    val out = StreamMatch.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select(col("pay_id"), col("v"), unix_timestamp(col("asof_rts")).as("rt"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(out === Set(
      (100L, Some("a"), Some(8L)),   // latest right <= 10 is ts 8
      (101L, Some("b"), Some(15L)),  // latest right <= 20 is ts 15
      (102L, Some("a"), Some(8L)),   // equal timestamps match (<=)
      (103L, None, None)))           // key 2 has no right rows
  }

  test("bucketNearest: identical vectors share a bucket and pick each other at score 1") {
    val df = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.bucketNearest(df, "vec_id", "embedding")
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect().toSet
    // all three identical -> same bucket; nearest = lowest other id (tie on score)
    assert(out === Set((0L, 1L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0)))
  }

  test("qualityScore combines length, diversity and stopword density") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "doc_id", "text")
      .select("n_words", "n_distinct_words", "stopword_cnt", "quality", "quality_label")
      .as[(Long, Long, Long, Double, String)].head()
    // 6 words, 5 distinct ("the" twice), 3 stopwords (the, on, the)
    val expected = BigDecimal(
      0.4 * math.min(6.0 / 100.0, 1.0) + 0.4 * (5.0 / 6.0) +
      0.2 * math.min(5.0 * 3.0 / 6.0, 1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r === ((6L, 5L, 3L, expected, if (expected >= 0.6) "high" else "medium")))
  }

  test("SequenceDetect.consecutiveFails: strict contiguity, gap bound, reset on success") {
    val df = ev(
      (1L, "error", "{}", 100L), (1L, "error", "{}", 200L),     // pair within gap
      (1L, "ok", "{}", 300L), (1L, "error", "{}", 400L),        // reset by success
      (2L, "error", "{}", 100L), (2L, "error", "{}", 99999L))   // outside gap
    val out = SequenceDetect.consecutiveFails(df, "user_id", "ts", "event_type",
      "event_id", "error", "2 HOURS")
    val rows = out.select("user_id", "first_fail", "last_fail")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows === Set((1L, 100L, 200L)))
  }

  test("Timeout.detect tags pays within deadline and timeouts") {
    val creates = Seq((10L, 1L, 1000L), (11L, 2L, 1000L))
      .toDF("id", "key", "epoch")
      .withColumn("create_ts", timestamp_seconds(col("epoch"))).drop("epoch")
    val pays = Seq((1L, 1500L), (2L, 99999L))
      .toDF("key", "epoch")
      .withColumn("pay_ts", timestamp_seconds(col("epoch"))).drop("epoch")
    val out = Timeout.detect(creates, pays, "15 MINUTES")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(out === Map(10L -> "payed successfully", 11L -> "timeout"))
  }

  test("StreamMatch.reconcile emits matched and both unmatched sides") {
    val l = Seq((1L, 2L), (2L, 3L)).toDF("k", "pay_cnt")
    val r = Seq((1L, 4L), (3L, 5L)).toDF("k", "receipt_cnt")
    val out = StreamMatch.reconcile(l, r, Seq("k"), "pay_cnt", "receipt_cnt")
      .select("k", "pay_cnt", "receipt_cnt", "tag")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out === Set(
      (1L, 2L, 4L, "matched"),
      (2L, 3L, 0L, "unmatched_left"),
      (3L, 0L, 5L, "unmatched_right")))
  }

  test("StreamMatch.intervalJoin bounds the time range") {
    val l = Seq((1L, 1000L)).toDF("k", "epoch")
      .withColumn("lts", timestamp_seconds(col("epoch"))).drop("epoch")
    val r = Seq((1L, 995L), (1L, 1001L), (1L, 500L)).toDF("k", "epoch")
      .withColumn("rts", timestamp_seconds(col("epoch"))).drop("epoch")
    val out = StreamMatch.intervalJoin(l, r, "k", "lts", "rts", "10 SECONDS", "0 SECONDS")
    assert(out.count() === 1)  // only 995 ∈ [990, 1000]
  }

  test("FraudBlacklist.flagDaily thresholds per day") {
    val df = ev(
      (1L, "click", "{}", 100L), (1L, "click", "{}", 200L),
      (2L, "click", "{}", 100L),
      (1L, "click", "{}", 86400L + 100L)) // next day — below threshold
      .withColumn("ad_id", lit(7L))
    val out = FraudBlacklist.flagDaily(df, "ts", 2, Seq("user_id", "ad_id"))
      .select("user_id", "day_start", "cnt").as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 2L)))
  }
}
