package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.ReferenceJobs
import graft.sources.ReferenceSources

/** Golden end-to-end runs over the reference's own bundled CSVs
  * (SURVEY.md §5.2). Expected values are hand-derived from the fixtures
  * under the *intended* semantics (Appendix A deviations documented in
  * the ops' scaladoc).
  */
class ReferenceGoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val ref = "/root/reference"
  private val loginCsv = s"$ref/login-fail-detect/src/main/resources/LoginLog.csv"
  private val orderCsv = s"$ref/order-pay-detect/src/main/resources/OrderLog.csv"
  private val receiptCsv = s"$ref/order-pay-detect/src/main/resources/ReceiptLog.csv"
  private val adCsv = s"$ref/market-analysis/src/main/resources/AdClickLog.csv"

  test("sources parse all rows incl. unterminated last lines") {
    // 44 = 43 newline-terminated + 1 unterminated final line (wc -l says 43)
    assert(ReferenceSources.loginEvents(spark, loginCsv).count() === 44)
    assert(ReferenceSources.orderEvents(spark, orderCsv).count() === 9)
    assert(ReferenceSources.receiptEvents(spark, receiptCsv).count() === 5)
    assert(ReferenceSources.adClickEvents(spark, adCsv).count() === 28)
  }

  test("login-fail warnings match hand-derived golden") {
    val out = ReferenceJobs.loginFailWarnings(
        ReferenceSources.loginEvents(spark, loginCsv))
      .select("userId", "firstFailTime", "lastFailTime")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (3012018L, 1558430881L, 1558430882L),
      (3012018L, 1558430882L, 1558430883L),
      (95279527L, 1558430896L, 1558430898L)))
  }

  test("order results match hand-derived golden (incl. orphan pays)") {
    val out = ReferenceJobs.orderResults(
        ReferenceSources.orderEvents(spark, orderCsv))
      .as[(Long, String)].collect().toSet
    assert(out === Set(
      (34756L, "payed successfully"),
      (34757L, "payed successfully"),
      (34758L, "order timeout"),
      (34740L, "already payed but not found create"),
      (34749L, "already payed but not found create"),
      (34753L, "already payed but not found create"),
      (34755L, "already payed but not found create")))
  }

  test("warnings are identical at any partitioning, even with duplicate timestamps") {
    // two fails sharing one timestamp: with a layout-dependent tie-break
    // id the emitted warning pair could differ per partitioning
    import java.sql.Timestamp
    val rows = Seq(
      (1L, "a", "fail", new Timestamp(1000)),
      (1L, "b", "fail", new Timestamp(1000)),   // duplicate ts
      (1L, "c", "fail", new Timestamp(1500)),
      (2L, "d", "fail", new Timestamp(1000)),
      (2L, "e", "success", new Timestamp(1200)),
      (2L, "f", "fail", new Timestamp(1300)))
      .toDF("userId", "ip", "eventType", "ts")
    val outs = Seq(1, 3, 7).map { parts =>
      ReferenceJobs.loginFailWarnings(rows.repartition(parts))
        .collect().map(_.toSeq).toSet
    }
    assert(outs(0) === outs(1))
    assert(outs(1) === outs(2))
    assert(outs(0).nonEmpty)
  }

  test("order results: pay after the deadline is tagged 'payed but already timeout'") {
    // synthetic: order 1 pays 20 min after create (deadline 15 min);
    // order 2 pays in time; order 3 never pays
    val rows = Seq(
      (1L, "create", "", 1000L), (1L, "pay", "tx1", 1000L + 1200),
      (2L, "create", "", 1000L), (2L, "pay", "tx2", 1000L + 60),
      (3L, "create", "", 1000L))
      .toDF("orderId", "eventType", "txId", "epoch")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds($"epoch"))
    val out = ReferenceJobs.orderResults(rows)
      .as[(Long, String)].collect().toSet
    assert(out === Set(
      (1L, "payed but already timeout"),
      (2L, "payed successfully"),
      (3L, "order timeout")))
  }

  test("tx reconciliation tags match hand-derived golden") {
    val out = ReferenceJobs.txMatch(
        ReferenceSources.orderEvents(spark, orderCsv),
        ReferenceSources.receiptEvents(spark, receiptCsv))
      .select("txId", "tag").as[(String, String)].collect().toSet
    assert(out === Set(
      ("8x0zvy8z3", "matched"), ("7a0zvz4lk", "matched"),
      ("392094j32", "unmatched_pay"), ("8c6vd8dd", "unmatched_pay"),
      ("324n0239", "unmatched_pay"), ("8x0zvy8w3", "unmatched_pay"),
      ("ewr342as4", "unmatched_receipt"), ("sd76f87d6", "unmatched_receipt")))
  }

  test("interval join pairs pay to receipts within 5s (duplicate receipts kept)") {
    val out = ReferenceJobs.txMatchByJoin(
        ReferenceSources.orderEvents(spark, orderCsv),
        ReferenceSources.receiptEvents(spark, receiptCsv))
      .select("txId", "payTime", "receiptTime")
      .as[(String, Long, Long)].collect().toList.sorted
    assert(out === List(
      ("7a0zvz4lk", 1558430932L, 1558430933L),
      ("8x0zvy8z3", 1558430919L, 1558430920L),
      ("8x0zvy8z3", 1558430919L, 1558430920L)))
  }

  test("ad counts by province run end-to-end with blacklist filtering") {
    val clicks = ReferenceSources.adClickEvents(spark, adCsv)
    val out = ReferenceJobs.adCountByProvince(clicks, threshold = 3)
    assert(out.count() > 0)
    // with threshold 3, heavy (user, ad, day) pairs are excluded entirely
    val total = out.groupBy().sum("cnt").as[Long].head()
    val flagged = graft.ops.FraudBlacklist
      .flagDaily(clicks, "ts", 3, Seq("userId", "adId")).count()
    assert(flagged > 0)          // fixture does contain a fraud-y user
    assert(total < 27L * 6)      // fewer than all clicks x 6 sliding windows
  }
}
