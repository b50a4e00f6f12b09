package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cep._
import graft.ops.StreamMatch

/** Batch forms of the reference's seven use cases wired end-to-end over
  * its own record formats — the "switch path" for a user of the
  * reference: same inputs, same output vocabulary (SURVEY.md §0).
  */
object ReferenceJobs {

  /** LoginFail / LoginFailWithCep (login-fail-detect/.../LoginFail.scala,
    * LoginFailWithCep.scala:50-57): two consecutive fails within 2s.
    * Output mirrors LoginWarning(userId, firstFailTime, lastFailTime, msg).
    */
  def loginFailWarnings(login: DataFrame): DataFrame = {
    import login.sparkSession.implicits._
    // content-derived tie-break id: monotonically_increasing_id() is
    // partition-layout-dependent, which would make equal-timestamp
    // ordering (and thus warnings) vary with parallelism (ADVICE r2)
    val events = login.select(
        col("userId").cast("string").as("key"), col("ts"),
        col("eventType"),
        xxhash64(col("userId"), col("ts"), col("eventType")).as("id"))
      .as[CepEvent]
    val pattern = Pattern.begin("first", _.eventType == "fail")
      .next("second", _.eventType == "fail")
      .within("2 seconds")
    CEP.detectBatch(events, pattern)
      .map { m =>
        (m.key.toLong, m.events.head.tsMs / 1000, m.events.last.tsMs / 1000,
          "login fail 2 times in 2s")
      }
      .toDF("userId", "firstFailTime", "lastFailTime", "warningMsg")
  }

  /** OrderTimeout / OrderTimeoutWithoutCep (order-pay-detect/...):
    * create→pay within 15 min. Emits the reference's full message
    * vocabulary (OrderTimeoutWithoutCep.scala:73,90,93,113,116):
    * "payed successfully", "order timeout" (create never paid),
    * "payed but already timeout" (a pay exists but past the deadline —
    * the CEP run has already expired, so the expired-create runs are
    * relabeled by a post-join against later pays, mirroring
    * StatefulOps.orderTimeout's late-pay branch), and
    * "already payed but not found create" (orphan pays).
    */
  def orderResults(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    // content-derived id for layout-independent ordering (see
    // loginFailWarnings)
    val events = orders.select(
        col("orderId").cast("string").as("key"), col("ts"),
        col("eventType"),
        xxhash64(col("orderId"), col("ts"), col("eventType")).as("id"))
      .as[CepEvent]
    val pattern = Pattern.begin("create", _.eventType == "create")
      .followedBy("pay", _.eventType == "pay")
      .within("15 minutes")
    val cepOut = CEP.detectBatch(events, pattern, emitTimeouts = true)
      .map(m => (m.key.toLong,
        if (m.timedOut) "order timeout" else "payed successfully"))
      .toDF("orderId", "resultMsg")
    // late pays: the run expired ("order timeout"), but a pay did arrive
    // after the deadline — relabel per the reference's state machine
    val latePaid = orders.filter(col("eventType") === "pay")
      .select(col("orderId").as("lp_id")).distinct()
    val relabeled = cepOut.join(latePaid, col("orderId") === col("lp_id"), "left")
      .select(col("orderId"),
        when(col("resultMsg") === "order timeout" && col("lp_id").isNotNull,
          "payed but already timeout").otherwise(col("resultMsg")).as("resultMsg"))
    // orphan pays: a pay with no create at all for the order
    val orphans = orders.groupBy(col("orderId"))
      .agg(max(when(col("eventType") === "create", 1).otherwise(0)).as("hasCreate"),
        max(when(col("eventType") === "pay", 1).otherwise(0)).as("hasPay"))
      .filter(col("hasPay") === 1 && col("hasCreate") === 0)
      .select(col("orderId"), lit("already payed but not found create").as("resultMsg"))
    relabeled.unionByName(orphans)
  }

  /** HotItems (hot-item-analysis/.../HotItems.scala:78-84): top-N items
    * per sliding 1h/5m window over pv behaviors (case-insensitive match,
    * HotItems.scala:69).
    */
  def hotItems(behaviors: DataFrame, n: Int = 5): DataFrame = {
    val counts = graft.ops.WindowedAgg.slidingCount(
      behaviors.filter(lower(col("behavior")) === "pv" && col("ts").isNotNull),
      "ts", "1 hour", "5 minutes", Seq("itemId"))
    graft.ops.TopN.perGroup(counts, Seq("window_start"), "cnt", Seq("itemId"), n)
  }

  /** TxMatchDetect (order-pay-detect/.../TxMatchDetect.scala:88-138):
    * reconcile pays (order events with non-empty txId,
    * TxMatchDetect.scala:46) against receipts on txId; tags matched /
    * unmatched_pay / unmatched_receipt replace the side outputs.
    */
  def txMatch(orders: DataFrame, receipts: DataFrame): DataFrame = {
    val pays = orders
      .filter(col("eventType") === "pay" && length(col("txId")) > 0)
      .groupBy(col("txId")).agg(count(lit(1)).as("pay_cnt"))
    val rcpt = receipts.groupBy(col("txId")).agg(count(lit(1)).as("receipt_cnt"))
    StreamMatch.reconcile(pays, rcpt, Seq("txId"), "pay_cnt", "receipt_cnt")
      .withColumn("tag",
        when(col("tag") === "unmatched_left", "unmatched_pay")
          .when(col("tag") === "unmatched_right", "unmatched_receipt")
          .otherwise(col("tag")))
  }

  /** TxMatchByJoin (order-pay-detect/.../TxMatchByJoin.scala:68-71):
    * inner interval join pay↔receipt on txId within ±5s.
    */
  def txMatchByJoin(orders: DataFrame, receipts: DataFrame): DataFrame = {
    val pays = orders
      .filter(col("eventType") === "pay" && length(col("txId")) > 0)
      .select(col("txId"), col("orderId"), col("ts").as("pay_ts"))
    val rcpt = receipts.select(col("txId"), col("payChannel"), col("ts").as("receipt_ts"))
    StreamMatch.intervalJoin(pays, rcpt, "txId", "pay_ts", "receipt_ts",
        "5 SECONDS", "5 SECONDS")
      .select(col("orderId"), col("l_key").as("txId"), col("payChannel"),
        unix_timestamp(col("pay_ts")).as("payTime"),
        unix_timestamp(col("receipt_ts")).as("receiptTime"))
  }

  /** AdStatisticsByGeo (market-analysis/.../AdStatisticsByGeo.scala):
    * blacklist-filtered sliding 1h/10m(reference: 5s output granularity
    * via 1h/10m windows at :59) ad counts per province; clicks beyond
    * `threshold` per (user, ad, day) are excluded and reported
    * separately by FraudBlacklist.flagDaily.
    */
  def adCountByProvince(clicks: DataFrame, threshold: Long = 100): DataFrame = {
    val flagged = graft.ops.FraudBlacklist.flagDaily(clicks, "ts", threshold,
      Seq("userId", "adId"))
      .select(col("userId").as("bl_user"), col("adId").as("bl_ad"))
      .distinct()
    val clean = clicks.join(flagged,
      col("userId") === col("bl_user") && col("adId") === col("bl_ad"),
      "left_anti")
    graft.ops.WindowedAgg.slidingCount(clean, "ts", "1 hour", "10 minutes",
      Seq("province"))
  }
}
