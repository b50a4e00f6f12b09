package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's CSV record formats (FIXTURES.md §A;
  * schemas from the reference pojos, SURVEY.md §1.1).
  *
  * The reference parses each line by split(",")+trim+cast inside a
  * try/catch that nulls dirty rows and filters them
  * (e.g. hot-item-analysis/.../HotItems.scala:57-68). Here that is
  * schema-on-read CSV in PERMISSIVE mode (bad casts → null) + a
  * not-null filter on required columns, and epoch-second longs become
  * TimestampType via timestamp_seconds — kept as timestamps end-to-end
  * (SURVEY.md §1.4), formatted only at sinks.
  *
  * All readers work identically with `spark.readStream` semantics: pass
  * a directory and swap read→readStream for the streaming form.
  */
object ReferenceSources {

  val loginSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("ip", StringType),
    StructField("eventType", StringType), StructField("eventTime", LongType)))

  val orderSchema: StructType = StructType(Seq(
    StructField("orderId", LongType), StructField("eventType", StringType),
    StructField("txId", StringType), StructField("eventTime", LongType)))

  val receiptSchema: StructType = StructType(Seq(
    StructField("txId", StringType), StructField("payChannel", StringType),
    StructField("eventTime", LongType)))

  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("adId", LongType),
    StructField("province", StringType), StructField("city", StringType),
    StructField("timestamp", LongType)))

  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("itemId", LongType),
    StructField("categoryId", IntegerType), StructField("behavior", StringType),
    StructField("timestamp", LongType)))

  private def read(spark: SparkSession, path: String, schema: StructType,
                   tsCol: String, requiredCols: Seq[String]): DataFrame = {
    val df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(path)
    requiredCols.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))
      .withColumn("ts", timestamp_seconds(col(tsCol)))
      .drop(tsCol)
  }

  /** LoginLog.csv (LoginFail.scala:30-43). */
  def loginEvents(spark: SparkSession, path: String): DataFrame =
    read(spark, path, loginSchema, "eventTime", Seq("userId", "eventType"))

  /** OrderLog.csv (OrderTimeout.scala:28-41); txId is empty for creates. */
  def orderEvents(spark: SparkSession, path: String): DataFrame =
    read(spark, path, orderSchema, "eventTime", Seq("orderId", "eventType"))

  /** ReceiptLog.csv (TxMatchDetect.scala:55-68). */
  def receiptEvents(spark: SparkSession, path: String): DataFrame =
    read(spark, path, receiptSchema, "eventTime", Seq("txId"))

  /** AdClickLog.csv (AdStatisticsByGeo.scala:32-45). */
  def adClickEvents(spark: SparkSession, path: String): DataFrame =
    read(spark, path, adClickSchema, "timestamp", Seq("userId", "adId"))

  /** UserBehavior.csv — the Tianchi dataset format (HotItems.scala:57-69). */
  def userBehavior(spark: SparkSession, path: String): DataFrame =
    read(spark, path, userBehaviorSchema, "timestamp", Seq("userId", "itemId", "behavior"))
}
