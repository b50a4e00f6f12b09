package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Click-fraud blacklisting (C1: market-analysis/.../AdStatisticsByGeo.scala:68-113).
  *
  * The reference keeps a per-(userId, adId) ValueState counter and emits a
  * one-shot BlackListWarning when a user clicks the same ad `threshold`
  * times within a day, resetting at midnight. Batch form: a per-day
  * grouped count with a HAVING filter — one shuffle, partial aggregation
  * map-side, fully codegen'd. The streaming form with the one-shot
  * emission + midnight reset lives in graft.streaming.StatefulOps.
  */
object FraudBlacklist {

  /** Pairs whose click count within each day reached the threshold.
    * Output: keys ++ (day_start: long epoch-s, cnt: long).
    */
  def flagDaily(df: DataFrame, tsCol: String, threshold: Long,
                keys: Seq[String]): DataFrame = {
    val day: Column = (floor(unix_timestamp(col(tsCol)) / 86400) * 86400)
      .cast("long").as("day_start")
    df.groupBy(keys.map(col) :+ day: _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Threshold count over the whole input (no daily reset). */
  def flag(df: DataFrame, threshold: Long, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
}
