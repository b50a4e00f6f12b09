package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simulated marketing-event source (S3: market-analysis/.../source/
  * SimulatedEventSource.scala:19-52 — a RichSourceFunction emitting
  * random MarketingUserBehavior at ~100 ev/s).
  *
  * Spark-native form: the built-in rate source provides the event-time
  * and pacing; uuid()/rand() provide the payload. The rate source's own
  * `timestamp` column is the event time (monotone, watermark-friendly) —
  * not wall-clock reads inside the generator.
  */
object SimulatedEvents {

  val Behaviors: Seq[String] = Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
  val Channels: Seq[String] = Seq("wechat", "weibo", "appstore", "huaweistore")

  /** Streaming generator: (userId uuid, behavior, channel, ts).
    * `seed` makes behavior/channel draws reproducible for tests.
    */
  def marketingBehaviorStream(spark: SparkSession, rowsPerSecond: Int = 100,
                              seed: Long = 42L): DataFrame =
    decorate(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load(), seed)

  /** Bounded batch variant for tests/backfills: `n` rows, 10ms apart
    * (the reference's sleep pacing), starting at epoch `startSec`.
    */
  def marketingBehaviorBatch(spark: SparkSession, n: Long,
                             startSec: Long = 0L, seed: Long = 42L): DataFrame =
    decorate(spark.range(n).select(col("id").as("value"),
      timestamp_millis(lit(startSec * 1000) + col("id") * 10).as("timestamp")), seed)

  private def decorate(rate: DataFrame, seed: Long): DataFrame =
    rate.select(
      expr("uuid()").as("userId"),
      element_at(array(Behaviors.map(lit): _*),
        (pmod(hash(col("value"), lit(seed)), lit(4)) + 1).cast("int")).as("behavior"),
      element_at(array(Channels.map(lit): _*),
        (pmod(hash(col("value"), lit(seed + 1)), lit(4)) + 1).cast("int")).as("channel"),
      col("timestamp").as("ts"))
}
