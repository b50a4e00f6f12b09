package graft

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.ReferenceJobs
import graft.sources.ReferenceSources
import graft.streaming.KeyedEvent

class HotItemsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  implicit def sqlCtx: SQLContext = spark.sqlContext

  private val base = 1511658000L // hour-aligned fixture epoch

  test("hot items over the UserBehavior schema: parse, filter, rank") {
    val path = getClass.getResource("/UserBehavior.csv").getPath
    val ub = ReferenceSources.userBehavior(spark, path)
    // 12 rows survive the not-null userId/itemId/behavior filter
    // (1 dirty userId dropped; the bad-timestamp row keeps a null ts)
    assert(ub.count() === 12)
    val top = ReferenceJobs.hotItems(ub, 5)
      .filter($"window_start" === base)
      .select("itemId", "cnt", "rank").as[(Long, Long, Int)].collect().toSet
    assert(top === Set((100L, 6L, 1), (200L, 3L, 2), (300L, 1L, 3)))
  }

  test("W5 deviation: rows later than the watermark are dropped, windows emit once") {
    val input = MemoryStream[KeyedEvent]
    val agg = graft.ops.WindowedAgg.tumblingCount(
      input.toDF().withWatermark("ts", "0 seconds"), "ts", "1 minute")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late").start()
    input.addData(KeyedEvent(1, new java.sql.Timestamp(60 * 1000), "view", 1),
      KeyedEvent(2, new java.sql.Timestamp(3700 * 1000), "view", 2))
    q.processAllAvailable() // watermark → 3700; window [60,120) closes with cnt=1
    input.addData(KeyedEvent(3, new java.sql.Timestamp(61 * 1000), "view", 3)) // late
    q.processAllAvailable()
    input.addData(KeyedEvent(4, new java.sql.Timestamp(7300 * 1000), "view", 4))
    q.processAllAvailable()
    val rows = spark.table("late").select("window_start", "cnt")
      .as[(Long, Long)].collect().filter(_._1 == 60L)
    q.stop()
    assert(rows.toSeq === Seq((60L, 1L))) // late row ignored, no re-emission
  }
}
