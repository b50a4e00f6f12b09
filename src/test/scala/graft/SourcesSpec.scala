package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ReferenceSources, SimulatedEvents}

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("simulated marketing source: domains, determinism, event-time pacing") {
    val df = SimulatedEvents.marketingBehaviorBatch(spark, 200, startSec = 1000)
    val rows = df.collect()
    assert(rows.length === 200)
    assert(rows.forall(r => SimulatedEvents.Behaviors.contains(r.getAs[String]("behavior"))))
    assert(rows.forall(r => SimulatedEvents.Channels.contains(r.getAs[String]("channel"))))
    // seeded draws are reproducible
    val again = SimulatedEvents.marketingBehaviorBatch(spark, 200, startSec = 1000)
      .select("behavior", "channel").collect().toSeq
    assert(df.select("behavior", "channel").collect().toSeq === again)
    // 10ms pacing from startSec
    val ts = df.select($"ts".cast("double")).as[Double].collect()
    assert(math.abs(ts.max - ts.min - 1.99) < 1e-6)
  }

  test("streaming rate-source generator produces valid rows") {
    val q = SimulatedEvents.marketingBehaviorStream(spark, rowsPerSecond = 200)
      .writeStream.outputMode("append").format("memory").queryName("sim").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      val rows = spark.table("sim").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => SimulatedEvents.Behaviors.contains(r.getAs[String]("behavior"))))
    } finally q.stop()
  }

  test("dirty rows are dropped, not propagated (P1/F1 parity)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty-").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/x.csv"),
      "1,10.0.0.1,success,1558430001\nnot-a-long,ip,fail,1558430002\n2,10.0.0.2,fail,oops\n3,10.0.0.3,fail,1558430003")
    val out = ReferenceSources.loginEvents(spark, s"$dir/x.csv")
    // row 2: bad userId dropped; row 3: bad eventTime parses with null ts but userId ok
    val ids = out.select("userId").as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 3L))
    assert(out.filter($"ts".isNotNull).count() === 2)
  }
}
