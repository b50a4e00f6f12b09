package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TypedAggs

class TypedAggsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("AvgLong Aggregator matches built-in avg") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 7L)).toDF("k", "v")
    val got = df.groupBy($"k").agg(TypedAggs.avgLong($"v").as("a"))
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 15.0, 2L -> 7.0))
  }

  test("BloomSketch estimates distinct within tolerance and is merge-deterministic") {
    val n = 2000
    val df = (1 to n).map(i => s"user_$i").toDF("u").repartition(8)
    val est = df.agg(TypedAggs.bloomDistinct($"u", 1 << 17)).as[Long].head()
    assert(math.abs(est - n) < n * 0.05, s"estimate $est vs $n")
    // deterministic across runs / partitionings (merge is bitwise-or)
    val est2 = df.repartition(3).agg(TypedAggs.bloomDistinct($"u", 1 << 17))
      .as[Long].head()
    assert(est === est2)
  }

  test("BloomSketch bit scheme matches the reference's polynomial hash") {
    // UvWithBloomFilter.scala:113-120: r = r*seed + char, masked by cap-1
    val sketch = TypedAggs.BloomSketch(1 << 17)
    def refHash(value: String, seed: Int, cap: Long): Long = {
      var r = 0L
      value.foreach(c => r = r * seed + c)
      r & (cap - 1)
    }
    val buf = sketch.reduce(sketch.zero, "abc")
    for (seed <- Seq(61, 71, 83)) {
      val bit = refHash("abc", seed, 1 << 17)
      assert((buf((bit / 8).toInt) & (1 << (bit % 8))) != 0)
    }
    assert(buf.map(b => Integer.bitCount(b & 0xff)).sum <= 3)
  }
}
