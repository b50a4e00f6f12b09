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

  test("CountMinSketch: never undercounts, partition-independent, exact when sparse") {
    // Zipf-ish multiset: term_i appears i times, 1..60 — 1830 items,
    // 60 distinct, far below width ⇒ collisions possible but rare
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"term_$i"))
    val df = rows.toDF("t")
    val exact = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sk = df.repartition(8)
      .agg(TypedAggs.countMin($"t", depth = 3, width = 2048).as("sk"))
    val ests = sk.select(
      typedLit(exact.keys.toSeq.sorted).as("terms"), $"sk")
      .select(explode($"terms").as("t"), $"sk")
      .select($"t", TypedAggs.countMinEstimate($"sk", $"t").as("est"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) =>
      assert(ests(t) >= c, s"CMS undercounted $t: ${ests(t)} < $c")
      assert(ests(t) <= c + 1830 * 2 / 2048 + 3, s"CMS est far off for $t")
    }
    // counters are sums ⇒ the whole matrix is merge-order-independent
    val m1 = sk.select($"sk.counts").as[Seq[Long]].head()
    val m2 = df.repartition(3)
      .agg(TypedAggs.countMin($"t", depth = 3, width = 2048).as("sk"))
      .select($"sk.counts").as[Seq[Long]].head()
    assert(m1 === m2)
    assert(m1.sum === 3L * 1830)
  }

  test("KmvSketch: exact under capacity, within-error over it, partition-independent") {
    val cms = TypedAggs.KmvSketch(k = 64)
    // under capacity: estimate IS the distinct count
    val small = (1 to 40).map(i => s"u$i") ++ (1 to 40).map(i => s"u$i")
    val sEst = small.toDF("u").repartition(5)
      .agg(TypedAggs.kmvDistinct($"u")).as[Double].head()
    assert(sEst === 40.0)
    // over capacity: (k-1)*2^60/h_k, within ~4/sqrt(62) of truth
    val n = 5000
    val big = (1 to n).map(i => s"user_$i").toDF("u")
    val est = big.repartition(8).agg(TypedAggs.kmvDistinct($"u"))
      .as[Double].head()
    assert(math.abs(est - n) < n * 4.0 / math.sqrt(62), s"est $est vs $n")
    // k smallest of a union is merge-order-independent
    val est2 = big.repartition(3).agg(TypedAggs.kmvDistinct($"u"))
      .as[Double].head()
    assert(est === est2)
    // buffer invariants: sorted, distinct, capped at k
    val buf = small.foldLeft(cms.zero)(cms.reduce)
    assert(buf.hs.length === 40 && buf.hs === buf.hs.distinct.sorted)
    val full = (1 to 200).map(i => s"x$i").foldLeft(cms.zero)(cms.reduce)
    assert(full.hs.length === 64 && full.hs === full.hs.distinct.sorted)
    // merge agrees with sequential reduce
    val (l, r) = (1 to 200).map(i => s"x$i").splitAt(97)
    val merged = cms.merge(l.foldLeft(cms.zero)(cms.reduce),
      r.foldLeft(cms.zero)(cms.reduce))
    assert(merged.hs === full.hs)
  }

  test("CountMinSketch buckets match the cross-engine md5-60 family") {
    val cms = TypedAggs.CountMinSketch(depth = 3, width = 2048)
    val buf = cms.reduce(cms.zero, "abc")
    for (i <- 0 until 3) {
      val b = (graft.functions.Md5Long60.hash(
        s"cms$i:abc".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % 2048).toInt
      assert(buf(i * 2048 + b) === 1L, s"row $i bucket $b not incremented")
    }
    assert(buf.sum === 3L)
  }
}
