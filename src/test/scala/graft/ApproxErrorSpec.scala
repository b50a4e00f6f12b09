package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-band assertions for the sketch/approximate queries — q03 (HLL),
  * q32 (Bloom), q53 (approx_percentile) are rows-only in the DuckDB
  * oracle gate BY DESIGN (DuckDB cannot reproduce the sketches), which
  * means a regression in sketch plumbing would otherwise be invisible.
  * These specs pin each estimate to its exact counterpart within the
  * error its own sketch theory promises, so "approximate" can't hide
  * "broken".
  */
class ApproxErrorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("q03 HLL++ UV within 3·rsd of q02 exact UV per window") {
    val rsd = 0.01 // WindowedAgg.tumblingApproxDistinct default
    val exact = SparkEntry.queries("q02_uv_hourly")(spark, dir)
      .select("window_start", "uv").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q03_uv_approx_hourly")(spark, dir)
      .select("window_start", "uv_approx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet, "window sets must agree")
    exact.foreach { case (w, n) =>
      val est = approx(w)
      // 3 standard deviations of the HLL++ estimator, floor of 1 for
      // integer-valued tiny windows
      val tol = math.max(3.0 * rsd * n, 1.0)
      assert(math.abs(est - n) <= tol,
        s"window $w: |hll $est - exact $n| > $tol")
    }
  }

  test("q32 Bloom UV within its linear-counting error of exact UV per window") {
    val exact = SparkEntry.queries("q02_uv_hourly")(spark, dir)
      .select("window_start", "uv").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q32_uv_bloom_hourly")(spark, dir)
      .select("window_start", "uv_bloom").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet, "window sets must agree")
    exact.foreach { case (w, n) =>
      val est = approx(w)
      // The -m/k·ln(1-X/m) inversion's relative error stays small while
      // the filter load factor is low (m = 2^17 bits vs hourly UV ≪ m
      // at this SF); 3% + an absolute floor of 3 covers 3σ comfortably.
      val tol = math.max(0.03 * n, 3.0)
      assert(math.abs(est - n) <= tol,
        s"window $w: |bloom $est - exact $n| > $tol")
    }
  }

  test("q53 approx percentiles within rank tolerance of the group's order statistics") {
    // approx_percentile(accuracy=10000) guarantees rank error <= n/10000;
    // assert each estimate's empirical rank is within that (+1 row slack
    // for rank-vs-interpolation conventions) of the target quantile.
    val rows = SparkEntry.queries("q53_price_percentiles_approx")(spark, dir)
      .select("o_orderpriority", "p25", "p50", "p75").collect()
    val prices = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sorted = prices(r.getString(0))
      val n = sorted.length
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3))
        .foreach { case (p, est) =>
          val below = sorted.count(_ <= est)
          val rankErr = math.abs(below - p * n)
          val tol = n / 10000.0 + 1.0
          assert(rankErr <= tol,
            s"${r.getString(0)} p$p: estimate $est has rank error $rankErr > $tol (n=$n)")
        }
    }
  }

  test("q99 Misra-Gries guarantee: super-threshold terms present, estimates within n/(k+1)") {
    import spark.implicits._
    // skewed synthetic term stream across 8 partitions (merge exercised)
    val words = Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++
      Seq.fill(150)("h3") ++ (0 until 100).flatMap(i => Seq.fill(10)(s"t$i"))
    val k = 10
    val got = words.toDF("term").repartition(8)
      .agg(graft.functions.TypedAggs.misraGries(col("term"), k).as("mg"))
      .select(explode(col("mg.entries")))
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = words.size.toLong
    val bound = n / (k + 1)                       // 2450/11 = 222
    // every item with true frequency > n/(k+1) must be present
    exact.foreach { case (t, c) =>
      if (c > bound) assert(got.contains(t), s"$t freq $c > $bound missing")
    }
    // estimates never overcount; undercount bounded by n/(k+1)
    got.foreach { case (t, est) =>
      val c = exact(t)
      assert(est <= c, s"$t overcounted: $est > $c")
      assert(c - est <= bound, s"$t undercounted past the bound")
    }
    // the q99 entry runs end-to-end and respects k
    val q99 = SparkEntry.queries("q99_heavy_hitters")(spark, dir).collect()
    assert(q99.nonEmpty && q99.length <= 20)
  }

  test("q115 grouped Misra-Gries: the guarantee holds PER GROUP with the group's own n") {
    import spark.implicits._
    // two groups with different sizes and different hot sets — the
    // per-group bound must use each group's OWN term count, not the
    // global one (merge exercised across 8 partitions)
    val rows =
      (Seq.fill(400)("h1") ++ Seq.fill(200)("h2") ++
        (0 until 60).flatMap(i => Seq.fill(5)(s"a$i"))).map(("gA", _)) ++
      (Seq.fill(50)("z1") ++ (0 until 30).flatMap(i => Seq.fill(2)(s"b$i")))
        .map(("gB", _))
    val k = 8
    val docs = rows.toDF("source", "text").repartition(8)
    val got = graft.ops.TextAnalysis.heavyHittersBy(docs, "source", "text", k)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exact = rows.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    exact.foreach { case (g, terms) =>
      val n = terms.values.sum
      val bound = n / (k + 1)
      val mg = got.getOrElse(g, Map.empty)
      assert(mg.size <= k, s"$g: more than $k entries")
      terms.foreach { case (t, c) =>
        if (c > bound) assert(mg.contains(t), s"$g/$t freq $c > $bound missing")
      }
      mg.foreach { case (t, est) =>
        val c = terms(t)
        assert(est <= c, s"$g/$t overcounted: $est > $c")
        assert(c - est <= bound, s"$g/$t undercounted past the per-group bound")
      }
    }
    // the q115 entry runs end-to-end and respects k per group
    val q115 = SparkEntry.queries("q115_grouped_heavy_hitters")(spark, dir)
      .as[(String, String, Long)].collect()
    assert(q115.nonEmpty)
    q115.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.length <= 10, s"$g exceeded k=10 entries")
    }
  }

  test("q100 sketch-rollup daily UV within HLL error of exact daily distinct") {
    import spark.implicits._
    val got = SparkEntry.queries("q100_uv_sketch_daily")(spark, dir)
      .select(col("window_start"), col("uv_approx").cast("double"))
      .as[(Long, Double)].collect().toMap
    val exact = graft.ops.WindowedAgg.tumblingDistinct(
        graft.Tables.events(spark, dir).filter(col("event_type") === "view"),
        "ts", "1 day", "user_id")
      .select(col("window_start"), col("uv").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === exact.keySet)
    // lgK=12 → rsd ≈ 1.04/√4096 ≈ 1.6%; 3σ band with a small-count floor
    exact.foreach { case (w, ex) =>
      assert(math.abs(got(w) - ex) <= math.max(3.0, 0.05 * ex),
        s"window $w: sketch ${got(w)} vs exact $ex")
    }
  }
}
