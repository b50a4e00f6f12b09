package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val H = 3600L
  private val D = 24 * H

  private def events(rows: (Long, String, Long)*) =
    rows.toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        timestamp_seconds(col("sec")).as("ts"))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Funnel.windowFunnel(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), "2 DAY")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap

  test("windowFunnel: depth per user; horizon from t1; strict ordering; no step-1 no row") {
    val df = events(
      (1L, "view", 0L), (1L, "click", H), (1L, "purchase", D),      // full chain
      (2L, "view", 0L), (2L, "click", 3 * D),                       // click too late
      (3L, "view", 0L), (3L, "purchase", H),                        // skips click
      (4L, "click", 0L), (4L, "purchase", H),                       // never viewed
      (5L, "view", 0L), (5L, "click", H), (5L, "purchase", 49 * H), // purchase past t1+2d
      (6L, "view", 0L), (6L, "click", 0L))                          // same instant: strict >
    val out = run(df)
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 2, 6L -> 1))
  }

  test("windowFunnel: anchors at the EARLIEST step times (documented deviation)") {
    // the chain from the second view would complete, but t1 anchors at
    // the first view and the click lands outside ITS horizon — the
    // scaladoc points to the CEP NFA for any-start semantics
    val df = events(
      (7L, "view", 0L), (7L, "view", 3 * D),
      (7L, "click", 3 * D + H), (7L, "purchase", 3 * D + 2 * H))
    assert(run(df) === Map(7L -> 1))
    // t2 likewise: earliest in-horizon click anchors step 2, even if a
    // later click would leave more room for step 3
    val df2 = events(
      (8L, "view", 0L), (8L, "click", H), (8L, "purchase", 30 * H))
    assert(run(df2) === Map(8L -> 3)) // 30h <= 48h from t1: still in horizon
  }

  test("cohortRetention: ISO-week cohorts, week-relative activity, pre-anchor filtered") {
    val mon0 = 1704067200L // 2024-01-01 Monday 00:00 UTC
    val mon1 = mon0 + 7 * 24 * H
    val df = events(
      (1L, "signup", mon0 + H), (1L, "view", mon0 + 8 * 24 * H), // active week 0+1
      (2L, "signup", mon0 + 2 * 24 * H), (2L, "view", mon0 - 10 * 24 * H), // pre-signup view filtered
      (3L, "signup", mon1 + H), // second cohort
      (4L, "view", mon0)) // never signed up: no cohort
    val out = graft.ops.Behavior.cohortRetention(df, "user_id", "event_type", "ts", "signup")
      .select(unix_timestamp(col("cohort_week")).as("w"), col("week_n"),
        col("active_users"), col("cohort_size"), col("retention_rate"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out === Set(
      (mon0, 0L, 2L, 2L, 1.0), (mon0, 1L, 1L, 2L, 0.5), (mon1, 0L, 1L, 1L, 1.0)))
  }

  test("transitionCounts: adjacent pairs per user, ts ties broken by id, singletons drop") {
    val df = Seq(
      (1L, "view", 1L, 10L), (1L, "click", 2L, 11L), (1L, "view", 2L, 12L),
      (2L, "purchase", 5L, 13L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_seconds(col("sec")).as("ts"))
    val out = graft.ops.Behavior.transitionCounts(df, "user_id", "event_type", "ts", "event_id")
      .select("from_type", "to_type", "cnt").as[(String, String, Long)].collect().toSet
    assert(out === Set(("view", "click", 1L), ("click", "view", 1L)))
  }

  test("windowFunnel vs CEP: on an any-start divergence the documented CEP route completes the funnel") {
    import java.sql.Timestamp
    import graft.cep.{CEP, CepEvent, Pattern}
    // user 7 misses the chain from their FIRST view (the click lands
    // outside that view's horizon) but completes it from the second:
    // earliest-chain windowFunnel reports depth 1, and the scaladoc
    // routes any-start semantics to the CEP NFA — prove that route
    // actually yields the completed funnel on this divergence case
    val df = events(
      (7L, "view", 0L), (7L, "view", 3 * D),
      (7L, "click", 3 * D + H), (7L, "purchase", 3 * D + 2 * H))
    assert(run(df) === Map(7L -> 1)) // earliest-chain: shallow

    val p = Pattern.begin("view", _.eventType == "view")
      .followedBy("click", _.eventType == "click")
      .followedBy("purchase", _.eventType == "purchase")
      .within("2 days")
    val evs = Seq(
      CepEvent("7", new Timestamp(0L), "view", 1L),
      CepEvent("7", new Timestamp(3 * D * 1000L), "view", 2L),
      CepEvent("7", new Timestamp((3 * D + H) * 1000L), "click", 3L),
      CepEvent("7", new Timestamp((3 * D + 2 * H) * 1000L), "purchase", 4L)).toDS()
    val matches = CEP.detectBatch(evs, p).collect()
    assert(matches.length === 1 && !matches.head.timedOut)
    assert(matches.head.events.map(_.step) === Seq("view", "click", "purchase"))
    // re-anchored at the SECOND view, which windowFunnel cannot do
    assert(matches.head.events.head.tsMs === 3 * D * 1000L)
  }

  test("windowFunnel: malformed horizon fails loudly at construction, not in the SQL parser") {
    val df = events((1L, "view", 0L))
    val bad = intercept[IllegalArgumentException] {
      Funnel.windowFunnel(df, "user_id", "event_type", "ts",
        Seq("view", "click"), "2 FORTNIGHTS)) SELECT 1 --")
    }
    assert(bad.getMessage.contains("horizon"))
    // case-insensitive unit + surrounding whitespace are fine
    assert(Funnel.windowFunnel(df, "user_id", "event_type", "ts",
      Seq("view", "click"), " 90 minutes ").collect().length === 1)
  }

  test("windowFunnel: anchor timestamps surface as epoch micros") {
    val df = events((9L, "view", 10L), (9L, "click", 20L))
    val row = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), "2 DAY").collect().head
    assert(row.getAs[Long]("t1_us") === 10000000L)
    assert(row.getAs[Long]("t2_us") === 20000000L)
    assert(row.isNullAt(row.fieldIndex("t3_us")))
  }

  test("attribution family: last/first/linear/position/decay hand-traced") {
    import graft.ops.Behavior
    val t0 = 1704067200L // all conversions at the same instant
    val convs = Seq((1L, 100L, t0), (2L, 101L, t0), (3L, 102L, t0),
      (4L, 103L, t0))
      .toDF("user_id", "conv_id", "sec")
      .select($"user_id", $"conv_id", timestamp_seconds($"sec").as("conv_ts"))
    val touches = Seq(
      (1L, 1L, t0 - 30, "a"),       // 30s before: the LAST touch
      (1L, 2L, t0 - 2 * D, "b"),    // middle
      (1L, 3L, t0 - 3 * D, "a"),    // the FIRST in-window touch
      (1L, 4L, t0 - 9 * D, "c"),    // outside the 7-day window
      (3L, 5L, t0 - D, "b"),        // single touch
      (4L, 6L, t0 - D, "c"),        // tie on ts with id 7 —
      (4L, 7L, t0 - D, "d"))        // first = min id 6, last = max id 7
      .toDF("user_id", "touch_id", "sec", "channel")
      .select($"user_id", $"touch_id",
        timestamp_seconds($"sec").as("touch_ts"), $"channel")
    val W = 7 * D
    val att = Behavior.attribution(convs, touches, "user_id", "conv_id",
        "conv_ts", "touch_id", "touch_ts", "channel", W)
      .select($"conv_id", $"n_touches", $"last_channel", $"last_touch_id",
        $"first_channel", $"first_touch_id")
      .as[(Long, Long, String, Long, String, Long)].collect().toSet
    assert(att === Set(
      (100L, 3L, "a", 1L, "a", 3L),                 // window drops id 4
      (101L, 0L, "(none)", -1L, "(none)", -1L),     // zero-touch conv
      (102L, 1L, "b", 5L, "b", 5L),
      (103L, 2L, "d", 7L, "c", 6L)))                // id tie-break
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // linear: conv 100 splits 3 ways (333333 each — div floor), conv
    // 102 takes all, conv 103 halves
    assert(rollup(Behavior.linearAttribution(convs, touches, "user_id",
      "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)) === Map(
      "a" -> ((1L, 2L, 666666L)), "b" -> ((2L, 2L, 1333333L)),
      "c" -> ((1L, 1L, 500000L)), "d" -> ((1L, 1L, 500000L))))
    // position: 40/20/40 on conv 100 (first AND last are channel a),
    // 100% single, 50/50 pair
    assert(rollup(Behavior.positionAttribution(convs, touches, "user_id",
      "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)) === Map(
      "a" -> ((1L, 2L, 800000L)), "b" -> ((2L, 2L, 1200000L)),
      "c" -> ((1L, 1L, 500000L)), "d" -> ((1L, 1L, 500000L))))
    // decay: 10^6 >> full days of age — 0d/2d/3d for conv 100,
    // 1d for the others
    assert(rollup(Behavior.decayAttribution(convs, touches, "user_id",
      "conv_id", "conv_ts", "touch_id", "touch_ts", "channel", W)) === Map(
      "a" -> ((1L, 2L, 1125000L)), "b" -> ((2L, 2L, 750000L)),
      "c" -> ((1L, 1L, 500000L)), "d" -> ((1L, 1L, 500000L))))
  }

  test("decayAttribution: shift clamps at 63 days — a 64-day-old touch weighs 0, not full") {
    import graft.ops.Behavior
    val D = 86400L
    val t0 = 200L * D
    val convs = Seq((1L, 100L, t0)).toDF("user_id", "conv_id", "sec")
      .select($"user_id", $"conv_id", timestamp_seconds($"sec").as("conv_ts"))
    // JVM shiftright masks the count to 6 bits: an unclamped 64-day
    // age would wrap to shift 0 and grant FULL 10^6 weight
    val touches = Seq(
      (1L, 1L, t0 - 64L * D, "old"),
      (1L, 2L, t0 - 63L * D, "edge"),
      (1L, 3L, t0, "now"))
      .toDF("user_id", "touch_id", "sec", "channel")
      .select($"user_id", $"touch_id",
        timestamp_seconds($"sec").as("touch_ts"), $"channel")
    val w = Behavior.decayAttribution(convs, touches, "user_id",
        "conv_id", "conv_ts", "touch_id", "touch_ts", "channel",
        windowSec = 90L * D)
      .select($"channel", $"weight_micro").as[(String, Long)]
      .collect().toMap
    assert(w === Map("old" -> 0L, "edge" -> 0L, "now" -> 1000000L))
  }

  test("rfmSegments: independent quintiles, money tie-break on cust, all four labels") {
    import graft.ops.Behavior
    // customer k: f_k orders, all at ts=k (so last_ts=k), amount k each
    //   f:  c1..c10 = 3,4,9,10,5,6,1,2,7,8   money_k = f_k * k
    // quintiles over 10 customers = 2 per bucket:
    //   r (last_ts asc):  c1,c2->1  c3,c4->2  c5,c6->3  c7,c8->4  c9,c10->5
    //   f (freq asc):     c7,c8->1  c1,c2->2  c5,c6->3  c9,c10->4  c3,c4->5
    //   m (money asc):    c1(3),c7(7)->1  c2(8),c8(16)->2  c5(25),c3(27)->3
    //                     c6(36),c4(40)->4  c9(63),c10(80)->5
    val f = Map(1 -> 3, 2 -> 4, 3 -> 9, 4 -> 10, 5 -> 5, 6 -> 6,
      7 -> 1, 8 -> 2, 9 -> 7, 10 -> 8)
    val orders = (1 to 10).flatMap(k => Seq.fill(f(k))((k.toLong, k.toLong, k.toDouble)))
      .toDF("cust", "sec", "amount")
      .select($"cust", timestamp_seconds($"sec").as("ts"), $"amount")
    val out = Behavior.rfmSegments(orders, "cust", "ts", "amount", buckets = 5)
      .as[(Long, Long, Long, String, Long, Double)].collect().toSet
    assert(out === Set(
      (1L, 2L, 1L, "hibernating", 1L, 3.0),   // c1
      (1L, 2L, 2L, "hibernating", 1L, 8.0),   // c2
      (2L, 5L, 3L, "at_risk", 1L, 27.0),      // c3: f>=4, r<4
      (2L, 5L, 4L, "at_risk", 1L, 40.0),      // c4
      (3L, 3L, 3L, "hibernating", 1L, 25.0),  // c5
      (3L, 3L, 4L, "hibernating", 1L, 36.0),  // c6
      (4L, 1L, 1L, "recent", 1L, 7.0),        // c7: r>=4, f<4
      (4L, 1L, 2L, "recent", 1L, 16.0),       // c8
      (5L, 4L, 5L, "champions", 2L, 143.0)))  // c9+c10 share one cell
  }

  test("trafficSpikes: integer cross-multiply vs the trailing window; no-history buckets never spike") {
    import graft.ops.Behavior
    // series "a": hourly counts 10, 10, 40, 5 — only the 40 spikes
    // against a 2-bucket trailing window at threshold 2
    val rows = Seq(0 -> 10, 1 -> 10, 2 -> 40, 3 -> 5).flatMap {
      case (h, n) => Seq.fill(n)(("a", h.toLong * 3600 + 7))
    } ++ Seq(("b", 0L)) // second series: single bucket, no history
    val events = rows.toDF("event_type", "sec")
      .select($"event_type", timestamp_seconds($"sec").as("ts"))
    val got = Behavior.trafficSpikes(events, "event_type", "ts",
        trailing = 2, threshold = 2L)
      .select($"series", unix_timestamp($"bucket").as("b"), $"cnt",
        $"trailing_n", $"trailing_sum", $"is_spike")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("a", 0L, 10L, 0L, 0L, false),      // no history — never a spike
      ("a", 3600L, 10L, 1L, 10L, false),  // 10·1 > 2·10 is false
      ("a", 7200L, 40L, 2L, 20L, true),   // 80 > 40
      ("a", 10800L, 5L, 2L, 50L, false),  // window slides: 10+40
      ("b", 0L, 1L, 0L, 0L, false)))
  }

  test("seasonalSpikes: same-hour-of-day baseline catches what the flat window hides") {
    import graft.ops.Behavior
    val D = 86400L
    // (day, hour, count): three 0h buckets (10, 10, 50) and one noisy
    // 1h bucket (100) between them
    val rows = Seq((0L, 0L, 10), (1L, 0L, 10), (1L, 1L, 100), (2L, 0L, 50))
      .flatMap { case (d, h, n) =>
        Seq.fill(n)(("a", d * D + h * 3600 + 5)) }
    val events = rows.toDF("event_type", "sec")
      .select($"event_type", timestamp_seconds($"sec").as("ts"))
    // seasonal: day2-0h compares ONLY to prior 0h buckets → spike
    val seasonal = Behavior.seasonalSpikes(events, "event_type", "ts",
        trailing = 2, threshold = 2L)
      .filter($"cnt" === 50)
      .select($"hod", $"trailing_n", $"trailing_sum", $"is_spike")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(seasonal === Seq((0L, 2L, 20L, true)))
    // flat trailing-2: the same bucket's window is (day1-0h, day1-1h) —
    // the 100-count hour masks the spike (50·2 > 2·110 is false)
    val flat = Behavior.trafficSpikes(events, "event_type", "ts",
        trailing = 2, threshold = 2L)
      .filter($"cnt" === 50)
      .select($"trailing_sum", $"is_spike")
      .as[(Long, Boolean)].collect().toSeq
    assert(flat === Seq((110L, false)))
  }

  test("topMovers: entered/left/up/down/flat tags from two sort-limit leaderboards") {
    import graft.ops.Behavior
    // anchor = 1000; cur window (900, 1000], prev (800, 900]
    val rows =
      Seq.fill(8)((1L, 950L)) ++ Seq((1L, 1000L)) ++ // cur: item1 = 9
      Seq.fill(4)((5L, 960L)) ++                      // cur: item5 = 4
      Seq.fill(2)((2L, 970L)) ++                      // cur: item2 = 2
      Seq.fill(5)((1L, 850L)) ++                      // prev: item1 = 5
      Seq.fill(3)((2L, 860L)) ++                      // prev: item2 = 3
      Seq.fill(2)((3L, 870L)) ++                      // prev: item3 = 2
      Seq((3L, 100L))                                 // outside both windows
    val events = rows.toDF("item", "sec")
      .select($"item", timestamp_seconds($"sec").as("ts"))
    val got = Behavior.topMovers(events, "item", "ts", k = 3,
        periodSec = 100L)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 1L, 9L, 1L, 5L, "flat"),
      (2L, 3L, 2L, 2L, 3L, "down"),
      (5L, 2L, 4L, 0L, 0L, "entered"),
      (3L, 0L, 0L, 3L, 2L, "left")))
  }

  test("twap: step-interpolated durations, decimal numerator, single-obs series drops") {
    import graft.ops.Behavior
    val rows = Seq( // (series, sec, tie, value)
      ("a", 0L, 1L, 10.0), ("a", 10L, 2L, 20.0), ("a", 40L, 3L, 2.0),
      ("a", 100L, 4L, 999.0), // last obs: no duration, both sums skip it
      ("b", 5L, 5L, 7.5),     // single obs — no durations, no row
      ("c", 0L, 6L, 0.5), ("c", 2L, 7L, 1.0))
    val events = rows.toDF("series", "sec", "tie", "value")
      .select($"series", timestamp_seconds($"sec").as("ts"), $"tie",
        $"value")
    val got = Behavior.twap(events, "series", "ts", "tie", "value")
      .as[(String, Long, Long, Double)].collect().toSet
    // a: (10·10 + 20·30 + 2·60) / 100 = 820/100
    assert(got === Set(("a", 3L, 100L, 8.2), ("c", 1L, 2L, 0.5)))
  }

  test("journeyPaths: per-user triples, corpus-wide counts, lexicographic tie-break") {
    import graft.ops.Behavior
    val rows = Seq( // (user, item, sec, tie)
      (1L, 5L, 10L, 1L), (1L, 6L, 20L, 2L), (1L, 5L, 30L, 3L),
      (1L, 7L, 40L, 4L),                    // → (5,6,5), (6,5,7)
      (2L, 5L, 10L, 5L), (2L, 6L, 20L, 6L), (2L, 5L, 30L, 7L), // → (5,6,5)
      (3L, 1L, 10L, 8L), (3L, 2L, 20L, 9L), (3L, 3L, 30L, 10L), // → (1,2,3)
      (4L, 9L, 10L, 11L), (4L, 9L, 20L, 12L)) // only 2 events: no triple
    val events = rows.toDF("user_id", "item_id", "sec", "event_id")
      .select($"user_id", $"item_id",
        timestamp_seconds($"sec").as("ts"), $"event_id")
    val got = Behavior.journeyPaths(events, "user_id", "item_id", "ts",
        "event_id", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (5L, 6L, 5L, 2L, 1L),
      (1L, 2L, 3L, 1L, 2L), // n=1 tie → lexicographic before (6,5,7)
      (6L, 5L, 7L, 1L, 3L)))
    // k truncates
    assert(Behavior.journeyPaths(events, "user_id", "item_id", "ts",
      "event_id", k = 1).count() === 1L)
  }

  test("abTest: strict-share conversion rule, md5 arms, z replayed in scala, saturation => z=0") {
    import graft.ops.Behavior
    // the same 60-bit md5 arm the operator computes, replayed by hand
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 2
    }
    // user u: 10 events, p_u purchases; converts iff 5*p > 10, i.e.
    // p >= 3 — u=2 sits EXACTLY at 1/5 share (5*2 = 10) and must NOT
    // convert (strict >); case-insensitivity via "PURCHASE"
    val p = Map(1L -> 0, 2L -> 2, 3L -> 3, 4L -> 5, 5L -> 10, 6L -> 1,
      7L -> 4, 8L -> 0)
    val events = p.toSeq.flatMap { case (u, k) =>
      Seq.fill(k)((u, "PURCHASE")) ++ Seq.fill(10 - k)((u, "pv"))
    }.toDF("user_id", "event_type")
    val conv = p.map { case (u, k) => u -> (5 * k > 10) }
    val byArm = p.keys.groupBy(arm)
    val (n0, x0) = (byArm(0L).size.toLong, byArm(0L).count(conv).toLong)
    val (n1, x1) = (byArm(1L).size.toLong, byArm(1L).count(conv).toLong)
    assume(n0 > 0 && n1 > 0) // both arms populated for this user set
    val row = Behavior.abTest(events, "user_id", "event_type", "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().head
    val pool = (x0 + x1).toDouble / (n0 + n1).toDouble
    val z = if (x0 + x1 == 0 || x0 + x1 == n0 + n1) 0.0
      else (x1.toDouble / n1 - x0.toDouble / n0) /
        math.sqrt(pool * (1.0 - pool) * (1.0 / n0 + 1.0 / n1))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row === ((n0, x0, n1, x1,
      r6(x0.toDouble / n0), r6(x1.toDouble / n1), r6(z),
      math.abs(z) > 1.96)))
    // saturated read-out: everyone converts => z pinned to 0, not
    // significant (identical rates carry no evidence)
    val allConv = Seq(1L, 2L, 3L, 4L).flatMap(u =>
      Seq.fill(10)((u, "purchase"))).toDF("user_id", "event_type")
    val sat = Behavior.abTest(allConv, "user_id", "event_type", "purchase")
      .select($"z_score", $"significant").as[(Double, Boolean)]
      .collect().head
    assert(sat === ((0.0, false)))
    // mixed-case convType argument must match, not silently measure 0
    val mixed = Behavior.abTest(events, "user_id", "event_type", "Purchase")
      .select($"conv_control" + $"conv_treat").as[Long].collect().head
    assert(mixed === x0 + x1)
  }

  test("gapFill: missing hours carry the last observed count, flagged unobserved; grids are per-series") {
    import graft.ops.Behavior
    // series a: hours 0 (5 events) and 3 (2 events) — 1 and 2 filled;
    // series b: single hour (no gaps, no fill)
    val rows = Seq.fill(5)(("a", 7L)) ++
      Seq.fill(2)(("a", 3L * 3600 + 9)) ++ Seq(("b", 3600L))
    val events = rows.toDF("event_type", "sec")
      .select($"event_type", timestamp_seconds($"sec").as("ts"))
    val got = Behavior.gapFill(events, "event_type", "ts")
      .select($"series", unix_timestamp($"bucket"), $"cnt", $"observed")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      ("a", 0L, 5L, true),
      ("a", 3600L, 5L, false),   // filled from hour 0
      ("a", 7200L, 5L, false),
      ("a", 10800L, 2L, true),
      ("b", 3600L, 1L, true)))   // b's grid starts at ITS min, not a's
    // warehouse path: slices split mid-hour, merged, served through
    // the SAME body — identical grid (the trafficSpikesFromCounts rule)
    val sliced = Behavior.hourCountSlices(
      events.withColumn("slice", monotonically_increasing_id() % 2),
      "event_type", "ts", "slice")
    val fromStore = Behavior.gapFillFromCounts(
        Behavior.hourCountMerge(sliced))
      .select($"series", unix_timestamp($"bucket"), $"cnt", $"observed")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(fromStore === got)
  }

  test("growthAccounting: new/retained/resurrected/churned hand-traced; growth identity holds; last day right-censored") {
    import graft.ops.Behavior
    // u1: d1 d2 d4 — new, retained, (churn d3), resurrected, (churn d5)
    // u2: d1       — new, (churn d2)
    // u3: d2 d3 d5 — new, retained, (churn d4), resurrected, no churn
    //                after d5 (maxDay: right-censored, not churn)
    val rows = Seq((1L, 1), (1L, 1), (1L, 2), (1L, 4), // u1 twice on d1:
      (2L, 1), (3L, 2), (3L, 3), (3L, 5))              // the distinct rule
    val events = rows.toDF("user_id", "d")
      .select($"user_id",
        to_timestamp(concat(lit("2024-01-0"), $"d", lit(" 10:00:00")))
          .as("ts"))
    val got = Behavior.growthAccounting(events, "user_id", "ts")
      .select(dayofmonth($"day"), $"new_users", $"retained_users",
        $"resurrected_users", $"churned_users")
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1, 2L, 0L, 0L, 0L),
      (2, 1L, 1L, 0L, 1L),
      (3, 0L, 1L, 0L, 1L),
      (4, 0L, 0L, 1L, 1L),
      (5, 0L, 0L, 1L, 1L)))
    // the reconciliation identity: churned(d) = DAU(d-1) - retained(d)
    val byDay = got.map(r => r._1 -> r).toMap
    for (d <- 2 to 5) {
      val dauPrev = byDay(d - 1)._2 + byDay(d - 1)._3 + byDay(d - 1)._4
      assert(byDay(d)._5 === dauPrev - byDay(d)._3, s"identity at d$d")
    }
  }

  test("stickiness: trailing-window distincts by expansion, partial head windows, ppm integer-truncates") {
    import graft.ops.Behavior
    // u1: d1 d3; u2: d1 d2; u3: d1 — weekDays=2, monthDays=3
    val events = Seq((1L, 1), (1L, 3), (2L, 1), (2L, 2), (3L, 1))
      .toDF("user_id", "d")
      .select($"user_id",
        to_timestamp(concat(lit("2024-01-0"), $"d", lit(" 10:00:00")))
          .as("ts"))
    val got = Behavior.stickiness(events, "user_id", "ts",
        weekDays = 2, monthDays = 3)
      .select(dayofmonth($"day"), $"dau", $"wau", $"mau",
        $"stickiness_ppm")
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1, 3L, 3L, 3L, 1000000L),
      (2, 1L, 3L, 3L, 333333L), // 1e6/3 truncates — div, not round
      (3, 1L, 2L, 3L, 333333L)))
  }

  test("interEventGaps: whole-second deltas per user attributed to the earlier type; ties break on id; last events emit nothing") {
    import graft.ops.Behavior
    // u1: view@10.9 -> click@12.1 -> buy@12.1 (tie: id orders click
    //     before buy) -> view@20.0
    // u2: view@100.5 only — no successor, no row
    val events = Seq(
      (1L, 1L, "view", 10.9), (1L, 2L, "click", 12.1),
      (1L, 3L, "buy", 12.1), (1L, 4L, "view", 20.0),
      (2L, 5L, "view", 100.5))
      .toDF("user_id", "event_id", "event_type", "sec")
      .select($"user_id", $"event_id", $"event_type",
        timestamp_seconds($"sec").as("ts"))
    val got = Behavior.interEventGaps(events, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, Long)].collect().toSeq.sorted
    // unix_timestamp floors FIRST: 12-10=2, 12-12=0, 20-12=8
    assert(got === Seq(("buy", 8L), ("click", 0L), ("view", 2L)))
  }

  test("bounceRate: gap sessionization, boundary gap stays one session, bounce = single-event session, day from session start") {
    import graft.ops.Behavior
    // gapS=100. u1: {10,50} one session, {500} a bounce; u2: {10} a
    // bounce; u4: {0,100} — gap EXACTLY 100 does NOT split (> rule);
    // u3: day-2 single event — its own day row
    val events = Seq(
      (1L, 1L, 10L), (1L, 2L, 50L), (1L, 3L, 500L),
      (2L, 4L, 10L), (4L, 5L, 0L), (4L, 6L, 100L),
      (3L, 7L, 86400L + 10L))
      .toDF("user_id", "event_id", "sec")
      .select($"user_id", $"event_id", timestamp_seconds($"sec").as("ts"))
    val got = Behavior.bounceRate(events, "user_id", "ts", "event_id",
        gapS = 100L)
      .select(dayofmonth($"day"), $"n_sessions", $"n_bounces",
        $"bounce_ppm")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1, 4L, 2L, 500000L),
      (2, 1L, 1L, 1000000L)))
  }

  test("trendingItems: per-day halving, 63-day shift clamp (an unclamped 64 would wrap to FULL weight), sort-limit k") {
    import graft.ops.Behavior
    // max day = 2024-03-05. item 1: 2 events on max day (2*2^20);
    // item 2: 3 events one day earlier (3*2^19); item 3: one event 64
    // days earlier — clamped shift 63 -> weight 0 (unclamped JVM
    // masking would give it FULL 2^20 and rank it first)
    val events = Seq(
      (1L, "2024-03-05"), (1L, "2024-03-05"),
      (2L, "2024-03-04"), (2L, "2024-03-04"), (2L, "2024-03-04"),
      (3L, "2024-01-01"))
      .toDF("item_id", "d")
      .select($"item_id", to_timestamp($"d").as("ts"))
    val top2 = Behavior.trendingItems(events, "item_id", "ts", k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(top2 === Seq((1L, 2097152L, 2L), (2L, 1572864L, 3L)))
    val all = Behavior.trendingItems(events, "item_id", "ts", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(all.last === ((3L, 0L, 1L))) // clamped to zero, still emits
  }

  test("trendingFromCounts: warehouse read ≡ log read, incl. an hour split across slices") {
    import graft.ops.Behavior
    // items 1/2/3 across days; the 03:xx hour of item 1 arrives in
    // TWO slices — the merge must sum it before the decay body
    val events = Seq(
      (1L, "2024-03-05 03:10:00"), (1L, "2024-03-05 03:40:00"),
      (2L, "2024-03-04 07:00:00"), (2L, "2024-03-04 07:30:00"),
      (2L, "2024-03-04 09:00:00"), (3L, "2024-01-01 00:00:00"))
      .toDF("item_id", "d")
      .select($"item_id", to_timestamp($"d").as("ts"))
      .withColumn("slice", monotonically_increasing_id() % 2)
    val fromLog = Behavior.trendingItems(events, "item_id", "ts", k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val fromStore = Behavior.trendingFromCounts(
      Behavior.hourCountMerge(
        Behavior.hourCountSlices(events, "item_id", "ts", "slice")),
      k = 10).as[(Long, Long, Long)].collect().toSeq
    assert(fromStore === fromLog)
    assert(fromLog.head === ((1L, 2097152L, 2L)))
  }

  test("nextItemTable: per-from top-k with ppm over the FULL row total (not just the kept head); count ties break on item") {
    import graft.ops.Behavior
    // a->b x3, a->c x1, a->d x1, b->a x1; k=2 keeps b,c for a — but
    // p_ppm still divides by a's full total 5 (the dropped d row)
    val pairs = (Seq.fill(3)(("a", "b")) ++
      Seq(("a", "c"), ("a", "d"), ("b", "a"))).toDF("f", "t")
    val got = Behavior.nextItemTable(pairs, "f", "t", k = 2)
      .as[(String, Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 1L, "b", 3L, 600000L),  // 3e6/5
      ("a", 2L, "c", 1L, 200000L),  // tie with d: c wins on item asc
      ("b", 1L, "a", 1L, 1000000L)))
  }

  test("robustAnomalies: integer median/MAD scaling hand-traced, incl. a half-integral median; 3-MAD cross-multiply flags") {
    import graft.ops.Behavior
    // series a daily counts 10,12,9,10,14,10,40: median 10 (med2 20),
    // dev2 = |2c−20| = 0,4,2,0,8,0,60 -> MAD median 2 (mad4 4); flags
    // where 2·dev2 > 12: the 14-count day AND the 40-count day —
    // exactly what q210's trailing mean smooths over.
    // series b counts 10,20: median 15 (half-integral -> med2 = 30
    // EXACT), dev2 = 10,10, mad4 = 20, no flags.
    val counts = Seq(("a", 1, 10), ("a", 2, 12), ("a", 3, 9),
      ("a", 4, 10), ("a", 5, 14), ("a", 6, 10), ("a", 7, 40),
      ("b", 1, 10), ("b", 2, 20))
    val events = counts.flatMap { case (s, d, n) =>
        Seq.fill(n)((s, d)) }
      .toDF("series", "d")
      .select($"series",
        to_timestamp(concat(lit("2024-01-0"), $"d")).as("ts"))
    val got = Behavior.robustAnomalies(events, "series", "ts")
      .select($"series", dayofmonth($"day"), $"cnt", $"med2", $"dev2",
        $"mad4", $"is_anomaly")
      .as[(String, Int, Long, Long, Long, Long, Boolean)]
      .collect().toSet
    assert(got === Set(
      ("a", 1, 10L, 20L, 0L, 4L, false),
      ("a", 2, 12L, 20L, 4L, 4L, false),
      ("a", 3, 9L, 20L, 2L, 4L, false),
      ("a", 4, 10L, 20L, 0L, 4L, false),
      ("a", 5, 14L, 20L, 8L, 4L, true),
      ("a", 6, 10L, 20L, 0L, 4L, false),
      ("a", 7, 40L, 20L, 60L, 4L, true),
      ("b", 1, 10L, 30L, 10L, 20L, false),
      ("b", 2, 20L, 30L, 10L, 20L, false)))
  }
}
