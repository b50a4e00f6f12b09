package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd

/** Specs for the SCD2 build and the point-in-time join (q219/q220). */
class ScdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def changes(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "sec", "event_id", "state")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"state")

  test("scd2: consecutive same-state rows collapse; validity chains; ts tie breaks on id") {
    val log = changes(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), // repeat: NO new version
      (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"), // a again: re-versions
      (2L, 10L, 5L, "x"),
      (3L, 50L, 7L, "q"), (3L, 50L, 6L, "p")) // tie at 50 → id order p,q
    val got = Scd.scd2(log, "user_id", "ts", "event_id", "state")
      .select($"user_id", $"state", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"is_current", $"version")
      .as[(Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSet
    assert(got === Set(
      (1L, "a", 10L, Some(30L), false, 1L),
      (1L, "b", 30L, Some(40L), false, 2L),
      (1L, "a", 40L, None, true, 3L),
      (2L, "x", 10L, None, true, 1L),
      (3L, "p", 50L, Some(50L), false, 1L), // tie: p (id 6) precedes q
      (3L, "q", 50L, None, true, 2L)))
  }

  test("pointInTime: right-open intervals, current version open-ended, pre-version facts keep null") {
    val dim = Scd.scd2(changes(
      (1L, 10L, 1L, "a"), (1L, 30L, 2L, "b")), "user_id", "ts",
      "event_id", "state")
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 29L),
      (103L, 1L, 30L), (104L, 1L, 99L), (105L, 2L, 50L))
      .toDF("fact_id", "user_id", "sec")
      .select($"fact_id", $"user_id", timestamp_seconds($"sec").as("fts"))
    val got = Scd.pointInTime(facts, dim, "user_id", "fts")
      .select($"fact_id", $"state").as[(Long, Option[String])]
      .collect().toSet
    assert(got === Set(
      (100L, None),        // before the first version
      (101L, Some("a")),   // boundary: valid_from inclusive
      (102L, Some("a")),
      (103L, Some("b")),   // boundary: valid_to exclusive (right-open)
      (104L, Some("b")),   // current version is open-ended
      (105L, None)))       // key with no dimension rows at all
  }

  private def cdcLog(rows: (Long, Long, Long, String, String)*) =
    rows.toDF("user_id", "sec", "event_id", "op", "state")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"op", $"state")

  test("cdcState retains tombstones; cdcServe drops them; ties break on tie col") {
    val log = cdcLog(
      (1L, 10L, 1L, "upsert", "a"), (1L, 20L, 2L, "upsert", "b"),
      (2L, 10L, 3L, "upsert", "x"), (2L, 30L, 4L, "delete", "x"),
      (3L, 50L, 6L, "upsert", "p"), (3L, 50L, 7L, "upsert", "q"))
    val st = Scd.cdcState(log, "user_id", "ts", "event_id", "state", "op")
      .select($"user_id", $"op", $"state").as[(Long, String, String)]
      .collect().toSet
    assert(st === Set((1L, "upsert", "b"), (2L, "delete", "x"),
      (3L, "upsert", "q"))) // ts tie at 50 → higher event_id wins
    val served = Scd.cdcServe(
        Scd.cdcState(log, "user_id", "ts", "event_id", "state", "op"))
      .select($"user_id", $"state").as[(Long, String)].collect().toSet
    assert(served === Set((1L, "b"), (3L, "q"))) // key 2 tombstoned
  }

  test("cdcApply(state(pre), post) equals one-shot state over the full log for ANY split") {
    val all = cdcLog(
      (1L, 10L, 1L, "upsert", "a"), (1L, 40L, 2L, "delete", "a"),
      (2L, 10L, 3L, "upsert", "x"), (2L, 50L, 4L, "upsert", "y"),
      (3L, 60L, 5L, "upsert", "n"), // key only in post
      (4L, 5L, 6L, "delete", "z"))  // deleted pre, never revived
    val oneShot = Scd.cdcState(all, "user_id", "ts", "event_id",
      "state", "op")
    // adversarial split: key 1's delete lands in PRE and key 2's older
    // row in POST — the merge must still pick per-key argmax, so a
    // tombstone survives an older upsert arriving later in the stream
    val pre = all.filter($"event_id".isin(2L, 4L, 6L))
    val post = all.filter(!$"event_id".isin(2L, 4L, 6L))
    val merged = Scd.cdcApply(
      Scd.cdcState(pre, "user_id", "ts", "event_id", "state", "op"),
      post, "user_id", "ts", "event_id", "state", "op")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", unix_timestamp($"ts"), $"tie", $"op", $"state")
        .as[(Long, Long, Long, String, String)].collect().toSet
    assert(canon(merged) === canon(oneShot))
    assert(Scd.cdcServe(merged).select($"user_id", $"state")
      .as[(Long, String)].collect().toSet === Set((2L, "y"), (3L, "n")))
  }

  test("scd2Apply: same-state boundary collapses, different state closes, new keys version from 1") {
    val pre = changes(
      (1L, 10L, 1L, "a"), (1L, 30L, 2L, "b"), // key 1 current = b v2
      (2L, 10L, 3L, "x"))                     // key 2 current = x v1
    val post = changes(
      (1L, 50L, 4L, "b"),  // same state as current: collapses (no-op)
      (1L, 60L, 5L, "c"),  // closes b at 60, opens c v3
      (2L, 70L, 6L, "x"),  // no-op repeat
      (9L, 40L, 7L, "new")) // unseen key: versions from 1
    val dim = Scd.scd2(pre, "user_id", "ts", "event_id", "state")
    val got = Scd.scd2Apply(dim, post, "user_id", "ts", "event_id", "state")
      .select($"user_id", $"state", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"is_current", $"version")
      .as[(Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSet
    val rebuilt = Scd.scd2(pre.unionByName(post), "user_id", "ts",
        "event_id", "state")
      .select($"user_id", $"state", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"is_current", $"version")
      .as[(Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSet
    assert(got === rebuilt)
    assert(got === Set(
      (1L, "a", 10L, Some(30L), false, 1L),
      (1L, "b", 30L, Some(60L), false, 2L), // valid_from kept at 30
      (1L, "c", 60L, None, true, 3L),
      (2L, "x", 10L, None, true, 1L),       // untouched by the no-op
      (9L, "new", 40L, None, true, 1L)))
  }

  test("latestPerKeyTs + asofJoin: tie-deduped quotes serve inclusive as-of lookups deterministically") {
    import graft.ops.StreamMatch
    val facts = Seq((10L, 1L, 50L), (11L, 1L, 5L), (12L, 1L, 20L),
      (13L, 2L, 99L))
      .toDF("fact_id", "user_id", "fsec")
      .select($"fact_id", $"user_id", timestamp_seconds($"fsec").as("fts"))
    val raw = Seq(
      (1L, 10L, 1L, 100.0), (1L, 20L, 2L, 200.0),
      (1L, 20L, 3L, 250.0), // same ts: event_id 3 wins the dedupe
      (1L, 40L, 4L, 400.0))
      .toDF("user_id", "qsec", "event_id", "value")
      .select($"user_id", timestamp_seconds($"qsec").as("qts"),
        $"event_id", $"value")
    val quotes = Scd.latestPerKeyTs(raw, "user_id", "qts", "event_id",
      "value")
    assert(quotes.count() === 3) // the (1, 20) pair collapsed
    val got = StreamMatch.asofJoin(facts, quotes, "user_id", "fts",
        "qts", Seq("value"))
      .select($"fact_id", unix_timestamp($"asof_qts"), $"value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got === Set(
      (10L, Some(40L), Some(400.0)), // latest quote <= 50
      (11L, None, None),             // before any quote: null-extended
      (12L, Some(20L), Some(250.0)), // INCLUSIVE boundary + tie winner
      (13L, None, None)))            // key with no quotes at all
  }

  test("scd2Apply raises when a slice row predates the current version") {
    val dim = Scd.scd2(changes((1L, 30L, 1L, "a")), "user_id", "ts",
      "event_id", "state")
    val bad = changes((1L, 10L, 2L, "b")) // predates valid_from = 30
    val ex = intercept[Exception] {
      Scd.scd2Apply(dim, bad, "user_id", "ts", "event_id", "state")
        .collect()
    }
    assert(ex.getMessage.contains("scd2Apply") ||
      ex.getCause != null && ex.getCause.getMessage.contains("scd2Apply"))
  }

  test("cdcServe raises on a null op instead of silently dropping the row") {
    // op =!= 'delete' on a null op is null-false: the row would vanish
    // from the serve read without a trace (ADVICE r16) — malformed
    // state raises loudly instead
    val state = Seq((1L, 10L, 1L, "upsert", "a"),
        (2L, 20L, 2L, null.asInstanceOf[String], "b"))
      .toDF("user_id", "sec", "tie", "op", "state")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"tie", $"op", $"state")
    val ex = intercept[Exception] { Scd.cdcServe(state).collect() }
    assert(ex.getMessage.contains("null op") ||
      ex.getCause != null && ex.getCause.getMessage.contains("null op"))
  }

  test("scd2Apply enforces the tie contract: numeric type required, negative/null tie raises") {
    val dim = Scd.scd2(changes((1L, 10L, 1L, "a")), "user_id", "ts",
      "event_id", "state")
    // a STRING tie cannot sort after the -1 seed sentinel ("-1" is not
    // minimal in string order) — rejected at plan time
    val strTie = Seq((1L, 20L, "z9", "b"))
      .toDF("user_id", "sec", "event_id", "state")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"state")
    intercept[IllegalArgumentException] {
      Scd.scd2Apply(dim, strTie, "user_id", "ts", "event_id", "state")
    }
    // a NEGATIVE tie would sort before the seed at equal ts and
    // mis-version silently — raises per row instead
    val negTie = changes((1L, 20L, -5L, "b"))
    val ex = intercept[Exception] {
      Scd.scd2Apply(dim, negTie, "user_id", "ts", "event_id", "state")
        .collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      ex.getCause != null &&
        ex.getCause.getMessage.contains("non-negative"))
    // a non-negative tie at the current version's exact ts still works
    // (the seed must win the tie): same state collapses into the seed
    val ok = Scd.scd2Apply(dim, changes((1L, 10L, 0L, "a")),
        "user_id", "ts", "event_id", "state")
      .select($"user_id", $"state", $"is_current", $"version")
      .as[(Long, String, Boolean, Long)].collect().toSet
    assert(ok === Set((1L, "a", true, 1L)))
  }

  test("scd2: a key whose FIRST change row has a null state still versions it") {
    // lag-on-state conflates "no previous row" with "previous state
    // was null" — the first row must version regardless (r16 review)
    val log = Seq[(Long, Long, Long, String)](
      (1L, 10L, 1L, null), (1L, 30L, 2L, "a"),
      (2L, 10L, 3L, null), (2L, 20L, 4L, null)) // null→null collapses
      .toDF("user_id", "sec", "event_id", "state")
      .select($"user_id", timestamp_seconds($"sec").as("ts"),
        $"event_id", $"state")
    val got = Scd.scd2(log, "user_id", "ts", "event_id", "state")
      .select($"user_id", $"state", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"is_current", $"version")
      .as[(Long, Option[String], Long, Option[Long], Boolean, Long)]
      .collect().toSet
    assert(got === Set(
      (1L, None, 10L, Some(30L), false, 1L), // the [10,30) null interval
      (1L, Some("a"), 30L, None, true, 2L),
      (2L, None, 10L, None, true, 1L)))      // collapse still works
  }
}
