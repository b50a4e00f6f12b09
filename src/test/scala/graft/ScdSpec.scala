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
}
