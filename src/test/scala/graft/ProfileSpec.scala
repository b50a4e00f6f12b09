package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

/** Spec for the exact table-profiling read (q218). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("profile: per-column counts, nulls, distincts, typed bounds in one pass") {
    val df = Seq[(java.lang.Long, String, java.lang.Double, Long)](
      (1L, "b", 2.5, 10L), (2L, "a", null, 10L), (null, "a", 7.25, 11L),
      (2L, null, 2.5, 12L))
      .toDF("id", "tag", "v", "sec")
      .select($"id", $"tag", $"v",
        org.apache.spark.sql.functions.timestamp_seconds($"sec").as("ts"))
    val got = Profile.table(df, numCols = Seq("id", "v"),
        strCols = Seq("tag"), tsCols = Seq("ts"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSet
    assert(got === Set(
      ("id", 4L, 1L, 2L, Some(1.0), Some(2.0), None, None),
      ("v", 4L, 1L, 2L, Some(2.5), Some(7.25), None, None),
      ("tag", 4L, 1L, 2L, None, None, Some("a"), Some("b")),
      // ts projects to epoch seconds; two rows share second 10
      ("ts", 4L, 0L, 3L, Some(10.0), Some(12.0), None, None)))
    // a column may be profiled under exactly one family
    intercept[IllegalArgumentException] {
      Profile.table(df, Seq("id"), Seq("id"), Nil)
    }
  }

  test("rollupSheet: per-prefix totals with the grouping bitmask; (all) marks rolled-up levels") {
    val df = Seq(
      ("web", "en", 10L), ("web", "en", 5L), ("web", "de", 7L),
      ("pdf", "en", 3L))
      .toDF("source", "lang", "n_chars")
    val got = Profile.rollupSheet(df, Seq("source", "lang"), "n_chars")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("web", "en", 0L, 2L, 15L),
      ("web", "de", 0L, 1L, 7L),
      ("pdf", "en", 0L, 1L, 3L),
      ("web", "(all)", 1L, 3L, 22L),   // lang rolled up (low bit)
      ("pdf", "(all)", 1L, 1L, 3L),
      ("(all)", "(all)", 3L, 4L, 25L))) // grand total: both bits set
    intercept[IllegalArgumentException] {
      Profile.rollupSheet(df, Nil, "n_chars")
    }
  }
}
