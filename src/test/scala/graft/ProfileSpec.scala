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
}
