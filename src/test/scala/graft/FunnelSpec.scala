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

  test("windowFunnel: anchor timestamps surface as epoch micros") {
    val df = events((9L, "view", 10L), (9L, "click", 20L))
    val row = Funnel.windowFunnel(df, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), "2 DAY").collect().head
    assert(row.getAs[Long]("t1_us") === 10000000L)
    assert(row.getAs[Long]("t2_us") === 20000000L)
    assert(row.isNullAt(row.fieldIndex("t3_us")))
  }
}
