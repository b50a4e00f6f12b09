package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StreamMatch
import graft.plans.AsofJoin

/** The custom as-of join plan (logical node → injected strategy →
  * merge-scan exec): semantics vs the composable union+window form on
  * seeded random data, outer-null behavior, and the physical shape
  * (no WindowExec; the only exchanges are the two co-partitionings).
  */
class PlansSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("native as-of join matches the union+window operator on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
      .toDF("k", "lts", "pay_id")
    // right unique per (k, ts) for a deterministic winner
    val right = (1 to 300).map(i =>
      (rnd.nextInt(25).toLong, ts(rnd.nextInt(1000).toLong), i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rts", "click_id")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"pay_id", $"k", $"click_id", unix_timestamp($"asof_rts").as("at"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val native = norm(AsofJoin(left, right, "k", "lts", "rts", Seq("click_id")))
    val composed = norm(StreamMatch.asofJoin(left, right, "k", "lts", "rts", Seq("click_id")))
    assert(native === composed)
    assert(native.size === 400)
  }

  test("as-of exec: equal timestamps match; missing keys stay null; empty right side") {
    val left = Seq((1L, ts(10), 100L), (2L, ts(5), 101L)).toDF("k", "lts", "id")
    val right = Seq((1L, ts(10), "x")).toDF("k", "rts", "v")
    val out = AsofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(out === Set((100L, Some("x")), (101L, None)))
    val empty = AsofJoin(left, right.filter($"k" < 0), "k", "lts", "rts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(empty === Set((100L, None), (101L, None)))
  }

  test("null keys never match, not even each other (SQL equality, both forms)") {
    val left = Seq(
      (Some(1L), ts(10), 100L), (None, ts(10), 101L), (None, ts(20), 102L))
      .toDF("k", "lts", "id")
    val right = Seq(
      (Some(1L), ts(5), "hit"), (None, ts(5), "null-key-row"))
      .toDF("k", "rts", "v")
    val expected = Set(
      (100L, Some("hit")), (101L, None), (102L, None)) // null ≠ null
    val native = AsofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(native === expected)
    val composed = StreamMatch.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[String])].collect().toSet
    assert(composed === expected)
  }

  test("both sides from the same base relation (self-as-of) resolve and agree") {
    val ev = Seq(
      (1L, ts(10), "pay", 100L), (1L, ts(8), "click", 200L),
      (1L, ts(20), "pay", 101L), (1L, ts(15), "click", 201L),
      (2L, ts(5), "pay", 102L))
      .toDF("k", "t", "kind", "id")
    val pays = ev.filter($"kind" === "pay").select($"k", $"t".as("lts"), $"id".as("pay_id"))
    val clicks = ev.filter($"kind" === "click").select($"k", $"t".as("rts"), $"id".as("click_id"))
    val out = AsofJoin(pays, clicks, "k", "lts", "rts", Seq("click_id"))
      .select($"pay_id", $"click_id").as[(Long, Option[Long])].collect().toSet
    assert(out === Set((100L, Some(200L)), (101L, Some(201L)), (102L, None)))
  }

  test("exec emits UnsafeRows: direct collect/show without a projection on top") {
    val left = Seq((1L, ts(10), 100L), (2L, ts(4), 101L)).toDF("k", "lts", "id")
    val right = Seq((1L, ts(8), "x")).toDF("k", "rts", "v")
    // no .select(...) after the join — a ProjectExec must not be needed
    // to satisfy the UnsafeRow contract
    val rows = AsofJoin(left, right, "k", "lts", "rts", Seq("v")).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("id")).toSet === Set(100L, 101L))
  }

  test("null carried values stay paired with their own row (no cross-row mixing)") {
    // right rows: older one carries "x", the LATEST one carries null —
    // the as-of result must be (null value, newest ts), never "x" with
    // the newest ts
    val left = Seq((1L, ts(10), 100L)).toDF("k", "lts", "id")
    val right = Seq((1L, ts(3), Some("x")), (1L, ts(5), Option.empty[String]))
      .toDF("k", "rts", "v")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"id", $"v", unix_timestamp($"asof_rts").as("at"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    val expected = Set((100L, None, Some(5L)))
    assert(norm(AsofJoin(left, right, "k", "lts", "rts", Seq("v"))) === expected)
    assert(norm(StreamMatch.asofJoin(left, right, "k", "lts", "rts", Seq("v"))) === expected)
  }

  test("mismatched key or timestamp types are rejected loudly") {
    val left = Seq((1, ts(10), 100L)).toDF("k", "lts", "id")       // int key
    val right = Seq((1L, ts(8), "x")).toDF("k", "rts", "v")        // long key
    val ex = intercept[IllegalArgumentException] {
      AsofJoin(left, right, "k", "lts", "rts", Seq("v"))
    }
    assert(ex.getMessage.contains("types differ"))
  }

  test("physical plan uses AsofJoinExec with no WindowExec") {
    val left = Seq((1L, ts(10), 100L)).toDF("k", "lts", "id")
    val right = Seq((1L, ts(8), "x")).toDF("k", "rts", "v")
    val plan = AsofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(!plan.contains("Window"))
  }
}
