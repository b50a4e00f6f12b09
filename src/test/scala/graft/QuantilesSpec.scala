package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** Specs for the distributed rank statistics: exactNtile must reproduce
  * SQL ntile exactly (the q40 oracle is DuckDB ntile) at multiple
  * partitionings, and guardedExactPercentiles must both match the plain
  * aggregate and actually raise past its group-size bound.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ordersProj = Tables.orders(spark, dir)
    .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))

  /** Reference assignment: the Window-based ntile this operator replaces. */
  private def windowNtile(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    ordersProj
      .select(col("o_orderkey"), ntile(k).over(w).cast("long").as("bucket"))
  }

  private def assertMatchesWindow(k: Int, partitions: Int): Unit = {
    val got = Quantiles.exactNtile(ordersProj, "o_orderpriority",
      Seq("o_totalprice", "o_orderkey"), k, partitions = partitions)
      .select(col("o_orderkey"), col("bucket"))
    val diff = got.join(windowNtile(k), Seq("o_orderkey", "bucket"), "full_outer")
      .filter(col("o_orderkey").isNull || col("bucket").isNull)
    assert(got.count() === ordersProj.count())
    assert(diff.count() === 0,
      s"exactNtile(k=$k, partitions=$partitions) diverges from SQL ntile")
  }

  test("exactNtile == SQL ntile on orders (k=10) at two partitionings") {
    assertMatchesWindow(10, 3)
    assertMatchesWindow(10, 16)
  }

  test("exactNtile == SQL ntile with non-divisible buckets (k=7)") {
    assertMatchesWindow(7, 5)
  }

  test("exactNtileGlobal == keyless SQL ntile; plan stays Window-free") {
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val want = ordersProj
      .select(col("o_orderkey"), ntile(7).over(w).cast("long").as("bucket"))
    val gotDf = Quantiles.exactNtileGlobal(ordersProj,
      Seq("o_totalprice", "o_orderkey"), 7, partitions = 5)
    val got = gotDf.select(col("o_orderkey"), col("bucket"))
    val diff = got.join(want, Seq("o_orderkey", "bucket"), "full_outer")
      .filter(col("o_orderkey").isNull || col("bucket").isNull)
    assert(got.count() === ordersProj.count())
    assert(diff.count() === 0, "exactNtileGlobal diverges from keyless SQL ntile")
    assert(!gotDf.queryExecution.executedPlan.toString.contains("Window"),
      "exactNtileGlobal regressed to the single-task global Window sort")
  }

  test("exactNtile: groups smaller than k get one row per leading bucket") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", 3.0, 3L))
      .toDF("g", "v", "id")
    val got = Quantiles.exactNtile(df, "g", Seq("v", "id"), 10, partitions = 2)
      .select(col("id"), col("bucket")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("exactNtile: null group keys form their own group") {
    val df = Seq((Some("a"), 1.0, 1L), (None, 5.0, 2L), (None, 1.0, 3L),
      (Some("a"), 2.0, 4L)).toDF("g", "v", "id")
    val got = Quantiles.exactNtile(df, "g", Seq("v", "id"), 2, partitions = 3)
      .select(col("id"), col("bucket")).as[(Long, Long)].collect().toMap
    // null group: ids 3 (v=1) then 2 (v=5) → buckets 1, 2
    assert(got === Map(1L -> 1L, 4L -> 2L, 3L -> 1L, 2L -> 2L))
  }

  test("exactNtile: inputs already carrying helper-named columns pass through") {
    // "_pid" and "_N" (case-insensitive clash with the internal "_n")
    // must survive with their values intact — the helper names are
    // probed against the input and suffixed away (VERDICT r6)
    val df = Seq(("a", 1.0, 1L, 77, "x"), ("a", 2.0, 2L, 88, "y"),
      ("b", 3.0, 3L, 99, "z")).toDF("g", "v", "id", "_pid", "_N")
    val out = Quantiles.exactNtile(df, "g", Seq("v", "id"), 2, partitions = 2)
    assert(out.columns.toSeq === Seq("g", "v", "id", "_pid", "_N", "bucket"))
    val got = out.select(col("id"), col("_pid"), col("_N"), col("bucket"))
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got === Set((1L, 77, "x", 1L), (2L, 88, "y", 2L), (3L, 99, "z", 1L)))
  }

  test("guardedExactPercentiles matches the plain percentile aggregate") {
    val got = Quantiles.guardedExactPercentiles(
      Tables.orders(spark, dir), "o_orderpriority", "o_totalprice",
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
    val want = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.25)), 2).as("p25"),
        round(percentile(col("o_totalprice"), lit(0.5)), 2).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.75)), 2).as("p75"),
        count(lit(1)).as("cnt"))
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("guardedExactPercentiles raises past maxGroupRows, naming the approx path") {
    val e = intercept[IllegalArgumentException] {
      Quantiles.guardedExactPercentiles(
        Tables.orders(spark, dir), "o_orderpriority", "o_totalprice",
        Seq(0.5 -> "p50"), maxGroupRows = 10)
    }
    assert(e.getMessage.contains("approx_percentile"))
  }
}
