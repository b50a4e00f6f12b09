package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PrefixSum

/** Direct contract tests for the shared prefix-sum core (its callers —
  * exactNtile/exactNtileGlobal count-mode, packSequences keyless
  * value-mode — cover two of the four mode combinations; this spec
  * pins the remaining grouped+value mode and the invariants all modes
  * share): the running totals must equal the Window formulation they
  * replace, at any partition count, with null group keys forming
  * their own group, and without a Window in the plan.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // deterministic pseudo-random values (no RNG state): Knuth hash
  private def data = (1 to 500).map { i =>
    (if (i % 11 == 0) null else s"g${i % 7}", i.toLong, (i * 2654435761L % 97) + 1L)
  }.toDF("g", "id", "v")

  test("grouped value sums == Window running sum; group totals; several partitionings") {
    val w = Window.partitionBy(col("g")).orderBy(col("id"))
    val want = data
      .withColumn("run", sum(col("v")).over(w))
      .withColumn("tot", sum(col("v")).over(Window.partitionBy(col("g"))))
      .select(col("id"), col("run"), col("tot"))
    for (p <- Seq(1, 3, 16)) {
      val gotDf = PrefixSum.runningTotals(data, Seq("g"), Seq("id"),
        valueCol = Some("v"), runCol = "run", totCol = Some("tot"),
        partitions = p)
      val got = gotDf.select(col("id"), col("run"), col("tot"))
      val diff = got.join(want, Seq("id", "run", "tot"), "full_outer")
        .filter(col("id").isNull || col("run").isNull || col("tot").isNull)
      assert(got.count() === 500)
      assert(diff.count() === 0,
        s"runningTotals(partitions=$p) diverges from the Window form")
      assert(!gotDf.queryExecution.executedPlan.toString.contains("Window"))
    }
  }

  test("keyless count mode == global row_number over the order") {
    val proj = data.select(col("id"))
    val want = proj.withColumn("rn",
      row_number().over(Window.orderBy(col("id"))).cast("long"))
    val got = PrefixSum.runningTotals(proj, Nil, Seq("id"),
      valueCol = None, runCol = "rn", partitions = 5)
    val diff = got.join(want, Seq("id", "rn"), "full_outer")
      .filter(col("id").isNull || col("rn").isNull)
    assert(diff.count() === 0, "keyless count mode diverges from row_number")
  }

  test("helper-name collisions: inputs already carrying _pid/_off/run-name variants pass through") {
    // _pid/_off shadow PrefixSum's internals; the run column name is
    // chosen by the CALLER and must not be silently suffixed
    val df = Seq((1L, 5L, 9L), (2L, 6L, 9L)).toDF("id", "_pid", "_off")
    val out = PrefixSum.runningTotals(df, Nil, Seq("id"),
      valueCol = None, runCol = "r", partitions = 2)
    assert(out.columns.sorted === Array("_off", "_pid", "id", "r"))
    assert(out.select("id", "r").as[(Long, Long)].collect().toSet ===
      Set((1L, 1L), (2L, 2L)))
    // the shadowed input columns come through untouched
    assert(out.select("_pid", "_off").as[(Long, Long)].collect().toSet ===
      Set((5L, 9L), (6L, 9L)))
  }
}
