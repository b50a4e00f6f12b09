package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs end-to-end on sf0.001 and the
  * entry() flagship returns rows (mirrors the driver's t1 gate).
  * Cross-checks a few closed-form invariants of the test data.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("coveredBy is total over the no-oracle queries and every twin is oracled") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === SparkEntry.coveredBy.keySet,
      "every query without a direct oracle must name its oracled "
        + s"band twin (uncovered: ${noOracle -- SparkEntry.coveredBy.keySet}; "
        + s"stale: ${SparkEntry.coveredBy.keySet -- noOracle})")
    val badTwin = SparkEntry.coveredBy.values.toSet --
      SparkEntry.oracleSql.keySet
    assert(badTwin.isEmpty, s"twin without an oracle: $badTwin")
  }

  test("pv windows sum to total view count") {
    import org.apache.spark.sql.functions._
    val views = Tables.events(spark, dir)
      .filter(col("event_type") === "view").count()
    val summed = SparkEntry.queries("q01_pv_hourly")(spark, dir)
      .agg(sum("cnt")).head().getLong(0)
    assert(summed === views)
  }

  test("sliding windows multiply rows by duration/slide") {
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error").count()
    val summed = SparkEntry.queries("q05_marketing_total")(spark, dir)
      .agg(sum("cnt")).head().getLong(0)
    assert(summed === base * 6)  // 1h/10m ⇒ 6 windows per event
  }
}
