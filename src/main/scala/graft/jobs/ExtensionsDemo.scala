package graft.jobs

import org.apache.spark.sql.SparkSession

/** Proves the `spark.sql.extensions=graft.functions.GraftExtensions`
  * config path end-to-end on a fresh session: the native functions
  * resolve from plain SQL with no manual registration, the as-of join
  * strategy is installed by the extensions, and AsofJoin.apply's
  * idempotent runtime registration detects it and adds nothing — the
  * planner ends up with exactly one strategy instance.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val h = spark.sql(
      "SELECT md5_long60(CAST('abc' AS BINARY)) AS h, " +
        "array_dot(array(1D, 2D), array(3D, 4D)) AS d, " +
        "array_sqdiff(array(1D), array(3D)) AS s").head()
    assert(h.getLong(0) == graft.functions.Md5Long60.hash("abc".getBytes("UTF-8")))
    assert(h.getDouble(1) == 11.0 && h.getDouble(2) == 4.0)
    println(s"functions: md5_long60=${h.getLong(0)} array_dot=${h.getDouble(1)} " +
      s"array_sqdiff=${h.getDouble(2)}")

    val strategies = spark.sessionState.planner.strategies
    assert(strategies.exists(_.isInstanceOf[graft.plans.AsofJoinStrategy]),
      s"AsofJoinStrategy not installed; got ${strategies.map(_.getClass.getSimpleName)}")
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 100L))
      .toDF("k", "lts", "id")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:08"), "x"))
      .toDF("k", "rts", "v")
    val out = graft.plans.AsofJoin(left, right, "k", "lts", "rts", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    val installed = spark.sessionState.planner.strategies
      .count(_.isInstanceOf[graft.plans.AsofJoinStrategy])
    assert(installed == 1,
      s"expected exactly one AsofJoinStrategy (extensions copy only), got $installed")
    println(s"asof strategy via extensions (1 instance): ${out.collect().mkString(", ")}")
    spark.stop()
  }
}
