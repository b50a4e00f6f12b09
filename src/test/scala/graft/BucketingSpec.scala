package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

/** Pins the property Bucketing exists for: a join between two tables
  * bucketed on the join key with the same bucket count plans with ZERO
  * Exchange — the recurring both-sides shuffle of a big-to-big join is
  * paid once at write time instead of on every run.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join with no Exchange and match the plain join") {
    val base = java.nio.file.Files.createTempDirectory("graft-buckets-")
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val customer = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    try {
      Bucketing.writeBucketed(orders, "b_orders", Seq("o_custkey"), 8,
        sortCols = Seq("o_custkey"), path = Some(base.resolve("orders").toString))
      Bucketing.writeBucketed(customer, "b_customer", Seq("c_custkey"), 8,
        sortCols = Seq("c_custkey"), path = Some(base.resolve("customer").toString))

      // disable broadcast so the join would otherwise be a shuffle SMJ —
      // the shape bucketing must eliminate
      val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_orders").join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        val agg = joined.groupBy(col("c_custkey"))
          .agg(sum(col("o_totalprice")).as("spend"))
        joined.collect() // force final (non-AQE-pending) plan
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join still shuffles:\n$plan")
        // the bucket hash partitioning ALSO satisfies the downstream
        // groupBy on the same key: still no Exchange end-to-end
        agg.collect()
        val aggPlan = agg.queryExecution.executedPlan.toString
        assert(!aggPlan.contains("Exchange"),
          s"groupBy over the bucketed join re-shuffles:\n$aggPlan")

        // values: identical to the plain (shuffling) join
        val got = joined.select(col("o_orderkey"), col("c_name"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === want)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }
  }

  test("zValue: exact Morton interleave, bijective on the bits-bounded grid") {
    import spark.implicits._
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    val zs = grid.select(col("x"), col("y"),
        Bucketing.zValue(col("x"), col("y"), bits = 3).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(zs.map(_._3).toSet === (0L until 64L).toSet) // bijection
    val byXy = zs.map(t => (t._1, t._2) -> t._3).toMap
    // hand-interleaved: x=3 (011) even positions, y=5 (101) odd
    assert(byXy((1L, 0L)) === 1L && byXy((0L, 1L)) === 2L)
    assert(byXy((3L, 5L)) === 39L)
    // negative coordinates fail LOUDLY (arithmetic shiftright would
    // silently collapse them onto the all-ones curve corner)
    val err = intercept[Exception] {
      Seq((-1L, 2L)).toDF("x", "y")
        .select(Bucketing.zValue(col("x"), col("y"), bits = 3)).collect()
    }
    assert(err.getMessage.contains("negative coordinate"))
  }

  test("zOrderWrite: a box filter on BOTH dimensions prunes most files by footer stats") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zorder-")
    try {
      // 64×64 grid, 16 files: each range segment of the 6-bit curve is
      // ~a 16×16 block, so a 16×16 box overlaps a couple of files —
      // while ANY single-column sort layout would leave the second
      // dimension spanning [0,63] in every file (nothing prunes)
      val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
        .toDF("x", "y")
      val path = base.resolve("z").toString
      Bucketing.zOrderWrite(grid, "x", "y", bits = 6, path, numFiles = 16)
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      assert(files.length === 16)
      // the data round-trips (layout job must lose/duplicate nothing)
      assert(spark.read.parquet(path).count() === 64L * 64L)
      val overlapping = files.count { f =>
        val Array(x0, x1, y0, y1) = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y"))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        x0 <= 15L && x1 >= 0L && y0 <= 15L && y1 >= 0L
      }
      assert(overlapping <= 4,
        s"z-order box should prune to <=4 of 16 files, overlapped $overlapping")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
