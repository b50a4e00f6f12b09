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

  test("zValueN: 3-way round-robin interleave, bijective; 2-col form ≡ zValue") {
    import spark.implicits._
    val grid = (for (x <- 0L until 4L; y <- 0L until 4L; w <- 0L until 4L)
      yield (x, y, w)).toDF("x", "y", "w")
    val zs = grid.select(col("x"), col("y"), col("w"),
        Bucketing.zValueN(Seq(col("x"), col("y"), col("w")), bits = 2).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    assert(zs.map(_._4).toSet === (0L until 64L).toSet) // bijection
    val byXyw = zs.map(t => (t._1, t._2, t._3) -> t._4).toMap
    // hand-interleaved: bit b of column i lands at 3b+i.
    // (1,0,0)→bit0=1; (0,1,0)→bit1=2; (0,0,1)→bit2=4;
    // (3,1,2): x=11→bits 0,3; y=01→bit 1; w=10→bit 5 ⇒ 1+8+2+32=43
    assert(byXyw((1L, 0L, 0L)) === 1L && byXyw((0L, 1L, 0L)) === 2L &&
      byXyw((0L, 0L, 1L)) === 4L)
    assert(byXyw((3L, 1L, 2L)) === 43L)
    // the 2-column form is zValue bit-for-bit (q136's oracle unchanged)
    val two = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .select(Bucketing.zValue(col("x"), col("y"), bits = 3).as("a"),
        Bucketing.zValueN(Seq(col("x"), col("y")), bits = 3).as("b"))
      .filter(col("a") =!= col("b"))
    assert(two.count() === 0L)
    // guards: negative coordinate raises; n*bits must fit a BIGINT
    val err = intercept[Exception] {
      Seq((1L, -2L, 3L)).toDF("x", "y", "w")
        .select(Bucketing.zValueN(Seq(col("x"), col("y"), col("w")), 2))
        .collect()
    }
    assert(err.getMessage.contains("negative coordinate"))
    intercept[IllegalArgumentException] {
      Bucketing.zValueN(Seq(col("x"), col("y"), col("w")), bits = 21)
    }
  }

  test("zOrderWriteN: a 3-dim box filter prunes most files by footer stats") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zorder3-")
    try {
      // 16×16×16 grid, 16 files: each range segment of the 4-bit curve
      // covers ~a 8×8×4 region; an 4×4×4 box overlaps a couple of
      // files, while any single-column sort leaves the other two
      // dimensions spanning [0,15] in every file
      val grid = (for (x <- 0L until 16L; y <- 0L until 16L;
                       w <- 0L until 16L) yield (x, y, w))
        .toDF("x", "y", "w")
      val path = base.resolve("z3").toString
      Bucketing.zOrderWriteN(grid, Seq("x", "y", "w"), bits = 4, path,
        numFiles = 16)
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
      assert(files.length === 16)
      assert(spark.read.parquet(path).count() === 16L * 16L * 16L)
      val overlapping = files.count { f =>
        val Array(x0, _, y0, _, w0, _) = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y"), min("w"), max("w"))
          .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
        x0 <= 3L && y0 <= 3L && w0 <= 3L
      }
      assert(overlapping <= 4,
        s"3-dim z-order box should prune to <=4 of 16 files, overlapped $overlapping")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
  }
}
