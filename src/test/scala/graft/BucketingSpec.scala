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
}
