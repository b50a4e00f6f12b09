package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashing, Md5Long60}

class Md5Long60Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("native expression equals the conv(substring(md5)) chain on random strings") {
    val df = (1 to 200).map(i => s"value_${i}_${"x" * (i % 17)}").toDF("s")
    val cmp = df.select(
      Md5Long60(spark, $"s".cast("binary")).as("fast"),
      Hashing.md5Long($"s").as("chain"))
    assert(cmp.filter($"fast" =!= $"chain").count() === 0)
  }

  test("SQL registration and null propagation") {
    Md5Long60.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT md5_long60(CAST('a' AS BINARY)) AS h, md5_long60(CAST(NULL AS BINARY)) AS n")
      .collect()(0)
    assert(r.getLong(0) === 57446577476672362L) // == DuckDB ('0x'||substr(md5('a'),1,15))::BIGINT
    assert(r.isNullAt(1))
  }

  test("participates in whole-stage codegen in flat projections") {
    Md5Long60.ensureRegistered(spark)
    val plan = spark.range(10)
      .selectExpr("md5_long60(CAST(CAST(id AS STRING) AS BINARY)) AS h")
      .queryExecution.executedPlan
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.toString.contains("*(1) Project [md5_long60"))
  }
}
