package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (see TESTDATA.md).
  *
  * Each table is a single parquet file under the sf-scale directory.
  * Reads go through the DataSource V2 parquet scan, so Catalyst pushes
  * filters and prunes columns into the scan automatically — callers
  * should express selection/projection declaratively and never
  * pre-materialize.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in two physical forms across driver data
    * generations, both normalized here to plain TimestampType (UTC
    * instants) so every downstream query sees one type:
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright — read as
    *     a nanos long (legacy conf) and convert via integer division
    *     (micros); no double round-trip, no precision loss beyond the
    *     intrinsic micros truncation.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as
    *     TIMESTAMP_NTZ by default, which breaks instant-typed consumers
    *     (`cast(long)`, `unix_micros`, watermarks). Disabling NTZ
    *     inference reads the stored micros as an instant directly —
    *     timezone-independent, identical values to the nanos path.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = apply(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
}
