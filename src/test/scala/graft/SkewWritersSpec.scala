package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew
import graft.sources.Writers

class SkewWritersSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("saltedJoin equals the plain join, including on a pathologically hot key") {
    // 90% of big rows share key 1 (the hot key)
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "row_id")
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"))
      .toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .select("k", "row_id", "label").as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(big, small, "k", 8, "row_id")
      .select("k", "row_id", "label").as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
    assert(plain.length === 902)
  }

  test("partitionedParquet lays out prunable directories with bounded files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-writer-").toString
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("part", "v")
    Writers.partitionedParquet(df, dir, Seq("part"), maxRecordsPerFile = 10)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet === Set("part=0", "part=1", "part=2"))
    // bounded files: each partition (~33 rows) must split into >= 2 files
    assert(new java.io.File(s"$dir/part=0").listFiles()
      .count(_.getName.endsWith(".parquet")) >= 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    // partition filter prunes to one directory
    val plan = back.filter($"part" === 1).queryExecution.executedPlan.toString
    assert(!plan.contains("part=0"))
  }
}
