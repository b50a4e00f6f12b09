package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sharding

/** Shard-manifest contracts (ops/Sharding.scala, the q119 entry):
  * deterministic layout-independent assignment, per-shard token
  * intervals that tile exactly, and the Window-free plan the PrefixSum
  * core promises at low shard counts.
  */
class ShardingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs = (1 to 300).map { i =>
    (i.toLong, s"src${i % 3}", (i * 2654435761L % 50) + 1L)
  }.toDF("doc_id", "source", "n_tokens")

  test("intervals tile each shard exactly; assignment is layout-independent") {
    val m1 = Sharding.shardManifest(docs, "doc_id", "n_tokens", nShards = 8,
      carryCols = Seq("source"))
    val m2 = Sharding.shardManifest(docs.repartition(7), "doc_id", "n_tokens",
      nShards = 8, carryCols = Seq("source"))
    val rows = m1.select($"doc_id", $"source", $"n_tokens", $"shard",
        $"token_start", $"token_end", $"shard_tokens")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 300L))             // every doc, once
    assert(rows.forall(r => r._4 >= 0 && r._4 < 8))           // shard in range
    assert(rows.forall(r => r._6 - r._5 === r._3))            // end-start = n
    // per shard, in doc_id order: half-open intervals tile [0, total]
    rows.groupBy(_._4).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._1)
      var cursor = 0L
      sorted.foreach { r =>
        assert(r._5 === cursor, s"gap/overlap in shard $shard at doc ${r._1}")
        cursor = r._6
      }
      assert(sorted.forall(_._7 === cursor), s"shard_tokens mismatch in $shard")
      assert(cursor === rs.map(_._3).sum)
    }
    // layout-independent: identical manifest at a different partitioning
    val rows2 = m2.select($"doc_id", $"source", $"n_tokens", $"shard",
        $"token_start", $"token_end", $"shard_tokens")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows2.toSeq === rows.toSeq)
  }

  test("salt decorrelates; nShards=1 degenerates to one global sequence; no WindowExec") {
    val a = Sharding.shardManifest(docs, "doc_id", "n_tokens", nShards = 8)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    val b = Sharding.shardManifest(docs, "doc_id", "n_tokens", nShards = 8,
        salt = "other:")
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    assert(a.keySet === b.keySet)
    assert(a.exists { case (id, s) => b(id) != s })   // some docs move
    val one = Sharding.shardManifest(docs, "doc_id", "n_tokens", nShards = 1)
    assert(one.select(max($"token_end")).as[Long].head() ===
      docs.select(sum($"n_tokens")).as[Long].head())
    val plan = one.queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "shard manifest must not plan a WindowExec")
    // empty input survives the two-pass core and yields an empty manifest
    assert(Sharding.shardManifest(docs.filter(lit(false)), "doc_id",
      "n_tokens", nShards = 4).count() === 0L)
  }

  test("writeShards: one file per shard, doc_id-ordered rows, intervals tile on disk") {
    val full = docs.withColumn("text",
      concat(lit("body of "), $"doc_id".cast("string")))
    val manifest = Sharding.shardManifest(docs, "doc_id", "n_tokens",
      nShards = 4, carryCols = Seq("source"))
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      // the FULL corpus, including a `source` column the manifest also
      // carries — writeShards must join only the shard assignment, not
      // duplicate the carry columns into the written schema
      Sharding.writeShards(manifest, full, "doc_id", dir)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length === 4)
      val byShard = manifest.select($"doc_id", $"shard", $"token_start",
          $"token_end").as[(Long, Long, Long, Long)].collect()
        .groupBy(_._2)
      shardDirs.foreach { d =>
        val shard = d.getName.stripPrefix("shard=").toLong
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length === 1,
          s"shard $shard must be exactly one file, got ${files.length}")
        // a single parquet file read as a single partition preserves
        // row order — the layout the manifest's intervals describe
        val rows = spark.read.parquet(files.head.toString)
          .select($"doc_id", $"token_start", $"token_end", $"text")
          .as[(Long, Long, Long, String)].collect()
        val expect = byShard(shard).sortBy(_._1)
        assert(rows.map(_._1).toSeq === expect.map(_._1).toSeq,
          s"shard $shard rows not in doc_id order")
        var cursor = 0L
        rows.foreach { r =>
          assert(r._2 === cursor, s"interval gap at doc ${r._1} in shard $shard")
          cursor = r._3
          assert(r._4 === s"body of ${r._1}") // full-width payload rode along
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
