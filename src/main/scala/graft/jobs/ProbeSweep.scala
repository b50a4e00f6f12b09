package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables}
import graft.ops.Similarity

/** Diagnostic sweep for the SRP recall levers (not part of the driver
  * contract): coverage and recall@1 of [[Similarity.bucketNearest]]
  * under bit-flip probing (probes 0/1/2/4 — q146's knob) and under
  * stacked families (families 2 — q64's knob), against the exact
  * all-pairs nearest neighbor. Prints one line per configuration:
  *
  *   sf, config, covered, total, coverage, recall@1
  *
  * recall@1 counts a query as a hit when its returned neighbor IS the
  * exact cosine-nearest (rounded-6 scores, id tie-break — the shared
  * convention); coverage counts queries that returned anything at all
  * (a vector alone in every probed bucket returns nothing).
  *
  * Usage: runMain graft.jobs.ProbeSweep [sfDir ...]
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.ensureRegistered(spark)

    for (dir <- dirs) {
      val emb = Tables.embeddings(spark, dir).cache()
      val n = emb.count()
      // exact all-pairs rank-1 (the ground truth): the shared rounding
      // and tie-break via a plain self-join + min-struct argmax
      val e = emb.select(col("vec_id"), col("embedding"))
        .withColumn("norm2", expr("array_dot(embedding, embedding)"))
        .filter(col("norm2") > 0).cache()
      val exact = e.select(col("vec_id").as("q"), col("embedding").as("qv"),
          col("norm2").as("qn"))
        .join(e.select(col("vec_id").as("c"), col("embedding").as("cv"),
          col("norm2").as("cn")), col("q") =!= col("c"))
        .select(col("q"), col("c"),
          expr("round(array_dot(qv, cv) / sqrt(qn * cn), 6)").as("s"))
        .groupBy(col("q"))
        .agg(min(struct((-col("s")).as("ns"), col("c").as("c"))).as("b"))
        .select(col("q").as("query_id"), col("b.c").as("exact_nn"))
        .cache()
      exact.count()

      def report(config: String, res: DataFrame): Unit = {
        val covered = res.count()
        val hits = res.join(exact, "query_id")
          .filter(col("neighbor_id") === col("exact_nn")).count()
        println(f"$dir%s $config%-12s covered=$covered%d/$n%d " +
          f"coverage=${covered.toDouble / n}%.3f recall@1=${
            hits.toDouble / n}%.3f")
      }
      for (p <- Seq(0, 1, 2, 4))
        report(s"probes=$p",
          Similarity.bucketNearestProbed(emb, "vec_id", "embedding",
            probes = p))
      report("families=2",
        Similarity.bucketNearestMulti(emb, "vec_id", "embedding",
          families = 2))
      emb.unpersist(); e.unpersist(); exact.unpersist()
    }
    spark.stop()
  }
}
